from bundletrack_tpu.solver.residuals import (
    sparse_residuals,
    sparse_normal_equations,
    SparseCorres,
)
from bundletrack_tpu.solver.dense_p2p import (
    CompactDense,
    DenseFrames,
    compact_dense_frames,
    dense_p2p_from_compact,
    dense_p2p_normal_equations,
)
from bundletrack_tpu.solver.gauss_newton import (
    GraphInputs,
    optimize_pose_graph,
    solve_normal_equations_cholesky,
)
from bundletrack_tpu.solver.pcg import solve_normal_equations_pcg

__all__ = [
    "sparse_residuals",
    "sparse_normal_equations",
    "SparseCorres",
    "dense_p2p_normal_equations",
    "dense_p2p_from_compact",
    "compact_dense_frames",
    "CompactDense",
    "DenseFrames",
    "GraphInputs",
    "optimize_pose_graph",
    "solve_normal_equations_cholesky",
    "solve_normal_equations_pcg",
]
