"""Hard-world evaluation suite: ADD-S AUC over hostile synthetic passes.

Runs the tracker over the hard passes (data/hard_world.py — multi-shape,
degraded depth, imperfect masks, scale change, fast rotation) and scores
each against ground truth with the reference's ADD-S AUC protocol
(reference: scripts/eval_ycbineoat.py:54-83 + scripts/Utils.py:69-95).
This is the suite that separates frontends — the easy cube orbit saturates
at 97+ AUC for everything.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from bundletrack_tpu.data.hard_world import hard_passes, model_points
from bundletrack_tpu.eval.metrics import adds_auc

# shape used by each named pass (for the ADD-S model point cloud)
PASS_SHAPES = {
    "cube": "cube",
    "cylinder": "cylinder",
    "lshape": "lshape",
    "scale2x": "lshape",
    "fastrot": "lshape",
}


def evaluate_pass(cfg, seq, shape: str, lfnet_apply=None, size: float = 0.2):
    """Track one hard sequence; returns (auc, n_bad_statuses)."""
    from bundletrack_tpu.tracker.driver import track_sequence

    poses, statuses, _ = track_sequence(cfg, seq, lfnet_apply=lfnet_apply)
    pts = model_points(shape, size=size)
    auc = adds_auc(list(poses), list(seq.ob_in_cam), pts)
    return float(auc), int(np.sum(statuses != 0))


def run_hard_suite(
    cfg,
    lfnet_apply=None,
    H: int = 480,
    W: int = 640,
    num_frames: int = 20,
    seed: int = 0,
    passes: Optional[Dict] = None,
) -> Dict[str, float]:
    """Returns {pass_name: adds_auc, ..., "mean": mean_auc}.

    `passes` lets the caller pre-render (and share between frontends).
    """
    if passes is None:
        passes = hard_passes(H=H, W=W, num_frames=num_frames, seed=seed)
    out = {}
    for name, seq in passes.items():
        auc, n_bad = evaluate_pass(
            cfg, seq, PASS_SHAPES.get(name, "cube"), lfnet_apply=lfnet_apply
        )
        out[name] = round(auc, 2)
    out["mean"] = round(float(np.mean([v for k, v in out.items() if k != "mean"])), 2)
    return out
