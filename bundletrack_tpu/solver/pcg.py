"""Block-Jacobi preconditioned conjugate gradient on the blocked normal eqs.

Mirrors the reference's PCG inner loop (reference: src/cuda/Solver/
SolverBundling.cu — Initialization:615-651 sets r = -J^T F with a Jacobi
preconditioner, PCGIteration:820-887 with matrix-free J/J^T applications and
d_scanAlpha atomic reductions:728-781).  Here H is already assembled in
[K, K, 6, 6] blocks, so the matvec is one einsum; the alpha/beta scalar
reductions are plain jnp.vdot — no atomics, bitwise deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _block_matvec(H, x):
    """[K,K,6,6] x [K,6] -> [K,6]."""
    return jnp.einsum("klab,lb->ka", H, x, precision="highest")


def solve_normal_equations_pcg(H, g, num_iters: int = 5, lm_lambda: float = 1e-6):
    """Approximately solve (H + lambda I) delta = -g with `num_iters` PCG steps.

    Block-Jacobi preconditioner: inverse of the 6x6 diagonal blocks
    (the reference uses a scalar Jacobi preconditioner; block version
    converges faster at identical cost on the MXU).
    """
    K = H.shape[0]
    idx = jnp.arange(K)
    eye6 = jnp.eye(6, dtype=H.dtype)
    H = H.at[idx, idx].add(lm_lambda * eye6)
    diag = H[idx, idx] + 1e-8 * eye6
    Minv = jnp.linalg.inv(diag)  # [K, 6, 6]

    b = -g
    x = jnp.zeros_like(b)
    r = b  # x0 = 0
    z = jnp.einsum("kab,kb->ka", Minv, r, precision="highest")
    p = z
    rz = jnp.vdot(r, z)

    def body(_, carry):
        x, r, p, rz = carry
        Ap = _block_matvec(H, p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1.0, pAp)
        alpha = jnp.where(jnp.abs(pAp) < 1e-20, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * Ap
        z = jnp.einsum("kab,kb->ka", Minv, r, precision="highest")
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1.0, rz)
        beta = jnp.where(jnp.abs(rz) < 1e-20, 0.0, beta)
        p = z + beta * p
        return x, r, p, rz_new

    x, r, p, rz = jax.lax.fori_loop(0, num_iters, body, (x, r, p, rz))
    return x
