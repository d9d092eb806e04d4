"""Robust loss functions.

TPU equivalent of the reference Huber kernel returning value and derivative
weights (reference: src/cuda/Solver/SolverBundlingUtil.h:24-40 huberLoss).
"""

from __future__ import annotations

import jax.numpy as jnp


def huber(e_sq: jnp.ndarray, delta: float):
    """Huber loss on squared error magnitude.

    Args:
      e_sq: squared residual norms [...].
      delta: Huber threshold (reference robust_delta = 0.005).

    Returns:
      (rho0, rho1): loss value and first derivative d rho / d e_sq.  rho1 is
      the IRLS weight to apply to J^T J / J^T r (reference uses rho.y the same
      way in evalMinusJTFDevice, SolverBundlingEquationsLie.h:60-137).
    """
    e = jnp.sqrt(jnp.maximum(e_sq, 1e-24))
    quadratic = e <= delta
    rho0 = jnp.where(quadratic, e_sq, 2.0 * delta * e - delta * delta)
    rho1 = jnp.where(quadratic, jnp.ones_like(e), delta / e)
    return rho0, rho1


def huber_weight(e_sq: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight only."""
    return huber(e_sq, delta)[1]
