"""Frontend output contract shared by all keypoint extractors.

Replaces the reference's ZMQ wire format ([N, 2] keypoints + [N, 256]
descriptors, lf-net-release/run_server.py:142-177) with an in-process
padded struct — the keypoint network runs inside the tracker's XLA program,
eliminating the reference's TCP process boundary
(src/FeatureManager.cpp:799-908).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FrontendOutput(NamedTuple):
    """Padded keypoints for one frame (batch via leading axes).

    kpts_uv: [N, 2] float pixel coords (u, v) in the *original* image.
    scores:  [N] detection scores (descending).
    desc:    [N, D] L2-normalized descriptors.
    valid:   [N] bool.
    """

    kpts_uv: jnp.ndarray
    scores: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray
