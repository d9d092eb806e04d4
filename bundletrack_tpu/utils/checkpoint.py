"""Checkpoint / resume for tracker state (orbax).

The reference has no tracking-state checkpointing — a crash requires a full
rerun (SURVEY.md section 5: poses streamed to text files are the only
persistence).  Here TrackerState is a pytree, so checkpointing is one orbax
call; fleets (leading stream axis) checkpoint identically.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_tracker_state(path: str, state) -> None:
    """Save any tracker/fleet state pytree to `path` (directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()


def restore_tracker_state(path: str, like):
    """Restore a state pytree saved by save_tracker_state.

    `like` is a template state (e.g. init_tracker_state(...)) providing
    structure/shape/dtype.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, jax.tree.map(np.asarray, like))
    return jax.tree.map(lambda x: x, restored)
