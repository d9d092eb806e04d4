"""Persistent XLA compilation cache (opt-in helper).

The tracker step is a large XLA program; on the remote-compile TPU backend a
cold compile can take minutes.  The JAX persistent cache keys on the HLO
hash, so repeated runs of the same program (bench reruns, CLI invocations,
test processes) skip compilation entirely.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str = "/tmp/bundletrack_jax_cache") -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: cache is an optimization only
