"""Test config: run all tests on CPU with 8 virtual devices.

Mirrors the driver's dryrun environment: multi-chip sharding is validated on a
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count) since only
one real TPU chip is attached.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env pins JAX_PLATFORMS=axon (TPU)

import jax  # noqa: E402

# The axon PJRT plugin (sitecustomize) overrides JAX_PLATFORMS at interpreter
# start; the config knob below wins over it and pins tests to host CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is dominated by XLA CPU compiles of
# the big tracker/fleet programs; with a warm cache the full suite drops from
# ~20 min to a few min.  Keyed by HLO hash, so stale entries are harmless.
jax.config.update("jax_compilation_cache_dir", "/tmp/bundletrack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
