"""bundletrack_tpu — TPU-native model-free 6D pose tracking (BundleTrack capabilities).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of BundleTrack
(wenbowen123/BundleTrack, IROS 2021): model-free RGB-D tracking of novel objects
via learned keypoint/descriptor extraction, mutual-NN feature matching with
geometric gating, batched multi-pair 3-point RANSAC, and a memory-augmented
keyframe pose graph solved by a Huber-robust Gauss-Newton optimizer.

Everything is statically shaped, batched, and jit-compiled: a tracker step is a
single XLA program over [S] streams x [K] keyframes x [P] pairs x [M] matches,
sharded across TPU meshes via shard_map/pjit.

Reference layer map: /root/reference SURVEY.md section 1.
"""

__version__ = "0.1.0"

from bundletrack_tpu.config import TrackerConfig, load_config

__all__ = ["TrackerConfig", "load_config", "__version__"]
