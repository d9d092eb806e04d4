#!/usr/bin/env python
"""Benchmark: single-stream tracking rate at reference scale on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published end-to-end rate of 10 Hz on an RTX 3090
(reference README.md:8, "real-time performance of 10Hz for the entire
framework").  Scale mirrors BASELINE.md's per-frame envelope: 480x640 RGB-D,
512 keypoints x 256-d descriptors, <=16-frame pose graph (105+ pairs),
2000-trial RANSAC, 7x5 solver iterations, dense term at 120x160.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bundletrack_tpu.config import BundleConfig, TrackerConfig, ShapeConfig
    from bundletrack_tpu.data import render_synthetic_sequence
    from bundletrack_tpu.tracker.driver import Tracker
    from bundletrack_tpu.tracker.state import FrameObservation

    H, W = 480, 640
    # dense_src_capacity 2048: validated sub-mm-identical to the default 4096
    # on the synthetic eval, halves the dense-term gather in the solver stage
    cfg = TrackerConfig(
        shapes=ShapeConfig(image_h=H, image_w=W),
        bundle=BundleConfig(dense_src_capacity=2048),
    )

    n_frames = 52
    seq = render_synthetic_sequence(
        num_frames=n_frames, H=H, W=W, orbit_deg_per_frame=2.0
    )
    init_pose = np.linalg.inv(seq.ob_in_cam[0])
    # stream raw sensor formats (u8 gray, u16 mm depth) like a real camera;
    # dtype conversion runs on device fused into the step
    gray_u8 = (seq.gray * 255.0 + 0.5).astype(np.uint8)
    depth_u16 = (seq.depth * 1000.0 + 0.5).astype(np.uint16)

    tracker = Tracker(cfg, H, W)

    from bundletrack_tpu.utils.timing import hard_sync

    # warmup: first frames trigger compilation of both cond branches
    n_warm = 4
    for f in range(n_warm):
        out = tracker.process_frame(
            gray_u8[f], depth_u16[f], seq.mask[f], seq.K, init_pose=init_pose
        )
    hard_sync(out)

    t0 = time.perf_counter()
    for f in range(n_warm, n_frames):
        out = tracker.process_frame(
            gray_u8[f], depth_u16[f], seq.mask[f], seq.K, init_pose=init_pose
        )
    # tracker state chains frame->frame, so a host readback of the last
    # output fences every frame's device work (block_until_ready is not a
    # reliable fence on the remote-tunnel PJRT platform)
    hard_sync(out)
    dt = time.perf_counter() - t0
    timed = n_frames - n_warm
    fps = timed / dt

    statuses = [int(np.asarray(o.status)) for o in tracker.outputs]
    print(
        f"[bench] {timed} frames in {dt:.3f}s -> {fps:.2f} fps; "
        f"statuses={statuses}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "single_stream_tracking_rate_480x640",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 10.0, 3),
            }
        )
    )

    if os.environ.get("BENCH_FULL"):
        _secondary_benches(cfg, seq)


def _secondary_benches(cfg, seq):
    """Extra numbers on stderr: fleet throughput, solver rate, LF-Net latency."""
    import jax
    import jax.numpy as jnp

    from bundletrack_tpu.parallel import init_fleet_state, make_fleet_step
    from bundletrack_tpu.tracker.state import FrameObservation

    H, W = seq.gray.shape[1:]
    S = 4
    step = make_fleet_step(cfg, H, W)
    state = init_fleet_state(cfg, H, W, S)
    tile = lambda a: jnp.broadcast_to(jnp.asarray(a), (S,) + a.shape)
    init_pose = tile(np.linalg.inv(seq.ob_in_cam[0]))
    n_frames = seq.gray.shape[0]
    for f in range(2):
        obs = FrameObservation(
            gray=tile(seq.gray[f]), depth=tile(seq.depth[f]),
            mask=tile(seq.mask[f]), K=tile(seq.K),
        )
        state, out = step(state, obs, init_pose)
    from bundletrack_tpu.utils.timing import hard_sync
    hard_sync(out)
    t0 = time.perf_counter()
    timed = 0
    for f in range(2, n_frames):
        obs = FrameObservation(
            gray=tile(seq.gray[f]), depth=tile(seq.depth[f]),
            mask=tile(seq.mask[f]), K=tile(seq.K),
        )
        state, out = step(state, obs, init_pose)
        timed += 1
    hard_sync(out)
    dt = time.perf_counter() - t0
    print(
        f"[bench] fleet S={S}: {S * timed / dt:.2f} aggregate fps "
        f"({timed / dt:.2f} steps/s)",
        file=sys.stderr,
    )

    # LF-Net forward latency (reference test_lfnet_speed.py protocol: mean
    # forward time at serving size)
    from bundletrack_tpu.config import FrontendConfig
    from bundletrack_tpu.frontend.lfnet import init_lfnet

    fcfg = FrontendConfig(kind="lfnet")
    model, params = init_lfnet(fcfg)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    x = jnp.zeros((1, fcfg.input_size, fcfg.input_size, 1), jnp.float32)
    hard_sync(fwd(params, x))
    t0 = time.perf_counter()
    for _ in range(20):
        out = fwd(params, x)
    # same-device executions serialize in dispatch order, so fencing the
    # last call fences all 20
    hard_sync(out)
    print(
        f"[bench] lfnet 400x400 forward: {(time.perf_counter() - t0) / 20 * 1000:.2f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
