"""Per-stage latency of the LF-Net forward at serving size (400x400).

Isolates backbone+pyramid, soft-NMS chain, top-K + refine, and the patch
crop + descriptor tower to direct optimization effort (reference latency
protocol: lf-net-release/test_lfnet_speed.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=20):
    from bundletrack_tpu.utils.timing import hard_sync

    out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    hard_sync(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"[lfnet-stage] {name}: {ms:.2f} ms", file=sys.stderr)
    return out, ms


def main():
    from bundletrack_tpu.config import FrontendConfig
    from bundletrack_tpu.frontend.detector_ops import (
        end_of_frame_mask,
        instance_norm,
        non_max_suppression_mask,
        soft_max_and_argmax_1d,
        soft_nms_3d,
        top_k_keypoints,
        transformer_crop,
    )
    from bundletrack_tpu.frontend.lfnet import LFNet, init_lfnet

    cfg = FrontendConfig(kind="lfnet")
    model, params = init_lfnet(cfg)
    params = jax.device_put(params)
    S = cfg.input_size
    x = jax.device_put(
        np.random.RandomState(0).rand(1, S, S, 1).astype(np.float32)
    )

    # full forward
    fwd = jax.jit(lambda p, im: model.apply({"params": p}, im))
    _, full_ms = timeit("full forward", fwd, params, x)

    # detector backbone + score pyramid + resize-to-full
    def det(p, im):
        pn = instance_norm(im)
        sm, ori, feat = model.apply(
            {"params": p}, pn, method=lambda m, v: m.detector(v)
        )
        logits = [
            jax.image.resize(instance_norm(s), (1, S, S, 1), "bilinear")
            for s in sm
        ]
        return jnp.concatenate(logits, -1), ori, pn

    det_j = jax.jit(det)
    (scale_logits, ori, pn), det_ms = timeit("backbone+pyramid", det_j, params, x)

    nms_j = jax.jit(
        lambda sl: soft_max_and_argmax_1d(
            soft_nms_3d(sl, ksize=cfg.sm_ksize, com_strength=cfg.com_strength),
            jnp.asarray(model.detector.scale_factors()),
            axis=-1, com1=cfg.score_com_strength, com2=cfg.scale_com_strength,
        )
    )
    (heat, mscale), nms_ms = timeit("soft_nms+scale", nms_j, scale_logits)

    def select(h):
        h = h[..., None] * end_of_frame_mask(S, S, cfg.crop_radius)
        nm = non_max_suppression_mask(h, cfg.nms_thresh, cfg.nms_ksize)
        return top_k_keypoints(h * nm.astype(h.dtype), cfg.top_k)

    sel_j = jax.jit(select)
    (kpts, kscore, valid), sel_ms = timeit("nms+topk", sel_j, heat)

    binds = jnp.zeros((cfg.top_k,), jnp.int32)
    kflat = kpts.reshape(-1, 2)

    def desc(p, photos, kf):
        patches = transformer_crop(photos, cfg.patch_size, binds, kf)
        return model.apply({"params": p}, patches, method=LFNet.describe_patches)

    desc_j = jax.jit(desc)
    _, desc_ms = timeit("crop+descriptor", desc_j, params, pn, kflat)

    print(
        f"[lfnet-stage] sum of stages {det_ms+nms_ms+sel_ms+desc_ms:.2f} ms "
        f"vs full {full_ms:.2f} ms", file=sys.stderr,
    )


if __name__ == "__main__":
    main()
