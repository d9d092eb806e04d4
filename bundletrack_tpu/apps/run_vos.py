"""CLI app: generate segmentation masks for a video by label propagation.

Equivalent of the reference's VOS driver (reference:
transductive-vos.pytorch/run_video.py:56-73 args --img_dir --init_mask_file
--mask_save_dir, 77-160 run_one_video — per-frame ResNet features + attention
over sampled history, masks written as PNGs that the tracker consumes via its
mask_dir).  Weights come from an orbax checkpoint written by
apps/train_vos.py (the reference loads a torch .pth, run_video.py:167-181).

Usage:
    python -m bundletrack_tpu.apps.run_vos --img_dir data/rgb \
        --init_mask_file data/masks/0000.png --mask_save_dir out/masks \
        [--checkpoint /path/to/params]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _list_images(img_dir: str):
    exts = (".png",)
    names = sorted(f for f in os.listdir(img_dir) if f.lower().endswith(exts))
    if not names:
        raise FileNotFoundError(f"no PNG images in {img_dir}")
    return [os.path.join(img_dir, f) for f in names]


def _to_rgb01(img):
    import numpy as np

    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.dtype == np.uint16:
        return (arr[..., :3] / 65535.0).astype(np.float32)
    return (arr[..., :3] / 255.0).astype(np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_dir", required=True)
    parser.add_argument("--init_mask_file", required=True)
    parser.add_argument("--mask_save_dir", required=True)
    parser.add_argument("--checkpoint", default="", help="orbax params dir from train_vos")
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--history-cap", type=int, default=0,
                        help="feature-ring capacity; 0 = SegmentationConfig default")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bundletrack_tpu.config import SegmentationConfig
    from bundletrack_tpu.data.native_io import SequencePrefetcher, read_png, write_png
    from bundletrack_tpu.models.vos import VOSNet, VOSPropagator

    paths = _list_images(args.img_dir)
    if args.max_frames:
        paths = paths[: args.max_frames]
    first = _to_rgb01(read_png(paths[0]))
    H, W = first.shape[:2]
    cfg = SegmentationConfig()

    default_npz = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "checkpoints", "vos_params.npz",
    )
    ckpt = args.checkpoint or (default_npz if os.path.exists(default_npz) else "")
    if ckpt.endswith(".npz"):
        from bundletrack_tpu.models.vos import load_vos_npz

        # architecture (width/out_dim) inferred from the checkpoint itself
        model, params = load_vos_npz(ckpt)
        print(f"[run_vos] weights: {ckpt} (width={model.width})", file=sys.stderr)
    elif ckpt:
        from bundletrack_tpu.utils.checkpoint import restore_tracker_state

        model = VOSNet()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3))
        )["params"]
        params = restore_tracker_state(ckpt, params)
    else:
        model = VOSNet()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3))
        )["params"]
        print(
            "[run_vos] WARNING: no --checkpoint given; using untrained weights "
            "(train with apps/train_vos.py)",
            file=sys.stderr,
        )

    init_mask = np.asarray(read_png(args.init_mask_file)) > 0
    if init_mask.ndim == 3:
        init_mask = init_mask[..., 0]

    os.makedirs(args.mask_save_dir, exist_ok=True)
    prop = VOSPropagator(params, model, cfg, H, W,
                         history_cap=args.history_cap or None)
    prop.first_frame(first, init_mask)
    # frame 0's mask is the given init mask (reference writes it unchanged)
    write_png(
        os.path.join(args.mask_save_dir, os.path.basename(paths[0])),
        (init_mask * 255).astype(np.uint8),
    )

    fetch = SequencePrefetcher(paths)
    t0 = time.perf_counter()
    for i in range(1, len(paths)):
        rgb = _to_rgb01(fetch.get(i))
        mask = prop.propagate(rgb)
        write_png(
            os.path.join(args.mask_save_dir, os.path.basename(paths[i])),
            (mask * 255).astype(np.uint8),
        )
        if i % 20 == 0:
            rate = i / (time.perf_counter() - t0)
            print(f"[run_vos] frame {i}/{len(paths)} ({rate:.1f} fps)", file=sys.stderr)
    fetch.close()
    dt = time.perf_counter() - t0
    print(f"[run_vos] done: {len(paths)} masks in {dt:.1f}s -> {args.mask_save_dir}")


if __name__ == "__main__":
    main()
