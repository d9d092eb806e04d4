"""CLI app: train the LF-Net keypoint frontend (reference train_lfnet.py).

The reference trains LF-Net with a 1,200-line TF1 harness on image pairs
whose ground-truth correspondence comes from depth + relative pose
(reference: lf-net-release/train_lfnet.py).  This trainer runs the same two
objectives (detector repeatability + descriptor contrastive loss,
models/lfnet_train.py) on warp-annotated pairs from the synthetic renderer
— or any RGB-D sequence with poses — with:

  * dp x tp sharding over a device mesh when >1 device is attached
    (parallel/fleet.make_sharded_lfnet_train_step),
  * orbax checkpointing + resume,
  * a JSON metrics line per log interval.

Usage:
    python -m bundletrack_tpu.apps.train_lfnet --steps 500 --size 96 \
        --batch 8 --ckpt-dir /tmp/lfnet_ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_batches(size: int, batch: int, num_seqs: int, seed: int,
                  world: str = "hard", num_batches: int = 0):
    """Pre-render a pool of warp-annotated training batches.

    Requirements learned from the r3 descriptor collapse:
      * every row of a batch comes from a DISTINCT world — rows sharing
        landmarks poison the InfoNCE negatives (models/lfnet_train docstring);
      * rows are serving-faithful mask-ROI crops (lfnet_roi_pair_batch), not
        full frames, so train and serve see the same scale distribution;
      * "hard" worlds (data/hard_world.py): fBm-textured cube/cylinder/L/T
        shapes with per-world random orbit, roll, scale change, and
        photometric augmentation — content rich enough for descriptors.

    Pairs mix frame gaps 1-4 (up to ~30 deg relative rotation): the
    tracking regime (neighbors) plus keyframe-pair viewpoint changes.
    """
    import numpy as np

    from bundletrack_tpu.data import render_hard_sequence, render_synthetic_sequence
    from bundletrack_tpu.data.pairs import lfnet_roi_pair_batch

    rng = np.random.RandomState(seed)
    num_worlds = max(num_seqs, batch)
    n_frames = 8
    render_hw = int(size * 1.6)
    shapes = ["cube", "cylinder", "lshape", "tshape"]
    worlds = []
    for s in range(num_worlds):
        if world == "easy":
            worlds.append(render_synthetic_sequence(
                num_frames=n_frames, H=render_hw, W=render_hw, seed=seed + s,
                orbit_deg_per_frame=3.0 + 0.5 * (s % 5),
            ))
        else:
            worlds.append(render_hard_sequence(
                shape=shapes[s % len(shapes)], num_frames=n_frames,
                H=render_hw, W=render_hw,
                radius=0.42 + 0.12 * rng.rand(),
                orbit_deg_per_frame=2.0 + 4.0 * rng.rand(),
                roll_deg_per_frame=3.0 * rng.rand(),
                scale_to=[1.0, 1.3, 0.75][s % 3],
                elev_amp=0.25 * rng.rand(),
                seed=seed + 31 * s,
                depth_noise=0.0, depth_quant=0.0, hole_fraction=0.0,
                mask_errors=False, background=True,
            ))

    gaps = [1, 1, 2, 3, 4]
    pool = []
    for _ in range(num_batches or max(24, 2 * num_worlds)):
        row_worlds = rng.permutation(num_worlds)[:batch]  # distinct per batch
        rows = []
        for w in row_worlds:
            gap = gaps[rng.randint(len(gaps))]
            i = rng.randint(n_frames - gap)
            rows.append(lfnet_roi_pair_batch(
                worlds[w], [(i, i + gap)], size, rng=rng, photometric=True,
            ))
        pool.append({
            k: np.concatenate([r[k] for r in rows], axis=0) for k in rows[0]
        })
    return pool


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--size", type=int, default=96, help="square image size")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--lr-decay", choices=["none", "cosine"], default="cosine",
                        help="cosine-decay the lr to lr/10 over --steps")
    parser.add_argument("--top-k", type=int, default=128)
    parser.add_argument("--desc-dim", type=int, default=256)
    parser.add_argument("--net-channel", type=int, default=16)
    parser.add_argument("--num-scales", type=int, default=5)
    parser.add_argument("--desc-channel", type=int, default=64)
    parser.add_argument("--sm-ksize", type=int, default=15)
    parser.add_argument("--num-seqs", type=int, default=8,
                        help="worlds in the render pool (min = --batch)")
    parser.add_argument("--world", choices=["hard", "easy"], default="hard")
    parser.add_argument("--num-batches", type=int, default=0,
                        help="pre-built batches to cycle (0 = auto)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ckpt-dir", default="")
    parser.add_argument("--ckpt-every", type=int, default=100)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--mesh", default="auto",
                        help='"auto", "none", or "dp,tp" (e.g. "4,2")')
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bundletrack_tpu.config import FrontendConfig
    from bundletrack_tpu.frontend.lfnet import init_lfnet
    from bundletrack_tpu.models import LFNetTrainBatch, make_lfnet_train_step
    from bundletrack_tpu.parallel import make_mesh, make_sharded_lfnet_train_step
    from bundletrack_tpu.utils.timing import hard_sync

    cfg = FrontendConfig(
        kind="lfnet", input_size=args.size, top_k=args.top_k,
        desc_dim=args.desc_dim, net_channel=args.net_channel,
        net_num_scales=args.num_scales, desc_net_channel=args.desc_channel,
        sm_ksize=args.sm_ksize,
        bf16=False,  # full-precision gradients for training
    )
    model, params = init_lfnet(cfg, key=jax.random.PRNGKey(args.seed))
    if args.lr_decay == "cosine":
        sched = optax.cosine_decay_schedule(args.lr, max(args.steps, 1), alpha=0.1)
        tx = optax.adam(sched)
    else:
        tx = optax.adam(args.lr)

    n_dev = jax.device_count()
    if args.mesh == "none" or n_dev == 1:
        step = jax.jit(make_lfnet_train_step(model, tx), donate_argnums=(1,))
        opt_state = tx.init(params)
    else:
        if args.mesh == "auto":
            dp, tp = (n_dev // 2, 2) if n_dev % 2 == 0 else (n_dev, 1)
        else:
            dp, tp = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh({"data": dp, "model": tp})
        step, params, opt_state = make_sharded_lfnet_train_step(
            model, tx, params, mesh
        )
        print(f"[train_lfnet] mesh dp={dp} tp={tp}", file=sys.stderr)

    start_step = 0
    if args.ckpt_dir and args.resume:
        from bundletrack_tpu.utils.checkpoint import restore_tracker_state

        meta_path = os.path.join(args.ckpt_dir, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                start_step = json.load(f)["step"]
            params = restore_tracker_state(
                os.path.join(args.ckpt_dir, "params"), params
            )
            opt_state = restore_tracker_state(
                os.path.join(args.ckpt_dir, "opt_state"), opt_state
            )
            print(f"[train_lfnet] resumed at step {start_step}", file=sys.stderr)

    print(f"[train_lfnet] rendering {max(args.num_seqs, args.batch)} "
          f"{args.world} worlds...", file=sys.stderr)
    pool = build_batches(args.size, args.batch, args.num_seqs, args.seed,
                         world=args.world, num_batches=args.num_batches)

    def to_batch(d):
        return LFNetTrainBatch(
            img1=jnp.asarray(d["img1"]), img2=jnp.asarray(d["img2"]),
            warp12=jnp.asarray(d["warp12"]),
            warp_valid=jnp.asarray(d["warp_valid"]),
        )

    def save(step_idx):
        if not args.ckpt_dir:
            return
        from bundletrack_tpu.utils.checkpoint import save_tracker_state

        save_tracker_state(os.path.join(args.ckpt_dir, "params"), params)
        save_tracker_state(os.path.join(args.ckpt_dir, "opt_state"), opt_state)
        with open(os.path.join(args.ckpt_dir, "meta.json"), "w") as f:
            json.dump({"step": step_idx, "config": vars(args)}, f)

    t0 = time.perf_counter()
    metrics = {}
    for i in range(start_step, args.steps):
        batch = to_batch(pool[i % len(pool)])
        params, opt_state, metrics = step(params, opt_state, batch)
        if (i + 1) % args.log_every == 0 or i + 1 == args.steps:
            hard_sync(metrics)
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=i + 1, sec=round(time.perf_counter() - t0, 2))
            print(json.dumps(m), flush=True)
        if args.ckpt_dir and (i + 1) % args.ckpt_every == 0:
            save(i + 1)
    save(args.steps)
    return metrics


if __name__ == "__main__":
    main()
