"""CLI app: train the VOS segmentation net (reference main.py, DDP analog).

The reference trains VOSNet with PyTorch DistributedDataParallel on DAVIS
clips (reference: transductive-vos.pytorch/main.py:57-135).  This trainer
runs the same objective (cross-entropy over transductively propagated
labels, models/vos_train.py) on synthetic clips with mask labels, data-
parallel over the attached mesh (jax.sharding; XLA all-reduces gradients
over ICI — the NCCL-DDP equivalent), with orbax checkpointing.

Usage:
    python -m bundletrack_tpu.apps.train_vos --steps 200 --size 96 \
        --batch 4 --clip-len 4 --ckpt-dir /tmp/vos_ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--size", type=int, default=96)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--clip-len", type=int, default=4)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--num-seqs", type=int, default=8)
    parser.add_argument("--width", type=int, default=32,
                        help="VOSNet stem width (backbone capacity)")
    parser.add_argument("--rollout", action="store_true",
                        help="sequential rollout loss: refs carry the "
                        "model's own predictions (inference-faithful)")
    parser.add_argument("--init-npz", default="",
                        help="warm-start params from an npz checkpoint")
    parser.add_argument("--world", choices=["hard", "easy", "mix"],
                        default="easy",
                        help="hard: multi-shape fBm-textured worlds with "
                        "backgrounds and occluder clips (data/hard_world.py); "
                        "mix: 3 hard : 1 easy")
    parser.add_argument("--far-stride-max", type=int, default=35,
                        help="largest GT-ref-to-target gap in the far-pair "
                        "curriculum; long-horizon inference keeps a pinned "
                        "anchor ~100+ frames old, so training should see "
                        "comparable gaps")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ckpt-dir", default="")
    parser.add_argument("--ckpt-every", type=int, default=100)
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--mesh", default="auto", help='"auto", "none", or dp size')
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bundletrack_tpu.data import render_synthetic_sequence
    from bundletrack_tpu.data.pairs import vos_clip_batch
    from bundletrack_tpu.models import VOSTrainBatch, make_vos_train_step
    from bundletrack_tpu.models.vos import VOSNet
    from bundletrack_tpu.parallel import make_mesh, make_sharded_vos_train_step
    from bundletrack_tpu.utils.timing import hard_sync

    H = W = args.size
    model = VOSNet(width=args.width)
    params = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, H, W, 3))
    )["params"]
    if args.init_npz:
        from bundletrack_tpu.utils.params_io import load_params_npz

        params = load_params_npz(args.init_npz, params)
        print(f"[train_vos] warm start from {args.init_npz}", file=sys.stderr)
    tx = optax.adam(args.lr)

    n_dev = jax.device_count()
    if args.mesh == "none" or n_dev == 1:
        step = jax.jit(
            make_vos_train_step(model, tx, (H, W), rollout=args.rollout),
            donate_argnums=(1,)
        )
        opt_state = tx.init(params)
    else:
        dp = n_dev if args.mesh == "auto" else int(args.mesh)
        mesh = make_mesh({"data": dp})
        step, params, opt_state = make_sharded_vos_train_step(
            model, tx, params, mesh, (H, W)
        )
        print(f"[train_vos] mesh dp={dp}", file=sys.stderr)

    print(f"[train_vos] rendering {args.num_seqs} {args.world} sequences...",
          file=sys.stderr)
    pool = []
    T = args.clip_len
    rng_w = np.random.RandomState(args.seed + 7)
    shapes = ["cube", "cylinder", "lshape", "tshape"]
    for s in range(args.num_seqs):
        # curriculum (hard world): even entries are standard strided clips;
        # odd entries are FAR PAIRS — one GT reference 15-35 frames from the
        # target.  Within-clip GT-ref propagation saturates (train IoU hits
        # 1.0 while 110-frame inference still drifts); the far-pair task is
        # the novel-viewpoint discrimination inference actually needs.
        # world "mix": every 4th entry is an easy (black-background) world so
        # hard-world training does not regress the clean regime
        is_hard = args.world == "hard" or (args.world == "mix" and s % 4 != 3)
        far_pair = is_hard and s % 2 == 1
        if far_pair:
            lo, hi = 15, max(args.far_stride_max, 16)
            n_lv = 5
            T_s = 2
            stride = lo + ((hi - lo) * ((s // 2) % n_lv)) // (n_lv - 1)
        else:
            T_s, stride = T, (1 + (s % 4) if is_hard else 1)
        if is_hard:
            from bundletrack_tpu.data import render_hard_sequence

            seq = render_hard_sequence(
                shape=shapes[s % len(shapes)],
                num_frames=T_s * args.batch * stride, H=H, W=W,
                seed=args.seed + 31 * s,
                radius=0.45 + 0.15 * rng_w.rand(),
                orbit_deg_per_frame=2.0 + 3.0 * rng_w.rand(),
                roll_deg_per_frame=2.0 * rng_w.rand(),
                scale_to=[1.0, 1.25, 0.8][s % 3],
                depth_noise=0.0, depth_quant=0.0, hole_fraction=0.0,
                mask_errors=False, background=True,
                occluder=(s % 3 == 1),  # a third of the worlds get the
                # sweeping distractor: VOS must not bleed onto it
            )
        else:
            seq = render_synthetic_sequence(
                num_frames=T_s * args.batch * stride, H=H, W=W,
                seed=args.seed + s,
                orbit_deg_per_frame=3.0 + 0.5 * (s % 5),
            )
        starts = [b * T_s * stride for b in range(args.batch)]
        pool.append(vos_clip_batch(seq, starts, T_s, stride=stride))

    def to_batch(d):
        return VOSTrainBatch(
            clips=jnp.asarray(d["clips"]), labels=jnp.asarray(d["labels"])
        )

    def save(step_idx):
        if not args.ckpt_dir:
            return
        from bundletrack_tpu.utils.checkpoint import save_tracker_state

        save_tracker_state(os.path.join(args.ckpt_dir, "params"), params)
        with open(os.path.join(args.ckpt_dir, "meta.json"), "w") as f:
            json.dump({"step": step_idx}, f)

    t0 = time.perf_counter()
    metrics = {}
    for i in range(args.steps):
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
