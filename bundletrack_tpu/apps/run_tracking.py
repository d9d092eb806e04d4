"""CLI app: track a sequence from a reference-format YAML config.

Equivalent of the reference's app binaries + driver scripts
(reference: src/app/bundle_track_ycbineoat.cpp:42-80,
src/app/bundle_track_nocs.cpp:42-78, scripts/run_ycbineoat.py:49-72,
scripts/run_nocs.py:56-79).  Accepts the reference's YAML schema unchanged
(config.load_config maps the keys) and writes ob_in_cam pose files in the
reference's `debug_dir/poses/<id>.txt` format so eval_ycbineoat.py-style
tooling works on the output.

Usage:
    python -m bundletrack_tpu.apps.run_tracking config.yml --dataset ycbineoat
    python -m bundletrack_tpu.apps.run_tracking config.yml --dataset nocs
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="reference-format YAML config")
    parser.add_argument("--dataset", choices=["ycbineoat", "nocs", "auto"], default="auto")
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument(
        "--frontend", choices=["config", "classical", "lfnet"], default="config",
        help="keypoint frontend; 'config' uses the YAML/preset setting",
    )
    # default resolves relative to the repo root (like run_vos.py) so the
    # CLI works from any working directory
    default_ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "checkpoints", "lfnet_params.npz",
    )
    parser.add_argument(
        "--lfnet-ckpt", default=default_ckpt,
        help="trained LF-Net weights (npz) for --frontend lfnet",
    )
    args = parser.parse_args(argv)

    import dataclasses

    from bundletrack_tpu.config import load_config, nocs_config, ycbineoat_config
    from bundletrack_tpu.tracker.driver import Tracker

    import yaml

    with open(args.config) as f:
        raw = yaml.safe_load(f)

    dataset = args.dataset
    if dataset == "auto":
        dataset = "nocs" if raw.get("use_6pack_datalist") else "ycbineoat"

    base = nocs_config() if dataset == "nocs" else ycbineoat_config()
    cfg = load_config(raw, base)

    # learned frontend (reference serves LF-Net over ZMQ, run_server.py:136-177;
    # here the net runs in-process inside the jitted tracker step)
    lfnet_apply = None
    if args.frontend != "config":
        cfg = cfg.replace(
            frontend=dataclasses.replace(cfg.frontend, kind=args.frontend)
        )
    if cfg.frontend.kind == "lfnet":
        from bundletrack_tpu.frontend import load_params_npz, make_lfnet_apply

        _, lf_params = load_params_npz(args.lfnet_ckpt, cfg.frontend)
        lfnet_apply = make_lfnet_apply(cfg.frontend, lf_params)
        print(f"[run_tracking] lfnet frontend: {args.lfnet_ckpt}", file=sys.stderr)

    if dataset == "nocs":
        from bundletrack_tpu.data.nocs import NocsLoader

        # GT ob_in_cam poses for the init pose (reference converts NOCS GT
        # to text poses and reads frame 0, src/DataLoader.cpp:80-86); we
        # look for a gt_poses/ dir next to the scene dir
        gt_dir = os.path.join(os.path.dirname(cfg.data_dir.rstrip("/")), "gt_poses")
        loader = NocsLoader(
            cfg.data_dir,
            cfg.model_name,
            mask_dir=cfg.mask_dir or None,
            use_6pack_datalist=cfg.use_6pack_datalist,
            gt_dir=gt_dir if os.path.isdir(gt_dir) else None,
        )
    else:
        from bundletrack_tpu.data.ycbineoat import YcbineoatLoader

        loader = YcbineoatLoader(cfg.data_dir, mask_dir=cfg.mask_dir or None)

    n = len(loader)
    if args.max_frames:
        n = min(n, args.max_frames)
    first = loader[0]
    H, W = first.gray.shape
    print(f"[run_tracking] {dataset}: {n} frames at {W}x{H}", file=sys.stderr)

    tracker = Tracker(cfg, H, W, lfnet_apply=lfnet_apply)
    out_dir = cfg.debug_dir
    os.makedirs(os.path.join(out_dir, "poses"), exist_ok=True)

    init_pose = loader.init_pose_in_model
    t_start = time.perf_counter()
    for i in range(n):
        fd = loader[i]
        # stream raw dtypes when the loader provides them (fewer bytes over
        # the host->device link; conversion runs on device)
        gray = fd.gray_u8 if getattr(fd, "gray_u8", None) is not None else fd.gray
        depth = (
            fd.depth_u16 if getattr(fd, "depth_u16", None) is not None else fd.depth
        )
        out = tracker.process_frame(gray, depth, fd.mask, loader.K, init_pose)
        np.savetxt(
            os.path.join(out_dir, "poses", f"{fd.frame_id}.txt"),
            np.asarray(out.ob_in_cam),
            fmt="%.8f",
        )
        if i % 20 == 0:
            rate = (i + 1) / (time.perf_counter() - t_start)
            print(
                f"[run_tracking] frame {fd.frame_id} status={int(out.status)} "
                f"({rate:.1f} fps)",
                file=sys.stderr,
            )
    dt = time.perf_counter() - t_start
    print(f"[run_tracking] done: {n} frames in {dt:.1f}s ({n/dt:.2f} fps)")


if __name__ == "__main__":
    main()
