#!/usr/bin/env python
"""Benchmark: tracking rate + north-star metrics on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Baseline: the reference's published end-to-end rate of 10 Hz on an RTX 3090
(reference README.md:8, "real-time performance of 10Hz for the entire
framework" — that rate INCLUDES LF-Net inference).  The headline metric is
therefore the full pipeline with the learned LF-Net frontend inside the
jitted per-frame step when trained weights are present
(checkpoints/lfnet_params.npz); the classical-frontend rate and the
BASELINE.md north-star numbers (fleet aggregate fps, solver solves/s,
LF-Net forward latency, frontend quality metrics) ride along in "extra".

Scale mirrors BASELINE.md's per-frame envelope: 480x640 RGB-D, 512 keypoints
x 256-d descriptors, <=16-frame pose graph (120 pairs), 2000-trial RANSAC,
7x5 solver iterations, dense term at 120x160.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

LFNET_CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "checkpoints", "lfnet_params.npz")


def _bench_tracking(cfg, seq, raw, lfnet_apply=None):
    """Track the sequence once; returns (steady-state fps, ADD-S AUC)."""
    from bundletrack_tpu.eval import adds_auc
    from bundletrack_tpu.tracker.driver import Tracker
    from bundletrack_tpu.utils.timing import hard_sync

    gray_u8, depth_u16, init_pose = raw
    n_frames = seq.gray.shape[0]
    H, W = seq.gray.shape[1:]
    tracker = Tracker(cfg, H, W, lfnet_apply=lfnet_apply)
    n_warm = 4  # first frames trigger compilation of both cond branches
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
    fps = (n_frames - n_warm) / dt
    statuses = [int(np.asarray(o.status)) for o in tracker.outputs]
    rng = np.random.RandomState(0)
    model_pts = (rng.rand(500, 3).astype(np.float32) - 0.5) * 0.2
    auc = adds_auc(
        [np.asarray(o.ob_in_cam) for o in tracker.outputs],
        list(seq.ob_in_cam), model_pts,
    )
    print(f"[bench] {n_frames - n_warm} frames in {dt:.3f}s -> {fps:.2f} fps; "
          f"ADD-S AUC {auc:.2f}; "
          f"bad_statuses={sum(1 for s in statuses if s != 0)}/{len(statuses)}",
          file=sys.stderr)
    return fps, auc


def _bench_fleet(cfg, seq, S):
    """Aggregate fps tracking S identical streams batched on one chip."""
    import jax.numpy as jnp

    from bundletrack_tpu.parallel import init_fleet_state, make_fleet_step
    from bundletrack_tpu.tracker.state import FrameObservation
    from bundletrack_tpu.utils.timing import hard_sync

    H, W = seq.gray.shape[1:]
    step = make_fleet_step(cfg, H, W)
    state = init_fleet_state(cfg, H, W, S)
    tile = lambda a: jnp.broadcast_to(jnp.asarray(a), (S,) + a.shape)
    init_pose = tile(np.linalg.inv(seq.ob_in_cam[0]))
    n_frames = seq.gray.shape[0]

    def obs(f):
        return FrameObservation(
            gray=tile(seq.gray[f]), depth=tile(seq.depth[f]),
            mask=tile(seq.mask[f]), K=tile(seq.K),
        )

    for f in range(2):
        state, out = step(state, obs(f), init_pose)
    hard_sync(out)
    t0 = time.perf_counter()
    for f in range(2, n_frames):
        state, out = step(state, obs(f), init_pose)
    hard_sync(out)
    dt = time.perf_counter() - t0
    fps = S * (n_frames - 2) / dt
    print(f"[bench] fleet S={S}: {fps:.2f} aggregate fps", file=sys.stderr)
    return fps


def _bench_solver(cfg):
    """Pose-graph solves/s at reference scale (K=16, 120 pairs + dense term)."""
    import jax
    import jax.numpy as jnp

    from bundletrack_tpu.solver import GraphInputs, SparseCorres
    from bundletrack_tpu.solver.dense_p2p import compact_frame, stack_frame_dense
    from bundletrack_tpu.solver.gauss_newton import optimize_pose_graph
    from bundletrack_tpu.utils.timing import hard_sync

    rng = np.random.RandomState(0)
    K_BA, M = cfg.bundle.max_ba_frames, cfg.shapes.max_matches
    pi, pj = np.triu_indices(K_BA, k=1)
    P = len(pi)
    pts = rng.rand(P, M, 3).astype(np.float32)
    corres = SparseCorres(
        pair_i=jnp.asarray(pi, np.int32), pair_j=jnp.asarray(pj, np.int32),
        pts_i=jnp.asarray(pts),
        pts_j=jnp.asarray(pts + 0.002 * rng.randn(P, M, 3).astype(np.float32)),
        valid=jnp.ones((P, M), bool),
    )
    Hl, Wl = 120, 160
    depth = 0.5 + 0.1 * rng.rand(K_BA, Hl, Wl).astype(np.float32)
    fds = [
        compact_frame(
            jnp.stack([jnp.zeros((Hl, Wl))] * 2 + [jnp.asarray(depth[k])], -1),
            jnp.concatenate(
                [jnp.zeros((Hl, Wl, 2)), -jnp.ones((Hl, Wl, 1))], -1
            ),
            jnp.ones((Hl, Wl), bool),
            cfg.bundle.dense_src_capacity,
        )
        for k in range(K_BA)
    ]
    dense = stack_frame_dense(
        jnp.stack([f.src for f in fds]), jnp.stack([f.valid for f in fds]),
        jnp.stack([f.lin for f in fds]), jnp.stack([f.tchan for f in fds]),
    )
    K_low = jnp.asarray(
        [[100.0, 0, Wl / 2], [0, 100.0, Hl / 2], [0, 0, 1]], jnp.float32
    )
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K_BA, 4, 4))
    inputs = GraphInputs(
        poses=poses, frame_valid=jnp.ones(K_BA, bool),
        free_mask=jnp.asarray([False] + [True] * (K_BA - 1)),
        corres=corres, dense_compact=dense, K_lowres=K_low,
    )
    solve = jax.jit(lambda inp: optimize_pose_graph(inp, cfg.bundle)[0])
    out = solve(inputs)
    hard_sync(out)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = solve(inputs)
    hard_sync(out)
    rate = n / (time.perf_counter() - t0)
    print(f"[bench] solver: {rate:.1f} solves/s (K=16, 120 pairs, dense)",
          file=sys.stderr)
    return rate


def _bench_lfnet_forward(fcfg, params):
    """Mean LF-Net forward latency at serving size (reference
    test_lfnet_speed.py protocol)."""
    import jax
    import jax.numpy as jnp

    from bundletrack_tpu.frontend.lfnet import LFNet
    from bundletrack_tpu.utils.timing import hard_sync

    model = LFNet(fcfg)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    # ship the weights once — passing numpy params re-transfers ~10 MB over
    # the host tunnel per call and dominates the measurement
    params = jax.device_put(params)
    x = jnp.zeros((1, fcfg.input_size, fcfg.input_size, 1), jnp.float32)
    hard_sync(fwd(params, x))
    t0 = time.perf_counter()
    for _ in range(20):
        out = fwd(params, x)
    hard_sync(out)
    ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"[bench] lfnet {fcfg.input_size}^2 forward: {ms:.2f} ms", file=sys.stderr)
    return ms


def _bench_matcher():
    """Pallas-vs-XLA BA matcher decision record (VERDICT r3 task 3)."""
    from benchmarks.bench_matcher import main as matcher_main

    return matcher_main(["--reps", "10"], print_json=False)


def _bench_hard_suite(cfg, lfnet_apply, lf_cfg):
    """ADD-S AUC on the hostile multi-shape world, both frontends.

    Renders each pass once and reuses the headline configs so the jitted
    tracker steps are shared (tracker/driver._STEP_CACHE)."""
    from bundletrack_tpu.data.hard_world import hard_passes
    from bundletrack_tpu.eval.hard_suite import run_hard_suite

    t0 = time.perf_counter()
    passes = hard_passes(H=480, W=640, num_frames=16)
    print(f"[bench] hard passes rendered in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    out = {"classical": run_hard_suite(cfg, passes=passes)}
    print(f"[bench] hard suite classical: {out['classical']}", file=sys.stderr)
    if lfnet_apply is not None:
        out["lfnet"] = run_hard_suite(lf_cfg, lfnet_apply=lfnet_apply, passes=passes)
        print(f"[bench] hard suite lfnet: {out['lfnet']}", file=sys.stderr)
    return out


def _bench_fleet_table(seq240):
    """Stream-scaling table at 240x320 (VERDICT r3 task 5): aggregate fps
    for S=1..32 on one chip."""
    from bundletrack_tpu.config import (
        BundleConfig, FrontendConfig, KeyframeConfig, RansacConfig,
        ShapeConfig, TrackerConfig,
    )

    H, W = 240, 320
    cfg = TrackerConfig(
        bundle=BundleConfig(dense_src_capacity=1024, early_stop_delta=0.005),
        shapes=ShapeConfig(image_h=H, image_w=W),
    )
    table = {}
    for S in (1, 4, 8, 16, 32):
        table[f"s{S}"] = round(_bench_fleet(cfg, seq240, S), 2)
    return table


def _bench_stage_profiles(lf_cfg=None, lfnet_apply=None):
    """Measured per-stage ms tables (VERDICT r4 tasks 3 + 8): full-res
    single-stream for both frontends, and 240x320 at S=1/16 (the fleet
    table's operating points) with the raw host->device transfer cost."""
    from benchmarks.profile_stages import profile_stages

    out = {}
    out["s1_480x640_classical"] = profile_stages(
        H=480, W=640, S=1, reps=5, measure_h2d=True, verbose=False
    )
    if lfnet_apply is not None:
        out["s1_480x640_lfnet"] = profile_stages(
            H=480, W=640, S=1, reps=5, cfg=lf_cfg, lfnet_apply=lfnet_apply,
            verbose=False,
        )
    for S in (1, 16):
        out[f"s{S}_240x320"] = profile_stages(
            H=240, W=320, S=S, reps=5, measure_h2d=True,
            include_full_step=False, verbose=False,
        )
    for k, v in out.items():
        print(f"[bench] stage profile {k}: {v}", file=sys.stderr)
    return out


def _fleet_analysis(table, profiles):
    """Scaling analysis derived from the measured tables only (advisor r4:
    no hardcoded empirical claims)."""
    s1 = table.get("s1", 0.0)
    smax_key = max(table, key=lambda k: table[k])
    gain = table[smax_key] / max(s1, 1e-6)
    lines = [
        f"Stream batching at 240x320 peaks at {table[smax_key]} aggregate "
        f"fps ({smax_key}) vs {s1} at S=1 — a {gain:.2f}x utilization gain."
    ]
    p16 = profiles.get("s16_240x320", {})
    p1 = profiles.get("s1_240x320", {})
    stages16 = {k: v for k, v in p16.items() if not k.startswith("h2d")}
    if stages16:
        dom = max(stages16, key=lambda k: stages16[k])
        per_stream = stages16[dom] / 16.0
        lines.append(
            f"At S=16 the heaviest stage is {dom} at {stages16[dom]} ms per "
            f"step ({per_stream:.2f} ms/stream vs "
            f"{p1.get(dom, float('nan'))} ms at S=1 — stage table in "
            "stage_profile), i.e. batching amortizes per-dispatch overhead "
            "and fills the chip between stages."
        )
    h2d_ms = p16.get("h2d_ms")
    bpf = p16.get("h2d_bytes_per_frame")
    if h2d_ms is not None and bpf is not None:
        lines.append(
            f"Host->device input transfer measures {h2d_ms} ms for a 16-"
            f"stream observation batch ({bpf / 1e6:.2f} MB/frame raw sensor "
            "data) on the single-chip tunnel — a fixed per-dispatch latency "
            "cost that batching shares across streams."
        )
    s16, s32 = table.get("s16"), table.get("s32")
    if s16 is not None and s32 is not None:
        if s32 < s16:
            step_ms_32 = 32.0 / s32 * 1000.0
            xfer_ms_32 = (h2d_ms or 0.0) * 2.0  # 2x the measured 16-stream batch
            lines.append(
                f"s32 ({s32} fps) regresses below s16 ({s16} fps): a 32-"
                f"stream step is {step_ms_32:.0f} ms of which ~"
                f"{xfer_ms_32:.0f} ms is input transfer (scaling the "
                "measured 16-stream cost), and the larger working set "
                "spills the on-chip overlap the 16-stream point enjoys."
            )
        else:
            lines.append(
                f"s32 ({s32} fps) still exceeds s16 ({s16} fps); no "
                "bend-back at this size."
            )
    lines.append(
        "Design consequence: throughput scales with streams ACROSS chips "
        "(each stream's transfers and compute land on its own chip; zero "
        "cross-chip collectives), while within-stream latency scales via "
        "the pair-sharded BA (bundle.ba_mesh_axis, parallel/pair_sharded.py)."
    )
    return " ".join(lines)


def _bench_long_horizon(cfg, lf_cfg=None, lfnet_apply=None, num_frames=128):
    """Long-horizon hostile passes (VERDICT r4 task 1): >=128-frame orbit /
    occluder-sweep / scale2x tracked by both frontends, plus the orbit pass
    re-tracked with ONLINE VOS-generated masks."""
    from bundletrack_tpu.data.hard_world import long_hard_passes
    from bundletrack_tpu.eval.hard_suite import run_long_suite

    t0 = time.perf_counter()
    passes = long_hard_passes(H=480, W=640, num_frames=num_frames)
    print(f"[bench] long passes rendered in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    vos_ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "checkpoints", "vos_params.npz")
    if not os.path.exists(vos_ckpt):
        vos_ckpt = None
    out = {}
    if lfnet_apply is not None:
        out["lfnet"] = run_long_suite(
            lf_cfg, lfnet_apply=lfnet_apply, passes=passes, vos_ckpt=vos_ckpt
        )
        print(f"[bench] long suite lfnet: {out['lfnet']}", file=sys.stderr)
        vos_ckpt = None  # VOS-in-the-loop measured once, on the lfnet path
    out["classical"] = run_long_suite(cfg, passes=passes, vos_ckpt=vos_ckpt)
    print(f"[bench] long suite classical: {out['classical']}", file=sys.stderr)
    return out


def _bench_nocs(num_frames=48):
    """NOCS protocol over a hard-world pass (VERDICT r4 task 7): track with
    the NOCS preset, inject the reference's +-0.02 m init-pose noise and
    re-anchor, then score 5deg5cm / IoU-25 (reference eval_nocs.py:63-116,
    benchmark.py:296-320)."""
    import jax.numpy as jnp  # noqa: F401  (keeps import ordering consistent)

    from bundletrack_tpu.config import BundleConfig, ShapeConfig, nocs_config
    from bundletrack_tpu.data.hard_world import model_points, render_hard_sequence
    from bundletrack_tpu.eval.nocs_protocol import (
        evaluate_nocs,
        perturb_init_pose,
        reanchor_trajectory,
    )
    from bundletrack_tpu.tracker.driver import track_sequence

    H, W = 480, 640
    seq = render_hard_sequence(
        "cube", num_frames=num_frames, H=H, W=W, seed=29,
        orbit_deg_per_frame=3.0,
    )
    cfg = nocs_config(
        shapes=ShapeConfig(image_h=H, image_w=W),
        bundle=BundleConfig(
            min_fm_edges_newframe=10, dense_src_capacity=2048,
            early_stop_delta=0.005,
        ),
    )
    poses, statuses, _ = track_sequence(cfg, seq)
    pts = model_points("cube", size=0.2)
    lo, hi = pts.min(0), pts.max(0)
    corners = np.array(
        [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
         for z in (lo[2], hi[2])], np.float32,
    ).T  # [3, 8]
    rng = np.random.RandomState(0)
    noisy_init = perturb_init_pose(seq.ob_in_cam[0], rng=rng)
    preds = reanchor_trajectory(list(poses), noisy_init)
    res = evaluate_nocs(preds, list(seq.ob_in_cam), corners, "laptop")
    res["n_fail"] = int(np.sum(np.asarray(statuses) == 1))
    res = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in res.items()}
    print(f"[bench] nocs protocol (48-frame hard cube, noisy init): {res}",
          file=sys.stderr)
    return res


def _bench_vos():
    """VOS propagation IoU: easy 32-frame + hard 110-frame + occluder clip
    (VERDICT r3 task 7 evidence), with the shipped checkpoint."""
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "checkpoints", "vos_params.npz")
    if not os.path.exists(ckpt):
        return None
    from bundletrack_tpu.config import SegmentationConfig
    from bundletrack_tpu.data import render_hard_sequence, render_synthetic_sequence
    from bundletrack_tpu.eval import evaluate_vos
    from bundletrack_tpu.models.vos import load_vos_npz

    model, params = load_vos_npz(ckpt)
    seg = SegmentationConfig()
    out = {"width": int(model.width)}
    easy = render_synthetic_sequence(num_frames=32, H=96, W=96, seed=999,
                                     orbit_deg_per_frame=4.0)
    r = evaluate_vos(params, model, seg, easy)
    out["easy32"] = {"mean_iou": round(r["mean_iou"], 3),
                     "min_iou": round(r["min_iou"], 3)}
    hard = render_hard_sequence(
        "lshape", num_frames=110, H=96, W=96, seed=777,
        orbit_deg_per_frame=3.0, depth_noise=0.0, depth_quant=0.0,
        hole_fraction=0.0, mask_errors=False, background=True)
    r = evaluate_vos(params, model, seg, hard)
    out["hard110"] = {"mean_iou": round(r["mean_iou"], 3),
                      "min_iou": round(r["min_iou"], 3)}
    # widened sparse-reference window (SegmentationConfig.long_range):
    # measured r5 win on min IoU with flat mean — the production setting
    # for 100+-frame propagations
    r = evaluate_vos(params, model, seg.long_range(110), hard)
    out["hard110_longrange"] = {"mean_iou": round(r["mean_iou"], 3),
                                "min_iou": round(r["min_iou"], 3)}
    occ = render_hard_sequence(
        "cube", num_frames=48, H=96, W=96, seed=778,
        orbit_deg_per_frame=3.0, depth_noise=0.0, depth_quant=0.0,
        hole_fraction=0.0, mask_errors=False, background=True, occluder=True)
    r = evaluate_vos(params, model, seg, occ)
    out["occluder48"] = {"mean_iou": round(r["mean_iou"], 3),
                         "tail10_mean": round(float(
                             np.mean(r["per_frame"][-10:])), 3)}
    print(f"[bench] vos: {out}", file=sys.stderr)
    return out


def _bench_cpu_mesh_scaling():
    """8-virtual-device fleet scaling efficiency, measured in a CPU
    subprocess (the TPU process cannot host a CPU mesh)."""
    code = r"""
import os, sys, time, json
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from bundletrack_tpu.config import BundleConfig, TrackerConfig, ShapeConfig
from bundletrack_tpu.data import render_synthetic_sequence
from bundletrack_tpu.parallel import init_fleet_state, make_mesh, make_fleet_step
from bundletrack_tpu.tracker.state import FrameObservation

H, W = 96, 128
cfg = TrackerConfig(shapes=ShapeConfig(image_h=H, image_w=W),
                    bundle=BundleConfig(dense_src_capacity=512))
seq = render_synthetic_sequence(num_frames=8, H=H, W=W, orbit_deg_per_frame=2.0)
init = np.linalg.inv(seq.ob_in_cam[0])

def run(n_dev, S):
    mesh = make_mesh({"stream": n_dev}) if n_dev > 1 else None
    step = make_fleet_step(cfg, H, W, mesh=mesh)
    state = init_fleet_state(cfg, H, W, S)
    tile = lambda a: jnp.broadcast_to(jnp.asarray(a), (S,) + a.shape)
    ip = tile(init)
    def obs(f):
        return FrameObservation(gray=tile(seq.gray[f]), depth=tile(seq.depth[f]),
                                mask=tile(seq.mask[f]), K=tile(seq.K))
    state, out = step(state, obs(0), ip)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for f in range(1, 8):
        state, out = step(state, obs(f), ip)
    jax.block_until_ready(out)
    return S * 7 / (time.perf_counter() - t0)

r1 = run(1, 1)
r8 = run(8, 8)
print(json.dumps({"fps_1dev_s1": r1, "fps_8dev_s8": r8,
                  "scaling_eff": r8 / (8 * r1)}))
"""
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=900, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        d = json.loads(line)
        # NOTE: the 8 virtual CPU devices share ONE host's cores, so this is
        # an executability check of the sharded fleet step, not a throughput
        # scaling measurement; cross-chip stream sharding has zero
        # cross-stream collectives, so real scaling is communication-free.
        print(f"[bench] cpu-mesh 8dev fleet step: ok "
              f"(1dev {d['fps_1dev_s1']:.2f} fps, 8dev shared-core "
              f"{d['fps_8dev_s8']:.2f} aggregate)", file=sys.stderr)
        return d
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"[bench] cpu-mesh fleet step failed: {e}", file=sys.stderr)
        return None


def _frontend_quality(lfnet_apply):
    """Repeatability / matching-inlier-rate: classical vs learned frontend,
    on the easy cube orbit AND on hard textured content (clean GT channels so
    the warp fields are exact — only the CONTENT is hard)."""
    from bundletrack_tpu.config import FrontendConfig
    from bundletrack_tpu.data import render_synthetic_sequence
    from bundletrack_tpu.data.hard_world import render_hard_sequence
    from bundletrack_tpu.eval import evaluate_frontend

    worlds = {
        "easy": render_synthetic_sequence(
            num_frames=5, H=240, W=320, orbit_deg_per_frame=4.0, seed=123),
        "hard": render_hard_sequence(
            "lshape", num_frames=5, H=240, W=320, orbit_deg_per_frame=4.0,
            roll_deg_per_frame=2.0, seed=123, depth_noise=0.0,
            depth_quant=0.0, hole_fraction=0.0, mask_errors=False),
    }
    out = {}
    for wname, seq in worlds.items():
        row = {"classical": evaluate_frontend(
            seq, FrontendConfig(kind="classical"), gap=1, eps_px=3.0)}
        if lfnet_apply is not None:
            row["lfnet"] = evaluate_frontend(
                seq, FrontendConfig(kind="lfnet"), lfnet_apply=lfnet_apply,
                gap=1, eps_px=3.0)
        for k, v in row.items():
            print(f"[bench] frontend {wname}/{k}: "
                  f"repeat={v['repeatability']:.3f} "
                  f"inlier={v['inlier_rate']:.3f} n={v['n_matches']:.0f}",
                  file=sys.stderr)
        out[wname] = row
    return out


def main():
    from bundletrack_tpu.config import BundleConfig, TrackerConfig, ShapeConfig
    from bundletrack_tpu.data import render_synthetic_sequence
    from bundletrack_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    H, W = 480, 640
    # dense_src_capacity 2048: validated sub-mm-identical to the default 4096
    # on the synthetic eval, halves the dense-term gather in the solver stage
    # early_stop_delta=0.005 is a documented non-reference perf opt-in
    # (PARITY.md; the shipped reference never defines ENABLE_EARLY_OUT)
    cfg = TrackerConfig(
        shapes=ShapeConfig(image_h=H, image_w=W),
        bundle=BundleConfig(dense_src_capacity=2048, early_stop_delta=0.005),
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
    raw = (gray_u8, depth_u16, init_pose)

    extra = {}
    fps_c, auc_c = _bench_tracking(cfg, seq, raw)
    extra["classical_fps"] = round(fps_c, 2)
    extra["classical_adds_auc"] = round(auc_c, 2)

    lfnet_apply = None
    lf_fcfg = None
    lf_cfg = None
    if os.path.exists(LFNET_CKPT):
        from bundletrack_tpu.config import FrontendConfig
        from bundletrack_tpu.frontend import load_params_npz, make_lfnet_apply

        lf_fcfg = FrontendConfig(kind="lfnet")
        _, lf_params = load_params_npz(LFNET_CKPT, lf_fcfg)
        lfnet_apply = make_lfnet_apply(lf_fcfg, lf_params)
        lf_cfg = cfg.replace(frontend=lf_fcfg)
        fps_l, auc_l = _bench_tracking(lf_cfg, seq, raw, lfnet_apply=lfnet_apply)
        extra["lfnet_fps"] = round(fps_l, 2)
        extra["lfnet_adds_auc"] = round(auc_l, 2)
        extra["lfnet_forward_ms"] = round(_bench_lfnet_forward(lf_fcfg, lf_params), 2)

    fq = _frontend_quality(lfnet_apply)
    extra["frontend_quality"] = fq

    extra["solver_solves_per_s"] = round(_bench_solver(cfg), 1)
    extra["matcher"] = _bench_matcher()
    extra["hard_suite_16f"] = _bench_hard_suite(cfg, lfnet_apply, lf_cfg)
    extra["long_horizon_128f"] = _bench_long_horizon(cfg, lf_cfg, lfnet_apply)
    extra["nocs"] = _bench_nocs()
    for S in (4, 8):
        extra[f"fleet_fps_s{S}"] = round(_bench_fleet(cfg, seq, S), 2)
    # chip utilization gain from stream batching (one chip; cross-chip
    # stream sharding is communication-free so multi-chip throughput is
    # N_chips * these numbers)
    extra["fleet_batching_gain_s4"] = round(
        extra["fleet_fps_s4"] / extra["classical_fps"], 2
    )
    seq240 = render_synthetic_sequence(num_frames=10, H=240, W=320,
                                       orbit_deg_per_frame=2.0)
    extra["fleet_table_240x320"] = _bench_fleet_table(seq240)
    extra["stage_profile"] = _bench_stage_profiles(lf_cfg, lfnet_apply)
    extra["fleet_analysis"] = _fleet_analysis(
        extra["fleet_table_240x320"], extra["stage_profile"]
    )
    vos = _bench_vos()
    if vos:
        extra["vos"] = vos
    scal = _bench_cpu_mesh_scaling()
    extra["sharded_fleet_8dev_ok"] = bool(scal)

    if "lfnet_fps" in extra:
        metric, value = "single_stream_tracking_rate_480x640_lfnet", extra["lfnet_fps"]
    else:
        metric, value = "single_stream_tracking_rate_480x640", extra["classical_fps"]
    headline = {
        "metric": metric,
        "value": value,
        "unit": "frames/s",
        "vs_baseline": round(value / 10.0, 3),
    }

    # Loss-proof artifact (VERDICT r4 task 2): the FULL result goes to a
    # committed file; stdout gets ONLY a compact headline line so the
    # driver's tail capture can never truncate away the round's numbers
    # (r4's single giant JSON line lost the headline fields).
    full = dict(headline)
    full["extra"] = extra
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_full_r05.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    print(f"[bench] full results written to {full_path}", file=sys.stderr)

    def g(d, *ks):
        for k in ks:
            d = d.get(k, {}) if isinstance(d, dict) else {}
        return d if not isinstance(d, dict) or d else None

    lh = extra["long_horizon_128f"]
    compact = {
        "classical_fps": extra["classical_fps"],
        "classical_adds_auc": extra["classical_adds_auc"],
        "lfnet_fps": extra.get("lfnet_fps"),
        "lfnet_adds_auc": extra.get("lfnet_adds_auc"),
        "lfnet_forward_ms": extra.get("lfnet_forward_ms"),
        "solver_solves_per_s": extra["solver_solves_per_s"],
        "hard16_mean_lfnet": g(extra, "hard_suite_16f", "lfnet", "mean"),
        "hard16_mean_classical": g(extra, "hard_suite_16f", "classical", "mean"),
        "long128_mean_lfnet": g(lh, "lfnet", "mean_adds_auc"),
        "long128_mean_classical": g(lh, "classical", "mean_adds_auc"),
        "long128_vosmask_auc": g(lh, "lfnet", "passes", "orbit_vosmask",
                                 "adds_auc"),
        "nocs_5deg5cm": extra["nocs"].get("5deg5cm"),
        "nocs_iou25": extra["nocs"].get("IoU25"),
        "fleet_peak_fps_240": max(extra["fleet_table_240x320"].values()),
        "vos_hard110_iou": g(extra, "vos", "hard110", "mean_iou"),
        "full_results": "BENCH_full_r05.json",
    }
    print(json.dumps({**headline, "extra": compact}))


if __name__ == "__main__":
    main()
