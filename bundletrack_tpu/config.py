"""Configuration for the TPU tracker.

Covers the full flag surface of the reference YAML config
(reference: config_ycbineoat.yml:1-66, config_nocs.yml) plus the static-shape
capacities the TPU design needs (keypoint/match/pair/trial padding).  The
reference reads its YAML ad hoc at use sites (e.g. src/Bundler.cpp:281-283);
here the whole surface is typed dataclasses, hashable so a config can be a
static argument to a jitted function.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Tuple


def _frozen(cls):
    return dataclass(frozen=True)(cls)


@_frozen
class ErodeConfig:
    """Depth erosion (reference: config_ycbineoat.yml depth_processing.erode,
    kernel CUDAImageUtil erodeDepthMap)."""

    radius: int = 1
    diff: float = 0.001
    ratio: float = 0.8  # if the fraction of differing neighbors exceeds this, zero depth


@_frozen
class BilateralConfig:
    """Depth-aware bilateral filter (reference: gaussFilterDepthMap)."""

    radius: int = 2
    sigma_d: float = 2.0
    sigma_r: float = 100000.0


@_frozen
class OutlierRemovalConfig:
    num: int = 30
    std_mul: float = 3.0


@_frozen
class DepthProcessingConfig:
    erode: ErodeConfig = ErodeConfig()
    bilateral_filter: BilateralConfig = BilateralConfig()
    outlier_removal: OutlierRemovalConfig = OutlierRemovalConfig()
    zfar: float = 2.0  # reference zeroes depth < 0.1 m (Utils.cpp:49-68)
    znear: float = 0.1


@_frozen
class BundleConfig:
    """Pose-graph optimizer settings (reference: config bundle.*)."""

    num_iter_outer: int = 7  # GN outer iterations (num_iter_outter)
    num_iter_inner: int = 5  # PCG inner iterations
    # ACCEPTED BUT IGNORED: the reference keeps a sliding window of the last
    # `window_size` non-keyframes as extra BA candidates (src/Bundler.cpp:
    # 149-159); here the BA subset is always prev frame + keyframe pool —
    # the pool (capacity keyframe.pool_size) subsumes the window's role.
    # The key is parsed so reference YAMLs load unchanged.
    window_size: int = 2
    max_ba_frames: int = 16  # reference 15; padded to 16 for TPU tile alignment
    subset_selection_method: str = "greedy_rot"
    robust_delta: float = 0.005
    min_fm_edges_newframe: int = 5
    image_downscale: int = 4  # dense point-to-plane term resolution divisor
    # static capacity of compacted valid source pixels per frame in the dense
    # term (the reference sizes its dense residual buffers at H*W/4 per pair,
    # src/cuda/LossGPU.cu:102); valid pixels beyond this are decimated evenly.
    # The per-GN-iteration association gather scales linearly with this: 2048
    # halves the solver stage vs 4096 with no measurable accuracy change on
    # the synthetic eval (pair weights saturate at 1/min(log n, 9) anyway),
    # and bench.py uses 2048; the default stays at the reference-faithful
    # 4096 until the cheaper setting is validated on real large-object
    # sequences.
    dense_src_capacity: int = 4096
    solver_backend: str = "cholesky"  # "cholesky" (dense 6Kx6K normal eqs) or "pcg"
    lm_lambda: float = 1e-6  # Levenberg damping added to the normal equations
    w_sparse: float = 1.0  # reference SBA.cpp:28-32 weightsSparse = 1
    w_dense_depth: float = 1.0  # weightsDenseDepth = 1
    w_dense_color: float = 0.0  # weightsDenseColor = 0 (compiled but disabled)
    # GN early-out: stop outer iterations once max |delta| over free frames
    # drops below this; 0 disables and always runs num_iter_outer.  The
    # reference ships this behind ENABLE_EARLY_OUT (SolverBundling.cu:996-999)
    # which is never defined in any build file, so the shipped reference
    # always runs all iterations — the default 0.0 matches that.  Setting a
    # positive delta is a documented non-reference perf opt-in (PARITY.md);
    # bench.py enables 0.005.
    early_stop_delta: float = 0.0
    # post-solve verification (reference CUDASolverBundling::useVerification,
    # src/cuda/Solver/CUDASolverBundling.cpp:396-417 with thresholds from
    # :31-32; the reference compiles it but always sets m_bVerify=false,
    # SBA.cpp:74,87 — here the flag actually gates a solve-reject path)
    use_verification: bool = False
    verify_dist_thresh: float = 0.02  # m_verifyOptDistThresh
    verify_percent_thresh: float = 0.05  # m_verifyOptPercentThresh
    # Within-stream multi-chip parallelism (SURVEY §2.6; reference analog:
    # one CUDA stream per pair, src/cuda/cuda_ransac.cu:1267-1284): name of
    # the mesh axis to shard the BA pair work (matching + RANSAC +
    # normal-equation build) over.  Empty = single-device BA.  Takes effect
    # when a mesh carrying this axis is passed to Tracker(mesh=...) /
    # make_fleet_step(mesh=...); the pair count K*(K-1)/2 must divide the
    # axis size (120 pairs at the default K=16 → 2/4/8-way shards).
    ba_mesh_axis: str = ""


@_frozen
class KeyframeConfig:
    min_interval: int = 1
    min_feat_num: int = 0
    min_rot: float = 10.0  # degrees of rotation from every existing keyframe
    pool_size: int = 32  # static capacity of the keyframe memory pool (TPU shape)


@_frozen
class FeatureCorresConfig:
    """Geometric gates for descriptor matching (reference feature_corres.*)."""

    mutual: bool = True
    max_dist_no_neighbor: float = 0.02
    max_normal_no_neighbor: float = 45.0
    max_dist_neighbor: float = 0.03
    max_normal_neighbor: float = 45.0
    map_points: bool = True  # propagate matches through the landmark table
    # BA all-pairs matching backend: "auto" resolves to the fused Pallas
    # kernel on TPU (measured r4 on-chip at P=120/N=512/D=256: 2.81 ms vs
    # 3.11 ms XLA, ground-truth match precision 1.0000 for both —
    # benchmarks/bench_matcher.py, recorded in BENCH_r04 extra) and to the
    # XLA path elsewhere (CPU tests; Mosaic kernels are TPU-only).
    backend: str = "auto"  # "auto" | "xla" | "pallas" | "pallas_interpret"


@_frozen
class RansacConfig:
    max_iter: int = 2000
    num_sample: int = 3
    inlier_dist: float = 0.01
    inlier_normal_angle: float = 45.0
    max_trans_neighbor: float = 0.05
    max_rot_deg_neighbor: float = 45.0
    max_trans_no_neighbor: float = 0.02
    max_rot_no_neighbor: float = 10.0
    epsilon: float = 1e-8
    min_match_after_ransac: int = 5  # reference FeatureManager.cpp:233-241
    # after a FAIL (need_reinit set), require this many neighbor-RANSAC
    # inliers to re-acquire; weak re-acquisitions (e.g. 5-10 inliers on an
    # aliased viewpoint after an occlusion) stay FAIL instead of locking a
    # wrong pose.  The reference sets _need_reinit but never consumes it
    # (src/Bundler.cpp:96-101) — this is the consuming policy.
    reinit_min_matches: int = 15


@_frozen
class P2PConfig:
    """Dense point-to-plane association gates (reference p2p.*)."""

    max_dist: float = 0.02
    max_normal_angle: float = 45.0
    min_pair_pixels: int = 800  # pairs with fewer dense corrs are dropped
    # weight = 1/min(log(n), 9) (reference WeightDenseCorrespondences_Kernel)


@_frozen
class FrontendConfig:
    """Keypoint network settings (reference: lf-net-release/run_server.py:66-106)."""

    kind: str = "classical"  # "lfnet" | "classical"
    input_size: int = 400  # reference FeatureManager.cpp:851-854
    top_k: int = 512  # reference 500; padded to 512
    desc_dim: int = 256
    # LF-Net detector (models/mso_resnet_detector.py get_model defaults)
    net_block: int = 3
    net_channel: int = 16
    conv_ksize: int = 3
    # scale pyramid: 5 scales in [2^-1, 2^1] instead of the reference's 9 in
    # [2^-3, 1] (lf-net-release/run_server.py:70-72) — the reference
    # upsamples feature maps by 1/scale, so 2^-3 means an 8x-upsampled score
    # conv; measured on TPU at 400^2: 178 ms (9-scale) vs 33 ms (5-scale)
    # per forward.  The symmetric pyramid covers the same relative-scale
    # span at bounded cost (see frontend/lfnet.py docstring).
    net_min_scale: float = 0.5
    net_max_scale: float = 2.0
    net_num_scales: int = 5
    sm_ksize: int = 15  # soft_nms_3d spatial window
    com_strength: float = 100.0
    score_com_strength: float = 100.0
    scale_com_strength: float = 100.0
    nms_thresh: float = 0.0
    nms_ksize: int = 5
    crop_radius: int = 16
    patch_size: int = 32
    kp_loc_size: int = 9
    soft_kpts: bool = True
    soft_scale: bool = True
    do_softmax_kp_refine: bool = True
    kp_com_strength: float = 1.0
    # SimpleDesc (models/simple_desc.py)
    desc_net_channel: int = 64
    desc_net_depth: int = 3
    desc_conv_ksize: int = 3
    # normalization: "gn" (train-from-scratch default) or "bn" (frozen
    # batch-norm stats, for TF1-checkpoint-ported weights — port_tf1.py)
    norm: str = "gn"
    # bf16 conv-path compute (params stay f32, so checkpoints are shared
    # with the f32 path; norms always run f32).  Serving default: the
    # per-scale feature upsample dominates the forward's HBM traffic and
    # halves in bf16.  Training (apps/train_lfnet.py) sets False — grads
    # stay full precision.
    bf16: bool = True
    # classical frontend
    harris_k: float = 0.04
    harris_sigma: float = 1.0
    # depth-scaled descriptor patches: sample spacing z0/z so patches cover
    # a constant physical extent — the RGB-D answer to scale change (the r4
    # classical frontend collapsed to 28.13 AUC on the 2x scale pass with
    # fixed-pixel patches).  0 disables (fixed 16-px patches).
    harris_patch_z0: float = 0.55


@_frozen
class SegmentationConfig:
    """Video-object-segmentation settings (reference: transductive-vos run_video.py)."""

    # ACCEPTED BUT IGNORED: NOCS yml sets 3, but the reference C++ parses
    # this key and never reads it — always exactly one 5x5 dilate
    # (src/Frame.cpp:313-315); preprocess_mask matches that.
    seg_dilation_iter: int = 0
    # largest-CC + convex-hull mask fill (reference NOCS path,
    # src/Frame.cpp:262-312, keyed there on data_dir containing "NOCS")
    nocs_mask_fill: bool = False
    backbone: str = "resnet18"
    ref_num: int = 9
    sigma1: float = 8.0
    sigma2: float = 21.0
    # the reference uses temperature 1.0 on UNNORMALIZED ResNet features
    # (large-magnitude logits); our VOSNet l2-normalizes features, so the
    # cosine similarities in [-1, 1] need a sharper temperature or the
    # attention is near-uniform and propagation decays (measured: IoU 0.01
    # at T=1 vs 0.85 at T<=0.2 with the same weights)
    temperature: float = 0.05
    range_: int = 40
    downscale: int = 8
    # feature-ring capacity of the online propagator (frames of history the
    # sparse sampling window can reach; must be >= range_ or older wanted
    # ages snap to the oldest retained frame).  The reference keeps its
    # whole history in host RAM (run_video.py); the TPU ring is fixed-size.
    history_cap: int = 48
    # EXTENSION (not in the reference): keep the GT-initialized first frame
    # pinned as the oldest sparse reference forever.  The reference's
    # range_=40 sampling (lib/predict.py:63-78) plus a finite history ring
    # drops the only ground-truth anchor, so long propagations drift
    # unrecoverably; False restores exact reference behavior.
    anchor_first: bool = True

    def long_range(self, num_frames: int) -> "SegmentationConfig":
        """Widen the sparse-reference window to cover a long sequence.

        Measured on the hard110 protocol (r5): range_=100 with a 128-frame
        ring lifts min IoU 0.637 -> 0.675 at equal mean — mid-orbit frames
        gain references from the whole revisit arc instead of only the last
        40 frames.  Mean IoU is flat, so this stays opt-in for short clips.
        """
        rg = min(int(num_frames), 100)
        if rg <= self.range_:
            return self
        cap = max(self.history_cap, rg + 28)
        return dataclasses.replace(self, range_=rg, history_cap=cap)


@_frozen
class ShapeConfig:
    """Static capacities that replace the reference's dynamic std::vectors.

    XLA compiles fixed shapes; every dynamically sized quantity in the
    reference (matches per pair, keyframes, RANSAC inliers) becomes a padded
    array + validity mask at these capacities.
    """

    max_matches: int = 256  # per-pair correspondence capacity M
    max_landmarks: int = 2048  # map-point table capacity
    image_h: int = 480
    image_w: int = 640


@_frozen
class TrackerConfig:
    data_dir: str = ""
    mask_dir: str = ""
    model_name: str = ""
    model_dir: str = ""
    debug_dir: str = "/tmp/bundletrack_tpu/"
    log_level: int = 0  # reference LOG
    use_6pack_datalist: bool = False

    depth_processing: DepthProcessingConfig = DepthProcessingConfig()
    bundle: BundleConfig = BundleConfig()
    keyframe: KeyframeConfig = KeyframeConfig()
    feature_corres: FeatureCorresConfig = FeatureCorresConfig()
    ransac: RansacConfig = RansacConfig()
    p2p: P2PConfig = P2PConfig()
    frontend: FrontendConfig = FrontendConfig()
    segmentation: SegmentationConfig = SegmentationConfig()
    shapes: ShapeConfig = ShapeConfig()

    def replace(self, **kw) -> "TrackerConfig":
        return dataclasses.replace(self, **kw)


def nocs_config(**overrides) -> TrackerConfig:
    """NOCS-REAL275 preset (reference: config_nocs.yml deltas vs ycbineoat)."""
    cfg = TrackerConfig(
        use_6pack_datalist=True,
        bundle=BundleConfig(min_fm_edges_newframe=10),
        feature_corres=FeatureCorresConfig(
            max_dist_neighbor=10000.0, max_normal_neighbor=180.0
        ),
        ransac=RansacConfig(
            inlier_dist=0.005, max_trans_neighbor=0.2, max_rot_deg_neighbor=25.0
        ),
        segmentation=SegmentationConfig(seg_dilation_iter=3, nocs_mask_fill=True),
    )
    return cfg.replace(**overrides) if overrides else cfg


def ycbineoat_config(**overrides) -> TrackerConfig:
    cfg = TrackerConfig()
    return cfg.replace(**overrides) if overrides else cfg


def _update_dataclass(dc, data: Mapping[str, Any]):
    """Recursively rebuild a frozen dataclass from a nested mapping."""
    kw = {}
    names = {f.name: f for f in dataclasses.fields(dc)}
    for key, val in data.items():
        name = _YAML_ALIASES.get(key, key)
        if name not in names:
            continue
        cur = getattr(dc, name)
        if dataclasses.is_dataclass(cur) and isinstance(val, Mapping):
            kw[name] = _update_dataclass(cur, val)
        else:
            kw[name] = val
    return dataclasses.replace(dc, **kw)


# Reference YAML key -> our field name
_YAML_ALIASES = {
    "LOG": "log_level",
    "num_iter_outter": "num_iter_outer",
    "max_BA_frames": "max_ba_frames",
    "sigma_D": "sigma_d",
    "sigma_R": "sigma_r",
}


def load_config(path_or_dict, base: Optional[TrackerConfig] = None) -> TrackerConfig:
    """Load a TrackerConfig from a reference-format YAML file or a dict.

    Accepts the reference's YAML schema (config_ycbineoat.yml) so existing
    configs work unmodified; unknown keys (e.g. the dead `sift:` block,
    FeatureManager.cpp:84-120) are ignored.
    """
    base = base or TrackerConfig()
    if isinstance(path_or_dict, Mapping):
        data = dict(path_or_dict)
    else:
        import yaml

        with open(path_or_dict) as f:
            data = yaml.safe_load(f)
    return _update_dataclass(base, data)
