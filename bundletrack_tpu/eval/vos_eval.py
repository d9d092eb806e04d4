"""VOS propagation quality: mask IoU over a sequence.

The reference reports DAVIS J (region IoU) for its VOS subproject
(transductive-vos.pytorch/README.md:18-24); this is the same measure over a
sequence with ground-truth masks: initialize from frame 0's GT mask,
propagate through the remaining frames, score IoU per frame.
"""

from __future__ import annotations

import numpy as np


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(a, b).sum() / union)


def evaluate_vos(params, model, seg_cfg, seq, num_frames: int = 0,
                 history_cap: int | None = None):
    """Propagate seq.mask[0] through seq.gray frames; returns IoU stats.

    seq: SyntheticSequence-like (gray [F,H,W] in [0,1], mask [F,H,W] bool).
    For HardSequence inputs the EXACT silhouette (mask_gt) is used for both
    the init mask and the per-frame reference — the degraded mask simulates
    VOS failure modes and is not a propagation ground truth.
    Returns dict(mean_iou, min_iou, per_frame list).
    """
    from bundletrack_tpu.models.vos import VOSPropagator

    gt_mask = getattr(seq, "mask_gt", None)
    if gt_mask is not None:
        seq = seq._replace(mask=gt_mask)

    F, H, W = seq.gray.shape
    n = min(num_frames or F, F)
    if n < 2:
        raise ValueError(
            f"evaluate_vos needs >= 2 frames to propagate (got n={n}); "
            "frame 0 only seeds the history"
        )
    prop = VOSPropagator(params, model, seg_cfg, H, W, history_cap=history_cap)
    rgb = lambda f: np.repeat(seq.gray[f][..., None], 3, axis=-1)
    prop.first_frame(rgb(0), np.asarray(seq.mask[0], bool))
    ious = []
    for f in range(1, n):
        pred = prop.propagate(rgb(f))
        ious.append(mask_iou(pred, seq.mask[f]))
    return {
        "mean_iou": float(np.mean(ious)),
        "min_iou": float(np.min(ious)),
        "per_frame": ious,
    }
