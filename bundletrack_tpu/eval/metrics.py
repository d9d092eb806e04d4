"""Pose accuracy metrics: ADD / ADD-S, VOCap AUC, 5deg5cm.

Faithful numpy ports of the reference's evaluation protocol so results are
directly comparable (reference: scripts/Utils.py:69-95 add/adi,
scripts/eval_ycbineoat.py:54-83 VOCap with 0.1 m cutoff x100,
scripts/benchmark.py:296-320 NOCS 5deg5cm / IoU / rot / trans errors).
Evaluation is host-side (numpy + KDTree) — it is not on the tracking hot
path.
"""

from __future__ import annotations

import numpy as np
from scipy import spatial
from scipy.spatial.transform import Rotation


def _transform(pose: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ pose[:3, :3].T + pose[:3, 3]


def add_error(pred: np.ndarray, gt: np.ndarray, model_pts: np.ndarray) -> float:
    """Average Distance of Model points (non-symmetric objects)."""
    return float(
        np.linalg.norm(_transform(pred, model_pts) - _transform(gt, model_pts), axis=1).mean()
    )


def adi_error(pred: np.ndarray, gt: np.ndarray, model_pts: np.ndarray) -> float:
    """ADD-S: nearest-neighbor average distance (symmetric objects)."""
    p = _transform(pred, model_pts)
    g = _transform(gt, model_pts)
    nn = spatial.cKDTree(p)
    dists, _ = nn.query(g, k=1)
    return float(dists.mean())


def vocap_auc(errors, max_val: float = 0.1) -> float:
    """AUC of the error-threshold curve, x100 (reference VOCap,
    eval_ycbineoat.py:54-83)."""
    rec = np.sort(np.asarray(errors, dtype=np.float64))
    n = len(rec)
    if n == 0:
        return 0.0
    prec = np.arange(1, n + 1) / float(n)
    idx = np.where(rec < max_val)[0]
    if len(idx) == 0:
        return 0.0
    rec = rec[idx]
    prec = prec[idx]
    mrec = np.concatenate([[0], rec, [max_val]])
    mpre = np.concatenate([[0], prec, [prec[-1]]])
    for i in range(1, len(mpre)):
        mpre[i] = max(mpre[i], mpre[i - 1])
    i = np.where(mrec[1:] != mrec[:-1])[0] + 1
    ap = np.sum((mrec[i] - mrec[i - 1]) * mpre[i]) * (1.0 / max_val)
    return float(ap * 100.0)


def add_auc(preds, gts, model_pts, max_val: float = 0.1) -> float:
    errs = [add_error(p, g, model_pts) for p, g in zip(preds, gts)]
    return vocap_auc(errs, max_val)


def adds_auc(preds, gts, model_pts, max_val: float = 0.1) -> float:
    errs = [adi_error(p, g, model_pts) for p, g in zip(preds, gts)]
    return vocap_auc(errs, max_val)


def pose_errors(pred: np.ndarray, gt: np.ndarray):
    """(rotation error deg, translation error m)."""
    rot = Rotation.from_matrix(pred[:3, :3] @ gt[:3, :3].T).magnitude()
    trans = np.linalg.norm(pred[:3, 3] - gt[:3, 3])
    return float(np.rad2deg(rot)), float(trans)


def five_deg_five_cm(preds, gts) -> float:
    """Fraction (%) of frames within 5 degrees and 5 cm (NOCS protocol,
    reference benchmark.py:296-320)."""
    ok = 0
    for p, g in zip(preds, gts):
        r, t = pose_errors(p, g)
        ok += int(r <= 5.0 and t <= 0.05)
    return 100.0 * ok / max(len(list(preds)), 1)
