from bundletrack_tpu.eval.frontend_eval import evaluate_frontend, make_feature_fn
from bundletrack_tpu.eval.vos_eval import evaluate_vos, mask_iou
from bundletrack_tpu.eval.metrics import (
    add_error,
    adi_error,
    vocap_auc,
    add_auc,
    adds_auc,
    pose_errors,
    five_deg_five_cm,
)

__all__ = [
    "evaluate_frontend",
    "evaluate_vos",
    "mask_iou",
    "make_feature_fn",
    "add_error",
    "adi_error",
    "vocap_auc",
    "add_auc",
    "adds_auc",
    "pose_errors",
    "five_deg_five_cm",
]
