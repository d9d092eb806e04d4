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
    "add_error",
    "adi_error",
    "vocap_auc",
    "add_auc",
    "adds_auc",
    "pose_errors",
    "five_deg_five_cm",
]
