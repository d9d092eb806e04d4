from bundletrack_tpu.frontend.lfnet import LFNet, MSODetector, SimpleDesc, init_lfnet
from bundletrack_tpu.models.lfnet_train import (
    lfnet_loss,
    make_lfnet_train_step,
    LFNetTrainBatch,
)

__all__ = [
    "LFNet",
    "MSODetector",
    "SimpleDesc",
    "init_lfnet",
    "lfnet_loss",
    "make_lfnet_train_step",
    "LFNetTrainBatch",
]
