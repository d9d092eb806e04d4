from bundletrack_tpu.frontend.lfnet import LFNet, MSODetector, SimpleDesc, init_lfnet
from bundletrack_tpu.models.lfnet_train import (
    lfnet_loss,
    make_lfnet_train_step,
    LFNetTrainBatch,
)
from bundletrack_tpu.models.vos_train import (
    VOSTrainBatch,
    make_vos_train_step,
    vos_loss,
)

__all__ = [
    "VOSTrainBatch",
    "make_vos_train_step",
    "vos_loss",
    "LFNet",
    "MSODetector",
    "SimpleDesc",
    "init_lfnet",
    "lfnet_loss",
    "make_lfnet_train_step",
    "LFNetTrainBatch",
]
