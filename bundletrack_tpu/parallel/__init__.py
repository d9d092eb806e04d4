from bundletrack_tpu.parallel.fleet import (
    make_fleet_step,
    init_fleet_state,
    make_mesh,
    make_sharded_lfnet_train_step,
    make_sharded_vos_train_step,
)

__all__ = [
    "make_fleet_step",
    "init_fleet_state",
    "make_mesh",
    "make_sharded_lfnet_train_step",
    "make_sharded_vos_train_step",
]
