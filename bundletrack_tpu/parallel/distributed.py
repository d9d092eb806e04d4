"""Multi-host runtime: jax.distributed init + global meshes.

The reference's only multi-node code is NCCL DDP in the VOS trainer
(reference: transductive-vos.pytorch/main.py:9,62); the tracker itself is
single-process.  Here the whole framework scales multi-host with JAX's
multi-controller runtime: every host runs the same program, jax.distributed
wires the cluster, and meshes span hosts so XLA routes collectives over ICI
within a slice and DCN across slices.

Stream-parallel tracking needs NO cross-host communication (each stream's
state lives on one chip), so fleet scaling across hosts is linear by
construction; only training (dp gradients) and any cross-stream reductions
ride the network.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-controller runtime (no-op in single-process).

    On TPU pods, jax.distributed.initialize() autodetects everything from
    the TPU environment; arguments are for manual/CPU clusters.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_fleet_mesh(streams_per_chip: int = 1) -> Mesh:
    """1D mesh over every chip in the cluster for stream-parallel fleets."""
    devices = np.asarray(jax.devices())
    return Mesh(devices, ("stream",))


def global_train_mesh(model_parallel: int = 1) -> Mesh:
    """(data, model) mesh: `model_parallel` chips per model shard, laid out
    so model groups stay within a host (ICI) and data parallelism spans
    hosts (DCN-tolerant gradient reductions)."""
    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % model_parallel == 0, (n, model_parallel)
    return Mesh(devices.reshape(n // model_parallel, model_parallel), ("data", "model"))


def local_stream_slice(num_streams: int) -> slice:
    """The global stream indices owned by this process (for data feeding)."""
    per = num_streams // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
