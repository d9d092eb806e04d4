"""Fleet tracking and sharded training over TPU device meshes.

The reference is a single-GPU, single-stream system (SURVEY.md section 2.6);
its only distributed code is NCCL DDP in the VOS trainer.  The TPU framework's
scale-out axis is *streams*: S independent tracked objects/sequences batch
into one program (vmap over the TrackerState pytree) and shard across chips
with jax.sharding — data parallelism over streams rides ICI with zero
cross-stream communication, so scaling is embarrassingly linear; the LF-Net
training step shards batch over a "data" axis and the descriptor MLP over a
"model" axis (tensor parallelism), letting XLA insert the all-gathers /
reduce-scatters.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bundletrack_tpu.config import TrackerConfig
from bundletrack_tpu.tracker.bundler import make_track_frame
from bundletrack_tpu.tracker.state import FrameObservation, init_tracker_state


def make_mesh(axis_sizes: dict, devices=None) -> Mesh:
    """Create a named mesh, e.g. make_mesh({"stream": 8})."""
    devices = devices if devices is not None else jax.devices()
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    dev = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev, names)


def init_fleet_state(cfg: TrackerConfig, H: int, W: int, num_streams: int, seed=0):
    """Stacked TrackerState with a leading stream axis."""
    base = init_tracker_state(cfg, H, W, seed)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_streams)

    def tile(x):
        return jnp.broadcast_to(x[None], (num_streams,) + x.shape).copy()

    state = jax.tree.map(tile, base)
    return state._replace(rng_key=keys)


def make_fleet_step(
    cfg: TrackerConfig,
    H: int,
    W: int,
    mesh: Optional[Mesh] = None,
    stream_axis: str = "stream",
    lfnet_apply=None,
):
    """Jitted multi-stream step: (state[S], obs[S], init_pose[S]) -> (state, out).

    With a mesh, every leading-stream axis is sharded over `stream_axis`;
    without one, it is a plain vmapped step on the local device.  When
    cfg.bundle.ba_mesh_axis names another axis of the same mesh, each
    stream's BA pair work additionally shards over that axis (streams x
    pairs 2D parallelism): vmap(spmd_axis_name=stream_axis) threads the
    stream axis through the inner pair shard_map so both axes stay sharded.
    """
    pair_axis = cfg.bundle.ba_mesh_axis or None
    use_pairs = (
        mesh is not None
        and pair_axis is not None
        and pair_axis in mesh.axis_names
    )
    if use_pairs:
        single = make_track_frame(
            cfg, H, W, lfnet_apply, mesh=mesh, pair_axis=pair_axis
        )
        batched = jax.vmap(single, spmd_axis_name=stream_axis)
    else:
        single = make_track_frame(cfg, H, W, lfnet_apply)
        batched = jax.vmap(single)

    if mesh is None:
        return jax.jit(batched, donate_argnums=(0,))

    shard = NamedSharding(mesh, P(stream_axis))

    def with_sharding(tree):
        return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, shard), tree)

    def step(state, obs, init_pose):
        state = with_sharding(state)
        obs = with_sharding(obs)
        init_pose = jax.lax.with_sharding_constraint(init_pose, shard)
        new_state, out = batched(state, obs, init_pose)
        return with_sharding(new_state), with_sharding(out)

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Sharded LF-Net training (dp over batch x tp over the descriptor MLP)
# ---------------------------------------------------------------------------


def _lfnet_param_spec(path_tuple, leaf, model_axis: str):
    """Partition rule: shard the big descriptor Dense kernels over the model
    axis; replicate everything else (conv kernels here are small)."""
    names = [getattr(k, "key", str(k)) for k in path_tuple]
    joined = "/".join(names)
    if "descriptor" in joined and "fc1" in joined and "kernel" in joined:
        return P(None, model_axis)  # column-parallel
    if "descriptor" in joined and "fc2" in joined and "kernel" in joined:
        return P(model_axis, None)  # row-parallel
    return P()


def make_sharded_lfnet_train_step(
    model,
    tx,
    params,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Returns (step, sharded_params, opt_state) with dp+tp shardings.

    Batch shards over `data_axis`; the descriptor MLP's fc1/fc2 kernels shard
    over `model_axis` (column/row parallel — XLA inserts the reduce at fc2).
    """
    from bundletrack_tpu.models.lfnet_train import make_lfnet_train_step

    spec_tree = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _lfnet_param_spec(path, leaf, model_axis)),
        params,
    )
    params = jax.device_put(params, spec_tree)
    opt_state = tx.init(params)

    base_step = make_lfnet_train_step(model, tx)
    batch_shard = NamedSharding(mesh, P(data_axis))

    def step(params, opt_state, batch):
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_shard), batch
        )
        return base_step(params, opt_state, batch)

    return jax.jit(step, donate_argnums=(1,)), params, opt_state


# ---------------------------------------------------------------------------
# Sharded VOS training (dp over the clip batch — the reference's DDP analog,
# transductive-vos.pytorch/main.py:57-135)
# ---------------------------------------------------------------------------


def make_sharded_vos_train_step(
    model,
    tx,
    params,
    mesh: Mesh,
    image_hw,
    data_axis: str = "data",
    **train_kw,
):
    """Returns (step, sharded_params, opt_state) with data-parallel sharding.

    Parameters are replicated; the clip batch shards over `data_axis`, and
    XLA all-reduces the gradients over ICI — the jax.sharding equivalent of
    the reference's NCCL DDP.
    """
    from bundletrack_tpu.models.vos_train import make_vos_train_step

    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    opt_state = tx.init(params)

    base_step = make_vos_train_step(model, tx, image_hw, **train_kw)
    batch_shard = NamedSharding(mesh, P(data_axis))

    def step(params, opt_state, batch):
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_shard), batch
        )
        return base_step(params, opt_state, batch)

    return jax.jit(step, donate_argnums=(1,)), params, opt_state
