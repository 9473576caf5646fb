"""Device mesh + data-parallel sharding over ICI (the NCCL/MPI replacement).

The reference's distribution layer is ChainerMN: ``pure_nccl`` communicator,
gradient all-reduce hidden inside the multi-node optimizer, master-rank-only
I/O (``train_rgbd.py:103-161``). The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over all devices with the train step wrapped in
``shard_map``: each device runs the *per-device* step (its own latent/pose
draws from a folded key, exactly like per-rank sampling in the reference)
and gradients are ``lax.pmean``-ed over the ``data`` axis — XLA lowers that
to an ICI all-reduce fused into the backward pass.

Multi-host: ``jax.distributed.initialize()`` + ``jax.process_index() == 0``
replaces ``comm.rank == 0`` for master-only I/O.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_initialize_distributed() -> None:
    """Multi-host bring-up: call once per process before touching devices.

    The TPU twin of the reference's MPI communicator creation
    (``train_rgbd.py:103-119``). No-ops on a single host or when already
    initialised; coordinator discovery uses the standard TPU environment.
    """
    if jax.process_count() > 1:
        return  # already initialised
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-host / no coordinator configured


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (DATA_AXIS,))


def is_master() -> bool:
    """Master-process predicate for I/O (``train_rgbd.py:121``)."""
    return jax.process_index() == 0


def shard_train_step(step: Callable, mesh: Mesh) -> Callable:
    """Wrap a per-device train step for the mesh.

    ``step`` must already carry ``axis_name=DATA_AXIS`` in its StepSpec (it
    folds the axis index into its RNG key and pmean-s grads/metrics).
    Returns a jitted function with state replicated, the real batch sharded
    along its leading axis, and (alpha, key) replicated.
    """
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Shard a host batch along its leading axis across the mesh."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(batch, sharding)
