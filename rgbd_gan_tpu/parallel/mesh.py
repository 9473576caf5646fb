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
    """Multi-host bring-up: call once per process BEFORE touching devices.

    The TPU twin of the reference's MPI communicator creation
    (``train_rgbd.py:103-119``). Must run before any backend touch —
    ``jax.device_count()``/``jax.devices()`` lock in the single-process
    backend, after which initialize() is too late. Only attempts bring-up
    when a multi-process environment is actually configured (explicit
    coordinator address or a recognised cluster environment); a plain
    single-host run stays a no-op so the local/tunnel paths never block
    waiting for a coordinator that will not appear.
    """
    if jax.distributed.is_initialized():
        return
    import os

    multi_host = any(
        os.environ.get(h)
        for h in (
            "JAX_COORDINATOR_ADDRESS",      # explicit jax.distributed coordinator
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",  # multi-slice
        )
    )
    # Cloud TPU pod slice: only a hint when it actually lists >1 worker
    # (single-host environments — including the axon tunnel — set it to one)
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_host = multi_host or len([w for w in workers.split(",") if w.strip()]) > 1
    if not multi_host:
        return  # single-host: nothing to bring up
    try:
        jax.distributed.initialize()
    except ValueError as e:
        # auto-detection found no coordinator after all (e.g. a stale pod
        # env var on a single host) — proceed single-process
        if "coordinator_address" not in str(e):
            raise


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
        # replication is CHECKED (check_vma defaults on): the step must
        # return genuinely replicated state/metrics — grads/metrics pmean'd,
        # the NaN flag pmax'd, deepvoxels batch_stats pmean'd (sync-BN)
        out_specs=(P(), P()),
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_windowed_step(wstep: Callable, mesh: Mesh) -> Callable:
    """Like :func:`shard_train_step` for a windowed step
    (``train.steps.make_windowed_step``): the batch window (K, B, ...) is
    sharded along its *batch* axis, the stacked keys/alphas replicated."""
    sharded = jax.shard_map(
        wstep,
        mesh=mesh,
        in_specs=(P(), P(None, DATA_AXIS), P(), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded, donate_argnums=(0,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Shard a host batch along its batch axis across the mesh.

    ``batch_axis=1`` for (K, B, ...) step windows. Single-host: a plain
    sharded ``device_put``. Multi-host: each process holds only its local
    slice of the global batch, so the global array must be assembled with
    ``make_array_from_process_local_data`` (``device_put`` cannot build a
    global array from per-host shards).
    """
    spec = [None] * batch_axis + [DATA_AXIS]
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(batch))
    return jax.device_put(batch, sharding)
