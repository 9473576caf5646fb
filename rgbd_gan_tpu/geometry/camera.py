"""6-DoF camera parameters -> 4x4 cam2world matrices (pure JAX + numpy twins).

Semantics match the reference builder (``updater.py:26-60``, duplicated in
``updater_deepvoxels.py:29-63``): start from ``diag(1, 1, -1, 1)`` with
``mat[2, 3] = 1`` (camera at z=1 looking at the origin with a flipped z
axis), left-multiply axis rotations in ``order`` where rotation ``i`` acts in
the (``(i+1)%3``, ``(i+2)%3``) plane, then add the translation to the last
column. The reference computes this per iteration on the host CPU; here it is
a jit-able batched function so the whole train step stays on device.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _rotation_batch_np(theta: np.ndarray, axis1: int, axis2: int) -> np.ndarray:
    rot = np.zeros((theta.shape[0], 4, 4), dtype=theta.dtype)
    rot[:, range(4), range(4)] = 1
    c, s = np.cos(theta), np.sin(theta)
    rot[:, axis1, axis1] = c
    rot[:, axis1, axis2] = -s
    rot[:, axis2, axis1] = s
    rot[:, axis2, axis2] = c
    return rot


def camera_matrices_np(thetas: np.ndarray, order: Sequence[int] = (0, 1, 2)) -> np.ndarray:
    """Numpy twin of :func:`camera_matrices` (for host-side tests/previews)."""
    thetas = np.asarray(thetas, dtype="float32")
    b = thetas.shape[0]
    mat = np.zeros((b, 4, 4), dtype="float32")
    mat[:, range(4), range(4)] = [1, 1, -1, 1]
    mat[:, 2, 3] = 1
    for i in order:
        rot = _rotation_batch_np(thetas[:, i], (i + 1) % 3, (i + 2) % 3)
        mat = np.matmul(rot, mat)
    mat[:, :3, 3] = mat[:, :3, 3] + thetas[:, 3:]
    return mat


def _rotation_batch(theta: jnp.ndarray, axis1: int, axis2: int) -> jnp.ndarray:
    b = theta.shape[0]
    rot = jnp.broadcast_to(jnp.eye(4, dtype=theta.dtype), (b, 4, 4))
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = rot.at[:, axis1, axis1].set(c)
    rot = rot.at[:, axis1, axis2].set(-s)
    rot = rot.at[:, axis2, axis1].set(s)
    rot = rot.at[:, axis2, axis2].set(c)
    return rot


def camera_matrices(thetas: jnp.ndarray, order: Tuple[int, ...] = (0, 1, 2)) -> jnp.ndarray:
    """Batched 6-DoF ``[rx, ry, rz, tx, ty, tz]`` -> 4x4 cam2world matrices."""
    thetas = thetas.astype(jnp.float32)
    b = thetas.shape[0]
    mat = jnp.zeros((b, 4, 4), dtype=jnp.float32)
    mat = mat.at[:, jnp.arange(4), jnp.arange(4)].set(
        jnp.asarray([1.0, 1.0, -1.0, 1.0], dtype=jnp.float32)
    )
    mat = mat.at[:, 2, 3].set(1.0)
    for i in order:  # static unroll: 3 batched 4x4 matmuls
        rot = _rotation_batch(thetas[:, i], (i + 1) % 3, (i + 2) % 3)
        mat = jnp.matmul(rot, mat)
    mat = mat.at[:, :3, 3].add(thetas[:, 3:])
    return mat


def theta_to_9dof(thetas: jnp.ndarray) -> jnp.ndarray:
    """6-DoF params -> the 9-dim conditioning vector fed to the generators.

    ``[cos(rx), cos(ry), cos(rz), sin(rx), sin(ry), sin(rz), tx, ty, tz]``
    as built in the reference updater (``updater.py:317-318``).
    """
    return jnp.concatenate(
        [jnp.cos(thetas[:, :3]), jnp.sin(thetas[:, :3]), thetas[:, 3:]], axis=1
    )
