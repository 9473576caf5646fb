"""VMEM-resident Pallas trilinear lift vs the XLA gather lift (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.geometry.camera import camera_matrices
from rgbd_gan_tpu.models.deepvoxels import (
    GRID_DIM,
    frustum_camera_coords,
    lift_frustum,
)
from rgbd_gan_tpu.ops.trilinear_pallas import trilinear_lift_pallas

VOXEL_SIZE_LOCAL = None  # constants come from the deepvoxels module


def _corner_inputs(cam2world, coords_const):
    from rgbd_gan_tpu.models.deepvoxels import VOXEL_SIZE

    grid_coords = jnp.einsum("bij,jn->bin", cam2world, coords_const)
    vox = grid_coords[:, :3] / VOXEL_SIZE + GRID_DIM / 2
    in_bounds = jnp.all(vox >= 0, axis=1) & jnp.all(vox < GRID_DIM, axis=1)
    return vox, in_bounds


class TestTrilinearPallas:
    @pytest.mark.parametrize("theta_y", [0.0, 0.9, 2.4])
    def test_matches_gather_lift(self, theta_y):
        rng = np.random.RandomState(0)
        b, c = 2, 4
        voxel = jnp.asarray(rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f"))
        mats = camera_matrices(jnp.zeros((b, 6)).at[:, 1].set(theta_y))
        coords = jnp.asarray(frustum_camera_coords())

        ref = lift_frustum(voxel, mats, coords)  # (B, D, H, W, C)
        n = coords.shape[1]
        vox, ib = _corner_inputs(mats, coords)
        # subsample a tile-aligned prefix to keep interpret mode fast
        n_sub = 128 * 16
        ours = trilinear_lift_pallas(
            voxel, vox[:, :, :n_sub], ib[:, :n_sub], interpret=True
        )
        ref_flat = ref.reshape(b, n, c)[:, :n_sub]
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref_flat), atol=2e-5)

    def test_out_of_bounds_zero(self):
        rng = np.random.RandomState(1)
        voxel = jnp.asarray(rng.rand(1, GRID_DIM, GRID_DIM, GRID_DIM, 2).astype("f"))
        # all points far outside the grid
        vox = jnp.full((1, 3, 128), -7.0)
        ib = jnp.zeros((1, 128), bool)
        out = trilinear_lift_pallas(voxel, vox, ib, interpret=True)
        np.testing.assert_allclose(np.asarray(out), 0.0)
