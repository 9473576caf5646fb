"""Numpy transcription of the reference DeepVoxels projection vs dense lift.

The reference builds *variable-length* in-bounds index lists per camera
(``deepvoxel/projection.py:48-105``) and scatter-adds trilinear gathers into
a dense frustum (``deepvoxel/deepvoxel.py:388-428``). Our TPU-first rewrite
(`models/deepvoxels.lift_frustum`) is a fixed-shape masked dense gather.
This transcription reproduces the reference's exact index/scatter algorithm
in numpy (including the float-division y quirk and the asymmetric corner
clamping) and checks the dense version produces the identical frustum.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.geometry.camera import camera_matrices_np
from rgbd_gan_tpu.models.deepvoxels import (
    FRUSTUM_DEPTH,
    GRID_DIM,
    NEAR_PLANE,
    PROJ_DIM,
    VOXEL_SIZE,
    frustum_camera_coords,
    lift_frustum,
)


def np_compute_proj_idcs(cam2world):
    """projection.py:48-105 transcription (single camera)."""
    w_img, h_img = PROJ_DIM, PROJ_DIM
    num = w_img * h_img * FRUSTUM_DEPTH
    lin_ind = np.arange(num).astype("int32")
    coords = np.zeros((4, num), dtype="float32")
    coords[2] = lin_ind // (w_img * h_img)
    tmp = lin_ind - (coords[2] * w_img * h_img).astype("int32")
    coords[1] = tmp / w_img  # float division quirk
    coords[0] = tmp % w_img
    coords[3].fill(1)
    coords[2] *= VOXEL_SIZE
    coords[2] += NEAR_PLANE
    focal, center = PROJ_DIM * 2.0, float(GRID_DIM)
    coords[0] = (coords[0] - center) / focal
    coords[1] = (coords[1] - center) / focal
    coords[:2] *= coords[2]
    grid_coords = np.dot(cam2world, coords)
    voxel_coords = grid_coords[:3, :] / VOXEL_SIZE + GRID_DIM / 2
    mask = np.all(voxel_coords >= 0, axis=0)
    mask = (
        mask
        * (voxel_coords[0] < GRID_DIM)
        * (voxel_coords[1] < GRID_DIM)
        * (voxel_coords[2] < GRID_DIM)
    )
    return lin_ind[mask], voxel_coords[:, mask]


def np_interpolate_trilinear(grid_ncdhw, lin_ind, voxel_coords):
    """deepvoxel.py:388-428 transcription (single item, scatter-add)."""
    _, num_feats, height, width, depth = grid_ncdhw.shape
    x_idx, y_idx, z_idx = voxel_coords[2], voxel_coords[1], voxel_coords[0]
    x0 = x_idx.astype("int32")
    y0 = y_idx.astype("int32")
    z0 = z_idx.astype("int32")
    x1 = np.clip(x0 + 1, 0, width - 1)
    y1 = np.clip(y0 + 1, 0, height - 1)
    z1 = np.clip(z0 + 1, 0, depth - 1)
    x = x_idx - x0
    y = y_idx - y0
    z = z_idx - z0
    g = grid_ncdhw[0]
    added = (
        g[:, x0, y0, z0] * (1 - x) * (1 - y) * (1 - z)
        + g[:, x1, y0, z0] * x * (1 - y) * (1 - z)
        + g[:, x0, y1, z0] * (1 - x) * y * (1 - z)
        + g[:, x0, y0, z1] * (1 - x) * (1 - y) * z
        + g[:, x1, y0, z1] * x * (1 - y) * z
        + g[:, x0, y1, z1] * (1 - x) * y * z
        + g[:, x1, y1, z0] * x * y * (1 - z)
        + g[:, x1, y1, z1] * x * y * z
    )
    out = np.zeros((num_feats, PROJ_DIM * PROJ_DIM * FRUSTUM_DEPTH), dtype="float32")
    out[:, lin_ind] += added  # scatter (indices unique per camera)
    return out.reshape(num_feats, FRUSTUM_DEPTH, PROJ_DIM, PROJ_DIM)


@pytest.mark.parametrize("theta", [
    np.zeros(6, "float32"),
    np.array([0.2, 0.8, 0.0, 0.0, 0.0, 0.0], "float32"),
    np.array([-0.3, 2.5, 0.1, 0.05, -0.05, 0.1], "float32"),
])
def test_dense_lift_matches_reference_index_scatter(theta):
    rng = np.random.RandomState(0)
    c = 4
    voxel = rng.rand(1, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("float32")
    cam2world = camera_matrices_np(theta[None])[0]

    # reference algorithm
    lin_ind, vox_coords = np_compute_proj_idcs(cam2world)
    assert len(lin_ind) > 0
    grid_ncdhw = voxel.transpose(0, 4, 1, 2, 3)  # NDHWC -> NCDHW like chainer
    ref = np_interpolate_trilinear(grid_ncdhw, lin_ind, vox_coords)
    ref = ref.transpose(1, 2, 3, 0)  # -> (D, H, W, C)

    # dense TPU-first version
    coords_const = jnp.asarray(frustum_camera_coords(exact_lifting=True))
    ours = np.asarray(
        lift_frustum(jnp.asarray(voxel), jnp.asarray(cam2world[None]), coords_const)
    )[0]

    np.testing.assert_allclose(ours, ref, atol=2e-5)
    # sanity: out-of-bounds cells are zero in both
    occupancy = (np.abs(ref).sum(-1) > 0).mean()
    assert 0.0 < occupancy <= 1.0
