"""Independent numpy transcription of the reference loss math vs our JAX.

Chainer/CuPy are not installed in this image, so the reference cannot be
executed directly. This is the next-strongest parity evidence: the exact
equations of ``common/loss_functions.py`` re-derived here in *pure numpy*
(independently of rgbd_gan_tpu's implementation, NCHW like the reference)
and compared against :mod:`rgbd_gan_tpu.geometry.warp` on random inputs.
Any semantic drift in the JAX port shows up as a mismatch here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.geometry.camera import camera_matrices_np
from rgbd_gan_tpu.geometry.warp import rotate_consistency_loss


def np_reference_loss(img_nchw, mat1, img_rot_nchw, mat2, occlusion_aware=False,
                      lambda_geometric=3.0, max_depth=None, min_depth=None):
    """LossFuncRotate re-derived from loss_functions.py:31-228 in numpy."""
    b, c, h, w = img_nchw.shape
    size = w

    # init_params (:39-61)
    K = np.array([[size * 2, 0, size / 2], [0, size * 2, size / 2], [0, 0, 1]], "float32")
    inv_K = np.linalg.inv(K).astype("float32")
    xg, yg = np.meshgrid(np.arange(size), np.arange(size))
    p = np.stack([xg, yg, np.ones((size, size))]).astype("float32").reshape(3, -1)

    z = img_nchw[:, -1:].reshape(b, 1, -1)
    z_rot = img_rot_nchw[:, -1:].reshape(b, 1, -1)

    # relative pose (:85-91)
    R1, R2 = mat1[:, :3, :3], mat2[:, :3, :3]
    t1, t2 = mat1[:, :3, -1:], mat2[:, :3, -1:]
    R = np.matmul(R2.transpose(0, 2, 1), R1).astype("float32")
    inv_R = R.transpose(0, 2, 1)
    t = np.matmul(R1.transpose(0, 2, 1), t2 - t1).astype("float32")

    # warps (:171-182): forward subtracts K R t; inverse adds K t
    new_zp = (
        np.matmul(np.matmul(np.matmul(K, R), inv_K), z * p)
        - np.matmul(np.matmul(K, R), t)
    ).transpose(0, 2, 1)
    new_zp_rot = (
        np.matmul(np.matmul(np.matmul(K, inv_R), inv_K), z_rot * p) + np.matmul(K, t)
    ).transpose(0, 2, 1)

    # bilinear (:185-228) — including the u1=u0 quirk
    def bilinear(img, zp):
        zp = zp.reshape(-1, 3)
        u = zp[:, 0] / np.clip(zp[:, 2], 1e-4, 10000)
        v = zp[:, 1] / np.clip(zp[:, 2], 1e-4, 10000)
        v, u = u, v
        u0 = u.astype("int32")
        u1 = u0 + 1
        v0 = v.astype("int32")
        v1 = v0 + 1
        w1 = (u1 - u) * (v1 - v)
        w2 = (u - u0) * (v1 - v)
        w3 = (u1 - u) * (v - v0)
        w4 = (u - u0) * (v - v0)
        coord = np.arange(b * h * w) // (h * w)
        not_out = ((u >= 0) * (u < h - 1) * (v >= 0) * (v < w - 1) * (zp[:, 2] > 1e-4))
        u0 = u0 * not_out
        u1 = u0 * not_out  # the reference's overwrite (loss_functions.py:219)
        v0 = v0 * not_out
        v1 = v1 * not_out
        w1, w2, w3, w4 = (wi * not_out for wi in (w1, w2, w3, w4))
        warped = (
            w1[:, None] * img[coord, :, u0, v0] + w2[:, None] * img[coord, :, u1, v0]
            + w3[:, None] * img[coord, :, u0, v1] + w4[:, None] * img[coord, :, u1, v1]
        )
        return warped, not_out

    warped, not_out = bilinear(img_rot_nchw, new_zp)
    warped_rot, not_out_rot = bilinear(img_nchw, new_zp_rot)

    warped_target = np.concatenate(
        [img_nchw[:, :-1].transpose(0, 2, 3, 1).reshape(-1, c - 1),
         new_zp[:, :, 2].reshape(-1, 1)], axis=1,
    ) * not_out[:, None]
    warped_rot_target = np.concatenate(
        [img_rot_nchw[:, :-1].transpose(0, 2, 3, 1).reshape(-1, c - 1),
         new_zp_rot[:, :, 2].reshape(-1, 1)], axis=1,
    ) * not_out_rot[:, None]

    if occlusion_aware:
        no = warped[:, -1:] > new_zp[:, :, 2].reshape(-1, 1)
        no_r = warped_rot[:, -1:] > new_zp_rot[:, :, 2].reshape(-1, 1)
        warped, warped_target = warped * no, warped_target * no
        warped_rot, warped_rot_target = warped_rot * no_r, warped_rot_target * no_r

    if max_depth is not None:
        sd = z.transpose(0, 2, 1).reshape(-1, 1) < max_depth
        sd_r = z_rot.transpose(0, 2, 1).reshape(-1, 1) < max_depth
        warped, warped_target = warped * sd, warped_target * sd
        warped_rot, warped_rot_target = warped_rot * sd_r, warped_rot_target * sd_r
    if min_depth is not None:
        ld = z.transpose(0, 2, 1).reshape(-1, 1) > min_depth
        ld_r = z_rot.transpose(0, 2, 1).reshape(-1, 1) > min_depth
        warped, warped_target = warped * ld, warped_target * ld
        warped_rot, warped_rot_target = warped_rot * ld_r, warped_rot_target * ld_r

    mae = lambda a, bb: np.abs(a - bb).mean()
    loss = mae(warped[:, :-1], warped_target[:, :-1]) + mae(
        warped_rot[:, :-1], warped_rot_target[:, :-1]
    )
    loss += mae(warped[:, -1], warped_target[:, -1]) * lambda_geometric + mae(
        warped_rot[:, -1], warped_rot_target[:, -1]
    ) * lambda_geometric
    return loss


@pytest.mark.parametrize(
    "occl,maxd,mind",
    [(False, None, None), (True, None, None), (False, 1.4, None), (False, None, 0.9),
     (True, 1.4, 0.9)],
)
def test_rotate_loss_matches_numpy_transcription(occl, maxd, mind):
    rng = np.random.RandomState(42)
    b, size = 4, 8
    rgb = rng.uniform(-1, 1, (b, 3, size, size)).astype("float32")
    depth = rng.uniform(0.8, 1.6, (b, 1, size, size)).astype("float32")
    img_nchw = np.concatenate([rgb, depth], axis=1)
    rgb2 = rng.uniform(-1, 1, (b, 3, size, size)).astype("float32")
    depth2 = rng.uniform(0.8, 1.6, (b, 1, size, size)).astype("float32")
    img2_nchw = np.concatenate([rgb2, depth2], axis=1)

    thetas1 = rng.uniform(-0.25, 0.25, (b, 6)).astype("float32")
    thetas2 = (thetas1 + rng.uniform(-0.1, 0.1, (b, 6))).astype("float32")
    m1 = camera_matrices_np(thetas1)
    m2 = camera_matrices_np(thetas2)

    ref = np_reference_loss(
        img_nchw, m1, img2_nchw, m2, occlusion_aware=occl,
        lambda_geometric=2.0, max_depth=maxd, min_depth=mind,
    )

    ours, _ = rotate_consistency_loss(
        jnp.asarray(img_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(m1),
        jnp.asarray(img2_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(m2),
        occlusion_aware=occl,
        lambda_geometric=2.0,
        max_depth=maxd,
        min_depth=mind,
    )
    assert float(ours) == pytest.approx(float(ref), rel=1e-4), (float(ours), float(ref))


def test_onehot_route_matches_numpy_transcription():
    rng = np.random.RandomState(7)
    b, size = 2, 8
    img_nchw = np.concatenate(
        [rng.uniform(-1, 1, (b, 3, size, size)), rng.uniform(0.8, 1.6, (b, 1, size, size))],
        axis=1,
    ).astype("float32")
    img2_nchw = np.concatenate(
        [rng.uniform(-1, 1, (b, 3, size, size)), rng.uniform(0.8, 1.6, (b, 1, size, size))],
        axis=1,
    ).astype("float32")
    t1 = rng.uniform(-0.2, 0.2, (b, 6)).astype("float32")
    t2 = (t1 + 0.05).astype("float32")
    m1, m2 = camera_matrices_np(t1), camera_matrices_np(t2)
    ref = np_reference_loss(img_nchw, m1, img2_nchw, m2, occlusion_aware=True)
    ours, _ = rotate_consistency_loss(
        jnp.asarray(img_nchw.transpose(0, 2, 3, 1)), jnp.asarray(m1),
        jnp.asarray(img2_nchw.transpose(0, 2, 3, 1)), jnp.asarray(m2),
        occlusion_aware=True, gather_mode="onehot",
    )
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)
