import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.core import Config
from rgbd_gan_tpu.geometry import (
    CameraParamPrior,
    bilinear_sample,
    camera_matrices,
    camera_matrices_np,
    intrinsics,
    inv_warp,
    pixel_grid,
    relative_pose,
    rotate_consistency_loss,
    theta_to_9dof,
    warp,
)


class TestCameraMatrices:
    def test_identity_pose(self):
        m = camera_matrices_np(np.zeros((2, 6), dtype="float32"))
        expected = np.diag([1.0, 1.0, -1.0, 1.0]).astype("float32")
        expected[2, 3] = 1.0
        np.testing.assert_allclose(m[0], expected, atol=1e-6)

    def test_translation_added_to_last_column(self):
        t = np.zeros((1, 6), dtype="float32")
        t[0, 3:] = [0.1, 0.2, 0.3]
        m = camera_matrices_np(t)
        np.testing.assert_allclose(m[0, :3, 3], [0.1, 0.2, 1.3], atol=1e-6)

    def test_rotation_axes(self):
        # rotation 0 (x_rotate) acts in the (1,2)=(y,z) plane
        t = np.zeros((1, 6), dtype="float32")
        t[0, 0] = np.pi / 2
        m = camera_matrices_np(t)
        rot = m[0, :3, :3]
        # rot @ diag(1,1,-1): column space check — camera z column flipped then rotated
        base = np.diag([1.0, 1.0, -1.0])
        expected_rot = np.array(
            [[1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype="float32"
        ) @ base
        np.testing.assert_allclose(rot, expected_rot, atol=1e-6)

    def test_rotation_is_orthonormal(self):
        rng = np.random.RandomState(0)
        t = rng.uniform(-1, 1, size=(4, 6)).astype("float32")
        m = camera_matrices_np(t)
        r = m[:, :3, :3] @ np.diag([1.0, 1.0, -1.0])  # undo the base flip
        eye = np.einsum("bij,bkj->bik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)

    def test_jnp_matches_np(self):
        rng = np.random.RandomState(1)
        t = rng.uniform(-1, 1, size=(8, 6)).astype("float32")
        np.testing.assert_allclose(
            np.asarray(camera_matrices(jnp.asarray(t))), camera_matrices_np(t), atol=1e-5
        )

    def test_theta9(self):
        t = np.array([[0.1, 0.2, 0.3, 1.0, 2.0, 3.0]], dtype="float32")
        out = np.asarray(theta_to_9dof(jnp.asarray(t)))
        np.testing.assert_allclose(out[0, :3], np.cos(t[0, :3]), atol=1e-6)
        np.testing.assert_allclose(out[0, 3:6], np.sin(t[0, :3]), atol=1e-6)
        np.testing.assert_allclose(out[0, 6:], t[0, 3:], atol=1e-6)


class TestIntrinsicsAndGrid:
    def test_intrinsics_default(self):
        k = np.asarray(intrinsics(4))
        np.testing.assert_allclose(
            k, [[8, 0, 2], [0, 8, 2], [0, 0, 1]], atol=1e-6
        )

    def test_pixel_grid_order(self):
        p = np.asarray(pixel_grid(2))
        # row-major flatten; x (col) varies fastest
        np.testing.assert_allclose(p[0], [0, 1, 0, 1])
        np.testing.assert_allclose(p[1], [0, 0, 1, 1])
        np.testing.assert_allclose(p[2], [1, 1, 1, 1])


class TestWarps:
    def test_identity_warp_fixes_points(self):
        # R=I, t=0: new_zp = z*p exactly
        size = 4
        k = intrinsics(size)
        inv_k = jnp.linalg.inv(k)
        p = pixel_grid(size)
        r = jnp.eye(3)[None]
        t = jnp.zeros((1, 3, 1))
        z = jnp.full((1, 1, size * size), 2.0)
        out = warp(k, inv_k, r, t, z, p)
        np.testing.assert_allclose(np.asarray(out[0]).T, 2.0 * np.asarray(p), atol=1e-4)

    def test_inv_warp_inverts_warp(self):
        # composing warp with inv_warp at the warped depth recovers z*p
        size = 4
        k = intrinsics(size)
        inv_k = jnp.linalg.inv(k)
        p = pixel_grid(size)
        rng = np.random.RandomState(0)
        theta = rng.uniform(-0.2, 0.2, size=(1, 6)).astype("float32")
        m1 = camera_matrices(jnp.asarray(np.zeros((1, 6), "float32")))
        m2 = camera_matrices(jnp.asarray(theta))
        r, t = relative_pose(m1, m2)
        z = jnp.asarray(rng.uniform(0.5, 2.0, size=(1, 1, size * size)).astype("float32"))
        fwd = warp(k, inv_k, r, t, z, p)  # (1, HW, 3)
        # unproject fwd back: treat fwd rows as z'*p' and invert
        zp2 = jnp.transpose(fwd, (0, 2, 1))  # (1,3,HW)
        inv_r = jnp.transpose(r, (0, 2, 1))
        back = inv_warp(k, inv_k, inv_r, t, zp2[:, 2:3] * 0 + zp2 / 1.0 * 0 + zp2, p * 0 + 1)
        # direct algebra instead: K R^T K^-1 (fwd^T) + K t == z*p
        direct = jnp.matmul(jnp.matmul(jnp.matmul(k, inv_r), jnp.linalg.inv(k)), zp2) + jnp.matmul(
            k, t
        )
        np.testing.assert_allclose(
            np.asarray(direct[0]), np.asarray(z[0] * p), rtol=1e-3, atol=1e-3
        )


class TestBilinear:
    def _zp_for(self, coords_uv, depth=1.0):
        """Build zp rows = depth*(x, y, 1) for given (row, col) sample points."""
        pts = np.array(
            [[c * depth, r_ * depth, depth] for (r_, c) in coords_uv], dtype="float32"
        )
        return jnp.asarray(pts[None])

    def test_exact_integer_sample(self):
        img = jnp.asarray(np.arange(16, dtype="float32").reshape(1, 4, 4, 1))
        zp = self._zp_for([(1, 2)])  # row 1, col 2 -> value 6
        warped, mask = bilinear_sample(img, zp)
        assert float(mask[0]) == 1.0
        assert float(warped[0, 0]) == pytest.approx(6.0)

    def test_reference_quirk_nearest_in_u(self):
        # quirk: interpolation is truncation along u (rows), linear along v
        img = jnp.asarray(np.arange(16, dtype="float32").reshape(1, 4, 4, 1))
        zp = self._zp_for([(1.5, 2.0)])
        warped, _ = bilinear_sample(img, zp, exact=True)
        # exact mode: u truncated to 1 -> value img[1, 2] = 6
        assert float(warped[0, 0]) == pytest.approx(6.0)
        warped_fix, _ = bilinear_sample(img, zp, exact=False)
        # true bilinear: 0.5*img[1,2] + 0.5*img[2,2] = 0.5*6 + 0.5*10 = 8
        assert float(warped_fix[0, 0]) == pytest.approx(8.0)

    def test_linear_along_v(self):
        img = jnp.asarray(np.arange(16, dtype="float32").reshape(1, 4, 4, 1))
        zp = self._zp_for([(1.0, 1.5)])
        warped, _ = bilinear_sample(img, zp)
        # 0.5*img[1,1] + 0.5*img[1,2] = 0.5*5 + 0.5*6
        assert float(warped[0, 0]) == pytest.approx(5.5)

    def test_out_of_bounds_masked(self):
        img = jnp.ones((1, 4, 4, 1))
        zp = self._zp_for([(5.0, 1.0), (-1.0, 1.0), (3.0, 1.0), (1.0, 3.5)])
        warped, mask = bilinear_sample(img, zp)
        # u must be < h-1 (3.0 fails), v < w-1
        np.testing.assert_allclose(np.asarray(mask), [0, 0, 0, 0])
        np.testing.assert_allclose(np.asarray(warped), 0.0, atol=1e-6)

    def test_negative_depth_masked(self):
        img = jnp.ones((1, 4, 4, 1))
        zp = jnp.asarray(np.array([[[1.0, 1.0, -0.5]]], dtype="float32"))
        warped, mask = bilinear_sample(img, zp)
        assert float(mask[0]) == 0.0

    def test_perspective_divide(self):
        img = jnp.asarray(np.arange(16, dtype="float32").reshape(1, 4, 4, 1))
        # zp = 2*(x=2, y=1, 1): divides back to (2,1) -> row 1, col 2 -> 6
        zp = jnp.asarray(np.array([[[4.0, 2.0, 2.0]]], dtype="float32"))
        warped, mask = bilinear_sample(img, zp)
        assert float(mask[0]) == 1.0
        assert float(warped[0, 0]) == pytest.approx(6.0)

    def test_gradients_flow_through_weights_and_values(self):
        img = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 2).astype("float32"))

        def f(zp):
            w, _ = bilinear_sample(img, zp)
            return jnp.sum(w)

        zp = jnp.asarray(np.array([[[1.2, 1.7, 1.0]]], dtype="float32"))
        g = jax.grad(f)(zp)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)

        def fimg(im):
            w, _ = bilinear_sample(im, zp)
            return jnp.sum(w)

        gi = jax.grad(fimg)(img)
        assert np.any(np.asarray(gi) != 0)


class TestRotateConsistencyLoss:
    def _rand_rgbd(self, key, b=4, size=8):
        k1, k2 = jax.random.split(key)
        rgb = jax.random.uniform(k1, (b, size, size, 3), minval=-1, maxval=1)
        depth = jax.random.uniform(k2, (b, size, size, 1), minval=0.8, maxval=1.5)
        return jnp.concatenate([rgb, depth], axis=-1)

    def test_zero_loss_for_identical_pose(self):
        # Same image, same camera -> warp is identity -> loss ~ 0 under true
        # bilinear. The exact reference mode truncates along u, so sub-ULP
        # jitter at integer coords can jump a whole row (the Chainer original
        # has the same property); only a loose bound holds there.
        img = self._rand_rgbd(jax.random.PRNGKey(0))
        mats = camera_matrices(jnp.zeros((4, 6)))
        loss_fix, zp = rotate_consistency_loss(
            img, mats, img, mats, exact_bilinear=False
        )
        assert float(loss_fix) == pytest.approx(0.0, abs=1e-3)
        assert zp.shape == (8, 64, 3)
        loss_exact, _ = rotate_consistency_loss(img, mats, img, mats)
        assert float(loss_exact) < 0.5

    def test_finite_and_differentiable(self):
        key = jax.random.PRNGKey(1)
        img1 = self._rand_rgbd(key)
        img2 = self._rand_rgbd(jax.random.PRNGKey(2))
        t1 = jnp.zeros((4, 6))
        t2 = jnp.zeros((4, 6)).at[:, 1].set(0.2)
        m1, m2 = camera_matrices(t1), camera_matrices(t2)

        def f(im1, im2):
            loss, _ = rotate_consistency_loss(im1, m1, im2, m2, occlusion_aware=True)
            return loss

        loss = f(img1, img2)
        assert np.isfinite(float(loss))
        g1, g2 = jax.grad(f, argnums=(0, 1))(img1, img2)
        assert np.all(np.isfinite(np.asarray(g1)))
        assert np.all(np.isfinite(np.asarray(g2)))
        # gradient must reach the depth channel (depth drives the warp)
        assert np.any(np.asarray(g1[..., -1]) != 0)

    def test_l2_norm_option(self):
        img = self._rand_rgbd(jax.random.PRNGKey(3))
        mats = camera_matrices(jnp.zeros((4, 6)))
        l1, _ = rotate_consistency_loss(img, mats, img, mats, norm="l1")
        l2, _ = rotate_consistency_loss(img, mats, img, mats, norm="l2")
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))

    def test_depth_masks(self):
        img = self._rand_rgbd(jax.random.PRNGKey(4))
        mats = camera_matrices(jnp.zeros((4, 6)))
        loss, _ = rotate_consistency_loss(
            img, mats, img, mats, max_depth=1.2, min_depth=0.9
        )
        assert np.isfinite(float(loss))


class TestPrior:
    def _config(self, uniform=False):
        return Config(
            dict(
                x_rotate=0.3054,
                y_rotate=3.1415,
                z_rotate=0,
                x_translate=0,
                y_translate=0,
                z_translate=0,
                uniform_distribution=uniform,
            )
        )

    def test_np_shapes_and_ranges(self):
        prior = CameraParamPrior(self._config())
        np.random.seed(0)
        t = prior.sample_np(32)
        assert t.shape == (32, 6)
        assert t.dtype == np.float32
        # scaled by per-axis range: z_rotate and translations are all zero
        np.testing.assert_allclose(t[:, 2:], 0.0)
        assert np.all(np.abs(t[:, 0]) <= 0.3054 + 1e-6)
        assert np.all(np.abs(t[:, 1]) <= 3.1415 + 1e-6)

    def test_pairing_bounded_difference(self):
        prior = CameraParamPrior(self._config())
        np.random.seed(1)
        t = prior.sample_np(64)
        t1, t2 = t[:32], t[32:]
        # x-rotation difference limited by 0.5*clip(1/range,0,1)*range = 0.5 rad max
        diff = np.abs(t1[:, 0] - t2[:, 0])
        assert np.all(diff <= 0.5 * 0.3054 / 0.3054 * prior.camera_param_range[0] + 1e-5)

    def test_jax_sampler_distribution(self):
        prior = CameraParamPrior(self._config(uniform=True))
        t = np.asarray(prior.sample(jax.random.PRNGKey(0), 512))
        assert t.shape == (512, 6)
        # uniform mode wraps theta2 into [-1, 1] before range scaling
        assert np.all(np.abs(t[:, 1]) <= 3.1415 + 1e-4)
        # first half is U(-range, range): mean ~ 0
        assert abs(t[:256, 1].mean()) < 0.4
