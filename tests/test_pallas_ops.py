"""Pallas fused bilinear gather vs the jnp reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.geometry.warp import CLIP_Z_MAX, CLIP_Z_MIN, bilinear_sample
from rgbd_gan_tpu.ops.bilinear_pallas import bilinear_gather_pallas

B, H, W, C = 2, 16, 16, 4


def _setup(seed=0, spread=1.4):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(B, H, W, C).astype("f"))
    # points both inside and outside the image
    u = jnp.asarray((rng.rand(B, H * W) * spread - 0.2).astype("f") * (H - 1))
    v = jnp.asarray((rng.rand(B, H * W) * spread - 0.2).astype("f") * (W - 1))
    return img, u, v


def _jnp_reference(img, u, v, exact=True):
    """Drive geometry.warp.bilinear_sample with zp built so the perspective
    divide yields exactly (u, v) after the internal swap."""
    z = jnp.ones_like(u)
    # internal: u_row = zp[:,1]/z, v_col = zp[:,0]/z (swap)
    zp = jnp.stack([v, u, z], axis=-1)  # (B, N, 3)
    warped, mask = bilinear_sample(img, zp, exact=exact)
    return warped.reshape(B, -1, C), mask.reshape(B, -1)


@pytest.mark.parametrize("exact", [True, False])
class TestForwardParity:
    def test_matches_jnp_path(self, exact):
        img, u, v = _setup()
        ours = bilinear_gather_pallas(img, u, v, exact, True)  # interpret
        ref, mask = _jnp_reference(img, u, v, exact)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)

    def test_integer_points(self, exact):
        img, _, _ = _setup()
        u = jnp.broadcast_to(jnp.arange(H * W, dtype=jnp.float32) % (H - 1), (B, H * W))
        v = jnp.broadcast_to((jnp.arange(H * W, dtype=jnp.float32) // W) % (W - 1), (B, H * W))
        ours = bilinear_gather_pallas(img, u, v, exact, True)
        ref, _ = _jnp_reference(img, u, v, exact)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


class TestGradientParity:
    def _grads(self, fn, img, u, v):
        def loss(img, u, v):
            out = fn(img, u, v)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

        return jax.grad(loss, argnums=(0, 1, 2))(img, u, v)

    @pytest.mark.parametrize("exact", [True, False])
    def test_grads_match(self, exact):
        img, u, v = _setup(seed=1)
        g_ours = self._grads(
            lambda i, uu, vv: bilinear_gather_pallas(i, uu, vv, exact, True), img, u, v
        )
        g_ref = self._grads(
            lambda i, uu, vv: _jnp_reference(i, uu, vv, exact)[0], img, u, v
        )
        for a, b, name in zip(g_ours, g_ref, ["dimg", "du", "dv"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name
            )

    def test_masked_points_zero_grad(self):
        img, u, v = _setup(seed=2)
        u = u.at[:, :8].set(-5.0)  # force OOB
        du = jax.grad(
            lambda uu: jnp.sum(bilinear_gather_pallas(img, uu, v, True, True))
        )(u)
        np.testing.assert_allclose(np.asarray(du[:, :8]), 0.0, atol=1e-7)


class TestPadding:
    def test_non_tile_multiple_points(self):
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.rand(1, 8, 8, 2).astype("f"))
        n = 37  # not a multiple of TILE_N
        u = jnp.asarray(rng.rand(1, n).astype("f") * 6)
        v = jnp.asarray(rng.rand(1, n).astype("f") * 6)
        out = bilinear_gather_pallas(img, u, v, True, True)
        assert out.shape == (1, n, 2)
        z = jnp.ones_like(u)
        ref, _ = bilinear_sample(img, jnp.stack([v, u, z], axis=-1), exact=True)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), atol=1e-5)


class TestOnehotRoute:
    """The scatter-free routes must match the xla gather path."""

    @pytest.mark.parametrize("mode", ["onehot", "hybrid"])
    @pytest.mark.parametrize("exact", [True, False])
    def test_forward_and_grads_match_xla(self, exact, mode):
        from rgbd_gan_tpu.geometry.warp import bilinear_sample

        rng = np.random.RandomState(7)
        img = jnp.asarray(rng.rand(2, 16, 16, 4).astype("f"))
        zp = jnp.asarray(
            (rng.rand(2, 300, 3) * np.array([20, 20, 1.2]) - np.array([2, 2, 0])).astype("f")
        )

        wx, mx = bilinear_sample(img, zp, exact=exact)
        wo, mo = bilinear_sample(img, zp, exact=exact, gather_mode=mode)
        np.testing.assert_allclose(np.asarray(wo), np.asarray(wx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(mo), np.asarray(mx), atol=1e-7)

        def loss(m):
            return lambda i, z: jnp.sum(
                bilinear_sample(i, z, exact=exact, gather_mode=m)[0] ** 2
            )

        gx = jax.grad(loss("xla"), argnums=(0, 1))(img, zp)
        go = jax.grad(loss(mode), argnums=(0, 1))(img, zp)
        for a, b in zip(gx, go):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)

    def test_hybrid_forward_bitwise_equals_xla(self):
        """The hybrid forward is the same arithmetic as the xla route."""
        from rgbd_gan_tpu.geometry.warp import bilinear_sample

        rng = np.random.RandomState(11)
        img = jnp.asarray(rng.rand(2, 16, 16, 4).astype("f"))
        zp = jnp.asarray(
            (rng.rand(2, 300, 3) * np.array([20, 20, 1.2]) - np.array([2, 2, 0])).astype("f")
        )
        wx, _ = bilinear_sample(img, zp, exact=True)
        wh, _ = bilinear_sample(img, zp, exact=True, gather_mode="hybrid")
        assert np.array_equal(np.asarray(wx), np.asarray(wh))

    def test_hybrid_masked_points_zero_grad(self):
        from rgbd_gan_tpu.ops.bilinear_gradgather import bilinear_gather_grad

        rng = np.random.RandomState(12)
        img = jnp.asarray(rng.rand(1, 8, 8, 2).astype("f"))
        u = jnp.asarray(rng.rand(1, 64).astype("f") * 6).at[:, :8].set(-5.0)
        v = jnp.asarray(rng.rand(1, 64).astype("f") * 6)
        du = jax.grad(lambda uu: jnp.sum(bilinear_gather_grad(img, uu, v, False)))(u)
        np.testing.assert_allclose(np.asarray(du[:, :8]), 0.0, atol=1e-7)


class TestConvPallasPrototype:
    """Experimental fused conv block (ops/conv_pallas.py) — parity only;
    measured SLOWER than XLA's conv emitters at every GAN shape (see
    ROADMAP), kept as a documented negative result."""

    def test_forward_matches_xla(self):
        from rgbd_gan_tpu.ops.conv_pallas import conv3x3_bias_lrelu

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 12, 8).astype("f"))
        k = jnp.asarray(rng.randn(3, 3, 8, 16).astype("f") * 0.1)
        b = jnp.asarray(rng.randn(16).astype("f"))
        y = conv3x3_bias_lrelu(x, k, b, interpret=True)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        ref = jnp.where(ref >= 0, ref, 0.2 * ref)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
