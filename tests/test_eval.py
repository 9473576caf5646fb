import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.eval.fid import (
    compute_dataset_stat,
    deepvoxels_image_sampler,
    fid_score,
    gen_images,
    get_mean_cov,
    inception_score,
    rgbd_image_sampler,
)
from rgbd_gan_tpu.eval.inception import FEATURE_DIM, InceptionV3, init_inception
from rgbd_gan_tpu.eval.preview import convert_batch_images


@pytest.fixture(scope="module")
def inception():
    return init_inception(jax.random.PRNGKey(0))


class TestInceptionArchitecture:
    def test_feature_and_softmax_shapes(self, inception):
        model, variables = inception
        x = jnp.zeros((2, 299, 299, 3))
        feat = model.apply(variables, x, get_feature=True)
        assert feat.shape == (2, FEATURE_DIM)
        probs = model.apply(variables, x)
        assert probs.shape == (2, 1008)
        np.testing.assert_allclose(np.asarray(probs.sum(axis=1)), 1.0, rtol=1e-4)

    def test_param_count_matches_inception_v3(self, inception):
        # canonical FID InceptionV3 has ~23.8M params (incl. 1008-way logits)
        model, variables = inception
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
        assert 23e6 < n < 26e6, n


class TestFIDMath:
    def test_fid_zero_for_identical_gaussians(self):
        rng = np.random.RandomState(0)
        m = rng.rand(16)
        a = rng.rand(64, 16)
        c = np.cov(a.T)
        assert fid_score(m, c, m, c) == pytest.approx(0.0, abs=1e-6)

    def test_fid_mean_shift(self):
        # identical covs: FID reduces to ||m0 - m1||^2
        rng = np.random.RandomState(1)
        a = rng.rand(64, 8)
        c = np.cov(a.T)
        m0 = np.zeros(8)
        m1 = np.ones(8) * 2.0
        assert fid_score(m0, c, m1, c) == pytest.approx(np.sum((m0 - m1) ** 2), rel=1e-5)

    def test_fid_positive_for_different_cov(self):
        rng = np.random.RandomState(2)
        c0 = np.cov(rng.rand(64, 8).T)
        c1 = np.cov((rng.rand(64, 8) * 3).T)
        m = np.zeros(8)
        assert fid_score(m, c0, m, c1) > 0

    def test_inception_score_uniform_is_one(self, inception):
        # untrained net ~ near-uniform predictions -> IS close to 1
        model, variables = inception
        ims = np.random.RandomState(0).randint(0, 255, (20, 32, 32, 3)).astype("f")
        mean, std = inception_score(model, variables, ims, batch_size=10, splits=2)
        assert 0.5 < mean < 3.0


class TestPipelines:
    def test_mean_cov_shapes(self, inception):
        model, variables = inception
        ims = np.random.RandomState(0).randint(0, 255, (8, 64, 64, 3)).astype("f")
        mean, cov = get_mean_cov(model, variables, ims, batch_size=4)
        assert mean.shape == (FEATURE_DIM,)
        assert cov.shape == (FEATURE_DIM, FEATURE_DIM)

    def test_dataset_stat_cache(self, inception, tmp_path):
        model, variables = inception
        ims = np.random.RandomState(0).randint(0, 255, (8, 64, 64, 3)).astype("f")
        path = str(tmp_path / "stat.npz")
        m1, c1 = compute_dataset_stat(model, variables, ims, path)
        assert os.path.exists(path)
        m2, c2 = compute_dataset_stat(model, variables, None, path)  # loads cache
        np.testing.assert_allclose(m1, m2)

    def test_samplers_advance_key_across_batches(self):
        """Both samplers must thread their PRNG key across calls: a constant
        key made every deepvoxels gen_images batch identical, degenerating
        the feature covariance at production-scale FID (round-5 fix)."""
        from rgbd_gan_tpu.core import Config
        from rgbd_gan_tpu.geometry import CameraParamPrior

        def echo_gen_apply(z, stage, alpha, theta9, mats=None):
            # image = broadcast of the latent: batches differ iff z does
            return jnp.broadcast_to(z[:, None, None, :4], (z.shape[0], 4, 4, 4))

        make_hidden = lambda k, n: jax.random.normal(k, (n, 8))
        prior = CameraParamPrior(
            Config(dict(x_rotate=0.3, y_rotate=1.0, z_rotate=0,
                        x_translate=0, y_translate=0, z_translate=0,
                        uniform_distribution=False))
        )
        for sampler in (
            rgbd_image_sampler(echo_gen_apply, make_hidden, 6, 0.0),
            deepvoxels_image_sampler(echo_gen_apply, make_hidden, prior, 6, 0.0),
        ):
            a = np.asarray(jax.device_get(sampler(4)))
            b = np.asarray(jax.device_get(sampler(4)))
            assert not np.array_equal(a, b), "sampler reused its PRNG key"

    def test_gen_images_adapter(self):
        def fake_gen_apply(z, stage, alpha, theta9):
            return jnp.zeros((z.shape[0], 8, 8, 4))

        gen = rgbd_image_sampler(
            fake_gen_apply, lambda k, n: jax.random.normal(k, (n, 4)), 6, 0.0,
            theta9_sampler=lambda k, n: jnp.zeros((n, 9)),
        )
        ims = gen_images(gen, n=6, batchsize=4)
        assert ims.shape == (6, 8, 8, 3)
        assert ims.dtype == np.uint8
        np.testing.assert_allclose(ims, 127)  # tanh 0 -> 127.5 -> clip/round


class TestConvertBatchImages:
    def test_rgb_grid(self):
        x = np.zeros((4, 3, 8, 8), dtype="float32")
        g = convert_batch_images(x, 2, 2)
        assert g.shape == (16, 16, 3)

    def test_rgbd_grid_interleaves_depth(self):
        x = np.zeros((4, 4, 8, 8), dtype="float32")
        x[:, -1] = 1.0  # depth 1 -> colourised 1/1*128 = 128
        g = convert_batch_images(x, 2, 2)
        assert g.shape == (32, 16, 3)  # depth rows double the height
        # row blocks alternate rgb (127/128) and depth (128)
        assert g[8:16].mean() == pytest.approx(128, abs=1)
