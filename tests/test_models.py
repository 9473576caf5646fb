import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.core import decompose_stage, resolution_of_stage
from rgbd_gan_tpu.models import (
    DCGANGenerator,
    Discriminator,
    Encoder,
    MappingNetwork,
    OccupancyNet,
    StyleGANGenerator,
    dcgan_make_hidden,
    stylegan_make_hidden,
)

CH = 64  # small width for fast tests (config.ch=256 in the shipped configs)


def _theta9(b):
    t = np.zeros((b, 6), dtype="float32")
    t[:, 1] = np.linspace(-0.5, 0.5, b)
    return jnp.asarray(
        np.concatenate([np.cos(t[:, :3]), np.sin(t[:, :3]), t[:, 3:]], axis=1)
    )


class TestMakeHidden:
    def test_stylegan_latent_norm_quirk(self):
        z = np.asarray(stylegan_make_hidden(jax.random.PRNGKey(0), 16, CH))
        assert z.shape == (16, 2 * CH)
        # normalised by sqrt(sum/ch) with ch (not 2ch): E[sum z^2] = 2ch
        # so after the divide, sum(z^2) ~ ch * (sum/(sum/ch)) -> exactly ch... check:
        ssq = (z**2).sum(axis=1)
        np.testing.assert_allclose(ssq, CH, rtol=1e-3)

    def test_dcgan_latent_norm(self):
        z = np.asarray(dcgan_make_hidden(jax.random.PRNGKey(0), 16, CH))
        assert z.shape == (16, CH)
        np.testing.assert_allclose((z**2).sum(axis=1), CH, rtol=1e-3)


class TestMapping:
    def test_shapes(self):
        m = MappingNetwork(CH)
        z = jnp.ones((4, CH))
        params = m.init(jax.random.PRNGKey(0), z)
        w = m.apply(params, z)
        assert w.shape == (4, CH)
        n_linears = len(params["params"])
        assert n_linears == 8


class TestStyleGANGenerator:
    @pytest.fixture(scope="class")
    def gen_and_params(self):
        gen = StyleGANGenerator(CH, rgbd=True)
        z = stylegan_make_hidden(jax.random.PRNGKey(0), 4, CH)
        params = gen.init(jax.random.PRNGKey(1), z, _theta9(4), method=gen.init_all)
        return gen, params, z

    @pytest.mark.parametrize("stage", [0, 1, 2, 5, 6, 7, 10])
    def test_resolutions_and_channels(self, gen_and_params, stage):
        gen, params, z = gen_and_params
        floor, alpha = decompose_stage(float(stage) + (0.5 if stage % 2 else 0.0))
        x = gen.apply(params, z, floor, jnp.float32(alpha), _theta9(4))
        res = resolution_of_stage(floor)
        assert x.shape == (4, res, res, 4)

    def test_depth_positive_and_initially_near_initial_depth(self, gen_and_params):
        gen, params, z = gen_and_params
        x = gen.apply(params, z, 6, jnp.float32(0.0), _theta9(4))
        depth = np.asarray(x[..., -1])
        assert np.all(depth > 0)
        # depth head inits: weights 0, bias log(e^1 - 1) -> depth == 1.0
        np.testing.assert_allclose(depth, 1.0, rtol=2e-4)

    def test_eval_mode_upsamples_small_stages(self, gen_and_params):
        gen, params, z = gen_and_params
        x = gen.apply(params, z, 2, jnp.float32(0.0), _theta9(4), train=False)
        assert x.shape[1] == 64  # min_sample_image_size

    def test_theta_changes_output(self, gen_and_params):
        gen, params, z = gen_and_params
        t1 = _theta9(4)
        t2 = jnp.asarray(np.asarray(t1) + 0.3)
        x1 = gen.apply(params, z, 6, jnp.float32(0.0), t1)
        x2 = gen.apply(params, z, 6, jnp.float32(0.0), t2)
        assert float(jnp.abs(x1[..., :3] - x2[..., :3]).max()) > 1e-5

    def test_fade_in_blend_continuity(self, gen_and_params):
        # alpha=0 at odd stage == previous even stage output upsampled path
        gen, params, z = gen_and_params
        theta = _theta9(4)
        x_even = gen.apply(params, z, 6, jnp.float32(0.0), theta)
        x_odd0 = gen.apply(params, z, 7, jnp.float32(0.0), theta)
        # RGB channels of odd/alpha=0 equal nearest-upsampled even RGB
        up = np.repeat(np.repeat(np.asarray(x_even[..., :3]), 2, 1), 2, 2)
        np.testing.assert_allclose(np.asarray(x_odd0[..., :3]), up, atol=1e-5)

    def test_return_feature_at_block3(self, gen_and_params):
        gen, params, z = gen_and_params
        x, feat = gen.apply(
            params, z, 6, jnp.float32(0.0), _theta9(4), return_feature=True
        )
        assert feat.shape == (4, 32, 32, CH)

    def test_jit_per_stage(self, gen_and_params):
        gen, params, z = gen_and_params
        f = jax.jit(gen.apply, static_argnums=(2,))
        x = f(params, z, 6, jnp.float32(0.0), _theta9(4))
        assert np.all(np.isfinite(np.asarray(x)))


class TestDCGANGenerator:
    @pytest.fixture(scope="class")
    def gen_and_params(self):
        # reference driver quirk: in_ch = config.ch, hidden ch stays 512
        # (train_rgbd.py:229-232); scaled down here
        gen = DCGANGenerator(in_ch=CH, ch=2 * CH, rgbd=True)
        z = dcgan_make_hidden(jax.random.PRNGKey(0), 4, CH)
        params = gen.init(jax.random.PRNGKey(1), z, _theta9(4), method=gen.init_all)
        return gen, params, z

    @pytest.mark.parametrize("stage", [2, 3, 6, 7, 10])
    def test_resolutions(self, gen_and_params, stage):
        gen, params, z = gen_and_params
        alpha = 0.5 if stage % 2 else 0.0
        x = gen.apply(params, z, stage, jnp.float32(alpha), _theta9(4))
        assert x.shape == (4, resolution_of_stage(stage), resolution_of_stage(stage), 4)

    def test_stage_below_2_raises(self, gen_and_params):
        gen, params, z = gen_and_params
        with pytest.raises(ValueError):
            gen.apply(params, z, 0, jnp.float32(0.0), _theta9(4))

    def test_depth_head(self, gen_and_params):
        gen, params, z = gen_and_params
        x = gen.apply(params, z, 6, jnp.float32(0.0), _theta9(4))
        np.testing.assert_allclose(np.asarray(x[..., -1]), 1.0, rtol=2e-4)


class TestDiscriminator:
    @pytest.fixture(scope="class")
    def dis_and_params(self):
        dis = Discriminator(ch=CH, res=True)
        x4 = jnp.ones((2, 4, 4, 3))
        params = dis.init(jax.random.PRNGKey(0), x4, method=dis.init_all)
        return dis, params

    @pytest.mark.parametrize("stage", [0, 1, 2, 6, 7, 10])
    def test_output_scalar(self, dis_and_params, stage):
        dis, params = dis_and_params
        res = resolution_of_stage(stage)
        x = jnp.ones((2, res, res, 3))
        y = dis.apply(params, x, stage, jnp.float32(0.5 if stage % 2 else 0.0))
        assert y.shape == (2, 1)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_hidden_feature_32(self, dis_and_params):
        dis, params = dis_and_params
        x = jnp.ones((2, 64, 64, 3))
        y, feat = dis.apply(params, x, 8, jnp.float32(0.0), return_hidden=True)
        assert feat.shape == (2, 32, 32, CH)

    def test_rgb_only_input(self, dis_and_params):
        dis, params = dis_and_params
        # 4-channel input must fail: depth is never shown to D
        x = jnp.ones((2, 32, 32, 4))
        with pytest.raises(Exception):
            dis.apply(params, x, 6, jnp.float32(0.0))

    def test_sn_variant_runs(self):
        dis = Discriminator(ch=CH, sn=True)
        x4 = jnp.ones((2, 4, 4, 3))
        variables = dis.init(jax.random.PRNGKey(0), x4, method=dis.init_all)
        x = jnp.ones((2, 32, 32, 3))
        y, new_state = dis.apply(variables, x, 6, jnp.float32(0.0), mutable=["sn"])
        assert y.shape == (2, 1)


class TestExtras:
    def test_occupancy_net(self):
        net = OccupancyNet(in_ch=CH + 3)
        z = jnp.ones((2, CH))
        coords = jnp.ones((2, 3, 16))
        params = net.init(jax.random.PRNGKey(0), z, coords)
        out = net.apply(params, z, coords)
        assert out.shape == (32, 1)

    def test_encoder(self):
        enc = Encoder(ch=CH, dim_z=32)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        variables = enc.init(jax.random.PRNGKey(0), x, 6)
        (zs, cam), _ = enc.apply(variables, x, 6, mutable=["batch_stats"])
        assert zs.shape == (2, 32)
        assert cam.shape == (2, 9)
        # rotation part normalised: cos^2 + sin^2 = 1
        np.testing.assert_allclose(
            np.asarray(cam[:, :3] ** 2 + cam[:, 3:6] ** 2), 1.0, rtol=1e-4
        )
