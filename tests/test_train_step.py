import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.core import Config
from rgbd_gan_tpu.geometry import CameraParamPrior
from rgbd_gan_tpu.models import (
    DCGANGenerator,
    Discriminator,
    StyleGANGenerator,
    dcgan_make_hidden,
    stylegan_make_hidden,
)
from rgbd_gan_tpu.train import (
    StepSpec,
    TrainState,
    downsize_real,
    make_optimizer,
    make_rgb_train_step,
    make_rgbd_train_step,
    make_stylegan_gen_optimizer,
    soft_copy_params,
)

CH = 32
BATCH = 8
FULL = 32  # dataset resolution for the minimum slice


def _prior():
    return CameraParamPrior(
        Config(
            dict(
                x_rotate=0.3054, y_rotate=3.1415, z_rotate=0,
                x_translate=0, y_translate=0, z_translate=0,
                uniform_distribution=False,
            )
        )
    )


def _build_dcgan(spec_overrides=None):
    gen = DCGANGenerator(in_ch=CH, ch=CH * 2, rgbd=True)
    dis = Discriminator(ch=CH, res=True)
    key = jax.random.PRNGKey(0)
    z = dcgan_make_hidden(key, BATCH, CH)
    theta9 = jnp.zeros((BATCH, 9))
    params_gen = gen.init(jax.random.PRNGKey(1), z, theta9, method=gen.init_all)["params"]
    params_dis = dis.init(jax.random.PRNGKey(2), jnp.ones((BATCH, 4, 4, 3)), method=dis.init_all)[
        "params"
    ]
    opt_gen = make_optimizer(0.001, 0.0, 0.999)
    opt_dis = make_optimizer(0.003, 0.0, 0.999)
    spec = StepSpec(
        architecture="dcgan",
        stage_floor=6,
        batch_size=BATCH,
        use_rotate=True,
        occlusion_aware=True,
        lambda_gp=1.0,
        lambda_depth=10.0,
        depth_min=0.6,
        lambda_geometric=1.0,
        keep_smoothed_gen=True,
        **(spec_overrides or {}),
    )
    state = TrainState(
        params_gen=params_gen,
        params_dis=params_dis,
        opt_map=None,
        opt_gen=opt_gen.init(params_gen),
        opt_dis=opt_dis.init(params_dis),
        ema_gen=jax.tree_util.tree_map(lambda x: x, params_gen),
        sn_state=None,
        iteration=jnp.int32(0),
    )
    step = make_rgbd_train_step(
        gen, dis, lambda k, n: dcgan_make_hidden(k, n, CH), _prior(), None, opt_gen, opt_dis, spec
    )
    return gen, dis, state, step


class TestRGBDStepDCGAN:
    @pytest.fixture(scope="class")
    def setup(self):
        return _build_dcgan()

    def test_step_runs_and_losses_finite(self, setup):
        gen, dis, state, step = setup
        x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, FULL, FULL, 3), minval=-1, maxval=1)
        jstep = jax.jit(step)
        new_state, metrics = jstep(state, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        assert int(new_state.iteration) == 1
        for k in ["gen/loss_adv", "gen/loss_rotate", "dis/loss_adv", "dis/loss_gp"]:
            assert np.isfinite(float(metrics[k])), k
        assert not bool(metrics["nan"])
        assert float(metrics["image_size"]) == 32.0

    def test_params_change_and_ema_tracks(self, setup):
        gen, dis, state, step = setup
        x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, FULL, FULL, 3), minval=-1, maxval=1)
        new_state, _ = jax.jit(step)(state, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        # generator and discriminator params must move
        diff_g = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params_gen, new_state.params_gen
        )
        assert max(jax.tree_util.tree_leaves(diff_g)) > 0
        diff_d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params_dis, new_state.params_dis
        )
        assert max(jax.tree_util.tree_leaves(diff_d)) > 0
        # EMA: ema' = 0.999*ema + 0.001*new  (tau = 1 - smoothing)
        expected = soft_copy_params(state.ema_gen, new_state.params_gen, 1.0 - 0.999)
        chex_ok = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(jnp.allclose(a, b, atol=1e-7)), new_state.ema_gen, expected
            )
        )
        assert chex_ok

    def test_fixed_seed_reproducible(self, setup):
        gen, dis, state, step = setup
        x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, FULL, FULL, 3), minval=-1, maxval=1)
        jstep = jax.jit(step)
        _, m1 = jstep(state, x, jnp.float32(0.0), jax.random.PRNGKey(7))
        _, m2 = jstep(state, x, jnp.float32(0.0), jax.random.PRNGKey(7))
        for k in ["gen/loss_adv", "gen/loss_rotate", "dis/loss_adv"]:
            assert float(m1[k]) == float(m2[k]), k

    def test_multiple_steps_stay_finite(self, setup):
        gen, dis, state, step = setup
        jstep = jax.jit(step)
        key = jax.random.PRNGKey(5)
        for i in range(3):
            key, kx, ks = jax.random.split(key, 3)
            x = jax.random.uniform(kx, (BATCH, FULL, FULL, 3), minval=-1, maxval=1)
            state, metrics = jstep(state, x, jnp.float32(0.0), ks)
            assert not bool(metrics["nan"]), i
        assert int(state.iteration) == 3


class TestRGBDStepStyleGAN:
    def test_stylegan_step_with_two_optimizers(self):
        gen = StyleGANGenerator(CH, rgbd=True)
        dis = Discriminator(ch=CH, res=True)
        z = stylegan_make_hidden(jax.random.PRNGKey(0), BATCH, CH)
        theta9 = jnp.zeros((BATCH, 9))
        params_gen = gen.init(jax.random.PRNGKey(1), z, theta9, method=gen.init_all)["params"]
        params_dis = dis.init(
            jax.random.PRNGKey(2), jnp.ones((BATCH, 4, 4, 3)), method=dis.init_all
        )["params"]
        opt_map = make_optimizer(0.001 / 100, 0.0, 0.999)
        opt_gen = make_stylegan_gen_optimizer(0.001, 0.0, 0.999, rgbd=True)
        opt_dis = make_optimizer(0.003, 0.0, 0.999)
        spec = StepSpec(
            architecture="stylegan", stage_floor=6, batch_size=BATCH,
            use_rotate=True, occlusion_aware=False, lambda_geometric=2.0,
        )
        state = TrainState(
            params_gen=params_gen,
            params_dis=params_dis,
            opt_map=opt_map.init(params_gen["mapping"]),
            opt_gen=opt_gen.init(params_gen["gen"]),
            opt_dis=opt_dis.init(params_dis),
            ema_gen=None,
            sn_state=None,
            iteration=jnp.int32(0),
        )
        step = make_rgbd_train_step(
            gen, dis, lambda k, n: stylegan_make_hidden(k, n, CH), _prior(),
            opt_map, opt_gen, opt_dis, spec,
        )
        x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, FULL, FULL, 3), minval=-1, maxval=1)
        new_state, metrics = jax.jit(step)(state, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        assert not bool(metrics["nan"])
        # mapping params moved (their own optimizer at alpha/100)
        dmap = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params_gen["mapping"], new_state.params_gen["mapping"],
        )
        assert max(jax.tree_util.tree_leaves(dmap)) > 0
        # l1/l2 camera layers step ~100x smaller relative to comparable layers
        d_l1 = float(
            jnp.abs(
                new_state.params_gen["gen"]["l1"]["kernel"]
                - state.params_gen["gen"]["l1"]["kernel"]
            ).max()
        )
        assert d_l1 > 0

    def test_odd_stage_fade_in_step(self):
        gen = StyleGANGenerator(CH, rgbd=True)
        dis = Discriminator(ch=CH, res=True)
        z = stylegan_make_hidden(jax.random.PRNGKey(0), BATCH, CH)
        theta9 = jnp.zeros((BATCH, 9))
        params_gen = gen.init(jax.random.PRNGKey(1), z, theta9, method=gen.init_all)["params"]
        params_dis = dis.init(
            jax.random.PRNGKey(2), jnp.ones((BATCH, 4, 4, 3)), method=dis.init_all
        )["params"]
        opt_map = make_optimizer(0.00001, 0.0, 0.999)
        opt_gen = make_stylegan_gen_optimizer(0.001, 0.0, 0.999, rgbd=True)
        opt_dis = make_optimizer(0.003, 0.0, 0.999)
        spec = StepSpec(
            architecture="stylegan", stage_floor=7, batch_size=BATCH, use_rotate=True
        )
        state = TrainState(
            params_gen=params_gen, params_dis=params_dis,
            opt_map=opt_map.init(params_gen["mapping"]),
            opt_gen=opt_gen.init(params_gen["gen"]),
            opt_dis=opt_dis.init(params_dis),
            ema_gen=None, sn_state=None, iteration=jnp.int32(0),
        )
        step = make_rgbd_train_step(
            gen, dis, lambda k, n: stylegan_make_hidden(k, n, CH), _prior(),
            opt_map, opt_gen, opt_dis, spec,
        )
        x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, 64, 64, 3), minval=-1, maxval=1)
        _, metrics = jax.jit(step)(state, x, jnp.float32(0.3), jax.random.PRNGKey(4))
        assert not bool(metrics["nan"])
        assert float(metrics["image_size"]) == 64.0
        assert float(metrics["stage"]) == pytest.approx(7.3, abs=1e-5)


class TestRGBStep:
    def test_rgb_step(self):
        gen = DCGANGenerator(in_ch=CH, ch=CH * 2, rgbd=False)
        dis = Discriminator(ch=CH, res=True)
        z = dcgan_make_hidden(jax.random.PRNGKey(0), BATCH, CH)
        params_gen = gen.init(jax.random.PRNGKey(1), z, None, method=gen.init_all)["params"]
        params_dis = dis.init(
            jax.random.PRNGKey(2), jnp.ones((BATCH, 4, 4, 3)), method=dis.init_all
        )["params"]
        opt_gen = make_optimizer(0.001, 0.0, 0.999)
        opt_dis = make_optimizer(0.003, 0.0, 0.999)
        spec = StepSpec(architecture="dcgan", stage_floor=6, batch_size=BATCH)
        state = TrainState(
            params_gen=params_gen, params_dis=params_dis, opt_map=None,
            opt_gen=opt_gen.init(params_gen), opt_dis=opt_dis.init(params_dis),
            ema_gen=None, sn_state=None, iteration=jnp.int32(0),
        )
        step = make_rgb_train_step(
            gen, dis, lambda k, n: dcgan_make_hidden(k, n, CH), None, opt_gen, opt_dis, spec
        )
        x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, FULL, FULL, 3), minval=-1, maxval=1)
        new_state, metrics = jax.jit(step)(state, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        assert not bool(metrics["nan"])
        assert "gen/loss_rotate" not in metrics


class TestDownsizeReal:
    def test_even_stage_sizes(self):
        x = jnp.ones((2, 128, 128, 3))
        for stage, size in [(6, 32), (8, 64), (10, 128)]:
            y = downsize_real(x, stage, jnp.float32(0.0))
            assert y.shape == (2, size, size, 3), stage

    def test_odd_stage_blend(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
        y0 = downsize_real(x, 7, jnp.float32(0.0))
        y1 = downsize_real(x, 7, jnp.float32(1.0))
        assert y0.shape == (2, 64, 64, 3)
        # alpha=1 -> pure high-res branch == identity here (scale_high == 1)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(x), atol=1e-6)
        # alpha=0 -> upsampled low-res; 2x2 blocks constant
        y0 = np.asarray(y0)
        np.testing.assert_allclose(y0[:, 0::2, 0::2], y0[:, 1::2, 1::2], atol=1e-6)


class TestLegacyStep:
    def test_style_mixing_legacy_updater(self):
        from rgbd_gan_tpu.train.legacy import make_legacy_train_step
        from rgbd_gan_tpu.train import make_stylegan_gen_optimizer

        gen = StyleGANGenerator(CH, rgbd=False)
        dis = Discriminator(ch=CH, res=True)
        z = stylegan_make_hidden(jax.random.PRNGKey(0), BATCH, CH)
        params_gen = gen.init(jax.random.PRNGKey(1), z, None, method=gen.init_all)["params"]
        params_dis = dis.init(
            jax.random.PRNGKey(2), jnp.ones((BATCH, 4, 4, 3)), method=dis.init_all
        )["params"]
        opt_map = make_optimizer(0.00001, 0.0, 0.999)
        opt_gen = make_stylegan_gen_optimizer(0.001, 0.0, 0.999, rgbd=False)
        opt_dis = make_optimizer(0.003, 0.0, 0.999)
        spec = StepSpec(
            architecture="stylegan", stage_floor=6, batch_size=BATCH,
            style_mixing_rate=0.9, keep_smoothed_gen=False,
        )
        state = TrainState(
            params_gen=params_gen, params_dis=params_dis,
            opt_map=opt_map.init(params_gen["mapping"]),
            opt_gen=opt_gen.init(params_gen["gen"]),
            opt_dis=opt_dis.init(params_dis),
            ema_gen=None, sn_state=None, iteration=jnp.int32(0),
        )
        step = make_legacy_train_step(
            gen, dis, lambda k, n: stylegan_make_hidden(k, n, CH),
            opt_map, opt_gen, opt_dis, spec, total_devices=1,
        )
        x = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, FULL, FULL, 3), minval=-1, maxval=1)
        new_state, metrics = jax.jit(step)(state, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        assert not bool(metrics["nan"])
        assert np.isfinite(float(metrics["dis/loss_gp"]))
        assert int(new_state.iteration) == 1


class TestLazyR1:
    """Opt-in lazy R1 (StepSpec.r1_interval > 1, StyleGAN2 §5.1): the
    penalty fires only on every k-th iteration, scaled by k; skip steps run
    a plain D(x_real) forward. Default interval 1 is the reference-exact
    path (covered by the golden pins)."""

    def test_gp_fires_on_schedule_and_scales(self):
        _, _, state0, step_lazy = _build_dcgan({"r1_interval": 2})
        _, _, _, step_plain = _build_dcgan()
        x = jax.random.uniform(
            jax.random.PRNGKey(3), (BATCH, FULL, FULL, 3), minval=-1, maxval=1
        )
        jlazy = jax.jit(step_lazy)
        jplain = jax.jit(step_plain)

        # iteration 0: penalty applied; same state + key => exactly k× the
        # plain-spec penalty (identical forward, scaled weight)
        s1, m_lazy0 = jlazy(state0, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        _, m_plain0 = jplain(state0, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        assert float(m_lazy0["dis/loss_gp"]) == pytest.approx(
            2.0 * float(m_plain0["dis/loss_gp"]), rel=1e-5
        )

        # iteration 1: skipped => exactly zero, losses stay finite
        s2, m1 = jlazy(s1, x, jnp.float32(0.0), jax.random.PRNGKey(5))
        assert float(m1["dis/loss_gp"]) == 0.0
        assert np.isfinite(float(m1["dis/loss_adv"]))

        # iteration 2: applied again
        _, m2 = jlazy(s2, x, jnp.float32(0.0), jax.random.PRNGKey(6))
        assert float(m2["dis/loss_gp"]) > 0.0

    def test_lazy_r1_composes_with_step_window(self):
        """r1_interval inside make_windowed_step: the lax.cond on the traced
        iteration must compile under lax.scan and fire on the right steps
        within one window (gp on window steps 0 and 2, zero on 1 and 3)."""
        from rgbd_gan_tpu.train.steps import make_windowed_step

        _, _, state, step = _build_dcgan({"r1_interval": 2})
        window = 4
        wstep = jax.jit(make_windowed_step(step, window))
        x = jax.random.uniform(
            jax.random.PRNGKey(3), (BATCH, FULL, FULL, 3), minval=-1, maxval=1
        )
        xs = jnp.broadcast_to(x, (window,) + x.shape)
        alphas = jnp.zeros((window,), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(4), window)
        new_state, metrics = wstep(state, xs, alphas, keys)
        gp = np.asarray(metrics["dis/loss_gp"])
        assert gp.shape == (window,)
        assert gp[0] > 0.0 and gp[2] > 0.0
        assert gp[1] == 0.0 and gp[3] == 0.0
        assert int(new_state.iteration) == window
