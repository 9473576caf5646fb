"""Closed-form golden tests for the loss layer (SURVEY §4.1)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.train.legacy import calc_distance, loss_func_dsgan
from rgbd_gan_tpu.train.losses import (
    dis_adv_loss,
    downsize_real,
    gen_adv_loss,
    l2_loss,
    r1_penalty,
    smooth_depth_loss,
)
from rgbd_gan_tpu.train.optim import get_lr_scale_factor


class TestAdversarialLosses:
    def test_gen_loss_closed_form(self):
        # softplus(-y) averaged
        y = jnp.asarray([[0.0], [1.0]])
        expected = (math.log(2) + math.log(1 + math.e**-1)) / 2
        assert float(gen_adv_loss(y)) == pytest.approx(expected, rel=1e-6)

    def test_gen_loss_focal(self):
        # focal term sigmoid(-y)^gamma weights each element
        y = jnp.asarray([[1.0]])
        g = 2.0
        expected = math.log(1 + math.e**-1) * (1 / (1 + math.e)) ** g
        assert float(gen_adv_loss(y, g)) == pytest.approx(expected, rel=1e-5)

    def test_gen_loss_gamma_none_is_zero(self):
        y = jnp.asarray([[0.5]])
        assert float(gen_adv_loss(y, None)) == pytest.approx(
            float(gen_adv_loss(y, 0.0)), rel=1e-7
        )

    def test_dis_loss_closed_form(self):
        yf = jnp.asarray([[0.0]])
        yr = jnp.asarray([[0.0]])
        assert float(dis_adv_loss(yf, yr)) == pytest.approx(2 * math.log(2), rel=1e-6)

    def test_dis_loss_tuple_aware(self):
        yf = (jnp.zeros((2, 1)), jnp.zeros((2, 1)))
        yr = (jnp.zeros((2, 1)), jnp.zeros((2, 1)))
        assert float(dis_adv_loss(yf, yr)) == pytest.approx(4 * math.log(2), rel=1e-6)

    def test_l2_loss_is_mean(self):
        h = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        assert float(l2_loss(h, 0.0)) == pytest.approx((1 + 4 + 9 + 16) / 4)


class TestR1Penalty:
    def test_linear_discriminator_closed_form(self):
        # D(x) = sum(a * x): grad = a per sample; penalty = mean ||a||^2
        a = jnp.asarray(np.random.RandomState(0).rand(3, 4).astype("f"))

        def dis(x):
            return jnp.sum(x * a, axis=(1, 2, 3))

        x = jnp.ones((2, 3, 4, 1))
        a4 = a.reshape(1, 3, 4, 1)

        def dis4(x):
            return jnp.sum(x * a4, axis=(1, 2, 3))

        expected = float(jnp.sum(a**2))
        assert float(r1_penalty(dis4, x)) == pytest.approx(expected, rel=1e-4)

    def test_differentiable_wrt_dis_params(self):
        # second-order path: d penalty / d a must exist and be 2*a-ish
        x = jnp.ones((1, 2, 2, 1))

        def penalty(a):
            return r1_penalty(lambda xx: jnp.sum(xx * a, axis=(1, 2, 3)), x)

        a = jnp.full((1, 2, 2, 1), 3.0)
        g = jax.grad(penalty)(a)
        np.testing.assert_allclose(np.asarray(g), 6.0, rtol=1e-4)


class TestLRScaleTable:
    def test_reference_values(self):
        assert get_lr_scale_factor(1, 14.0) == 1
        assert get_lr_scale_factor(1, 15.2) == 1.5
        assert get_lr_scale_factor(8, 9.0) == 1.5
        assert get_lr_scale_factor(8, 13.9) == 3
        assert get_lr_scale_factor(4, 19) == 3  # stage >= 18 -> table[17]
        assert get_lr_scale_factor(99, 16.0) == 1.5  # unknown count -> 1-GPU table


class TestAuxLosses:
    def test_smooth_depth_runs(self):
        d = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 1), minval=0.5, maxval=2)
        v = float(smooth_depth_loss(d))
        assert np.isfinite(v) and v >= 0

    def test_dsgan_loss(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 8, 4))
        z = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
        theta = jax.random.normal(jax.random.PRNGKey(2), (4, 6))
        v = float(loss_func_dsgan(x, z, theta))
        assert np.isfinite(v) and v <= 0  # negative of two clipped ratios

    def test_calc_distance_zero_for_identical_sets(self):
        t = jax.random.normal(jax.random.PRNGKey(0), (5, 9))
        assert float(calc_distance(t, t)) == pytest.approx(0.0, abs=1e-4)


class TestGoldenStepValues:
    """Fixed-seed regression pins: each pinned config's first train step must
    reproduce these loss values exactly (guards against silent numeric drift;
    regenerate deliberately per CLAUDE.md if semantics change).

    Three pinned configs (VERDICT round-2 #6): the DCGAN minimum slice, the
    stylegan + spectral-norm + rotate_feature + occupancy step, and the
    deepvoxels step with the background generator."""

    def _check_pin(self, name, got):
        import json, os

        pin_path = os.path.join(os.path.dirname(__file__), "golden_step_values.json")
        pins = {}
        if os.path.exists(pin_path):
            with open(pin_path) as f:
                pins = json.load(f)
        if name not in pins:
            pins[name] = got
            with open(pin_path, "w") as f:
                json.dump(pins, f, indent=1, sort_keys=True)
            pytest.skip(f"golden values for {name!r} regenerated; rerun to compare")
        for k, v in pins[name].items():
            assert got[k] == pytest.approx(v, rel=5e-4), f"{name}:{k}"

    def test_dcgan_first_step_losses(self):
        import test_train_step as tts

        gen, dis, state, step = tts._build_dcgan()
        x = jax.random.uniform(
            jax.random.PRNGKey(3), (tts.BATCH, tts.FULL, tts.FULL, 3), minval=-1, maxval=1
        )
        _, metrics = jax.jit(step)(state, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        got = {
            k: float(metrics[k])
            for k in ["gen/loss_adv", "gen/loss_rotate", "dis/loss_adv", "dis/loss_gp"]
        }
        self._check_pin("dcgan", got)

    def _trainer_first_step(self, config, data_size):
        """One production-Trainer iteration on fixed-seed synthetic data."""
        from rgbd_gan_tpu.data.dataset import synthetic_dataset
        from rgbd_gan_tpu.train.trainer import Trainer

        data = synthetic_dataset(8, data_size)
        t = Trainer(config, dataset=data, seed=0)
        rows = []
        t.run(log_cb=rows.append)
        return rows[-1]

    def test_stylegan_sn_rotate_occupancy_first_step_losses(self, tmp_path):
        from test_trainer import tiny_config

        config = tiny_config(
            tmp_path, generator_architecture="stylegan", sn=True,
            rotate_feature=True, use_occupancy_net_loss=True,
            lambda_occupancy=0.5, iteration=2, keep_smoothed_gen=False,
            snapshot_interval=100, start_occlusion_aware=0,
        )
        # pin the SECOND step: use_rotate (and with it the occupancy and
        # rotate_feature terms) engages at iteration > start_rotation
        row = self._trainer_first_step(config, 32)
        got = {
            k: float(row[k])
            for k in ["gen/loss_adv", "gen/loss_rotate", "gen/loss_occupancy",
                      "dis/loss_adv"]
        }
        self._check_pin("stylegan_sn_rotate_occupancy", got)

    def test_deepvoxels_background_first_step_losses(self, tmp_path):
        from test_deepvoxels_trainer import dv_config

        config = dv_config(
            tmp_path, background_generator=True, occlusion_type="deepvoxels",
            iteration=2, snapshot_interval=100, ch=16,
        )
        # second step: the rotate loss engages at iteration > start_rotation
        row = self._trainer_first_step(config, 64)
        got = {
            k: float(row[k])
            for k in ["gen/loss_adv", "gen/loss_rotate", "dis/loss_adv",
                      "dis/loss_gp"]
        }
        self._check_pin("deepvoxels_background", got)

    # -- opt-in performance variants (VERDICT r4 #6): the two modes that are
    # deliberately NOT reference-exact (lazy R1's lax.cond schedule; the
    # windowed bf16 Pallas lift) get their own fixed-seed pins so they cannot
    # drift silently either.

    def test_dcgan_lazy_r1_interval_two_step_losses(self):
        """Lazy R1 (StyleGAN2 §5.1, `r1_interval: 16` in the yml / bench):
        the penalty fires via lax.cond when iteration % k == 0 at weight x k
        (train/steps.py:267-286) and is exactly zero in between."""
        import test_train_step as tts

        gen, dis, state, step = tts._build_dcgan({"r1_interval": 16})
        x = jax.random.uniform(
            jax.random.PRNGKey(3), (tts.BATCH, tts.FULL, tts.FULL, 3),
            minval=-1, maxval=1,
        )
        jstep = jax.jit(step)
        # iteration 0: 0 % 16 == 0 -> the cond TAKES the penalty branch, x16
        state, m0 = jstep(state, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        # iteration 1: skipped branch -> gp contribution exactly 0
        state, m1 = jstep(state, x, jnp.float32(0.0), jax.random.PRNGKey(5))
        assert float(m1["dis/loss_gp"]) == 0.0
        got = {
            "step0/gen/loss_adv": float(m0["gen/loss_adv"]),
            "step0/dis/loss_adv": float(m0["dis/loss_adv"]),
            "step0/dis/loss_gp": float(m0["dis/loss_gp"]),
            "step1/dis/loss_adv": float(m1["dis/loss_adv"]),
        }
        self._check_pin("dcgan_lazy_r1_16", got)

    def test_deepvoxels_pallas_win_interpret_step_losses(self, tmp_path, monkeypatch):
        """The windowed bf16 Pallas lift (`lift_mode: pallas_win`) driven
        through the production Trainer in Pallas INTERPRET mode (bit-exact
        twin of the Mosaic kernel's arithmetic: bf16 operands, f32
        accumulation, per-tile d1 windows). Pins the first step so the
        non-reference-exact fast path cannot drift silently."""
        import rgbd_gan_tpu.ops.bilinear_pallas as bp
        import rgbd_gan_tpu.ops.trilinear_pallas as tp
        from test_deepvoxels_trainer import dv_config

        # route the CPU run through the kernel in interpret mode
        monkeypatch.setattr(bp, "pallas_available", lambda: True)
        real_lift = tp.trilinear_lift

        def interpret_lift(voxel, vox, ib, interpret=False, dtype=None, window=None):
            return real_lift(voxel, vox, ib, True, dtype, window)

        monkeypatch.setattr(tp, "trilinear_lift", interpret_lift)

        config = dv_config(
            tmp_path, occlusion_type="deepvoxels", lift_mode="pallas_win",
            iteration=1, snapshot_interval=100, ch=16, batchsize=2,
        )
        row = self._trainer_first_step(config, 64)
        got = {
            k: float(row[k])
            for k in ["gen/loss_adv", "dis/loss_adv", "dis/loss_gp"]
        }
        self._check_pin("deepvoxels_pallas_win_interpret", got)
