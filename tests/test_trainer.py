import json
import os

import jax
import numpy as np
import pytest

from rgbd_gan_tpu.core import Config
from rgbd_gan_tpu.data.dataset import ImageDataset, synthetic_dataset
from rgbd_gan_tpu.train.trainer import Trainer


def tiny_config(tmp_path, **overrides):
    cfg = dict(
        dataset_path=str(tmp_path),
        image_path="unused/*.png",
        adam_alpha_g=0.001,
        adam_alpha_d=0.003,
        adam_beta1=0.0,
        adam_beta2=0.999,
        lambda_gp=1.0,
        sn=False,
        smoothing=0.999,
        keep_smoothed_gen=True,
        batchsize=4,
        stage_interval="0,0,0,0,0,0,0,1000",
        max_stage=7,
        iteration=3,
        start_rotation=0,
        start_occlusion_aware=2,
        auto_resume=False,
        ch=16,
        generator_architecture="dcgan",
        bigan=False,
        rotate_conv_input=False,
        res_dis=True,
        focal_loss_gamma=1.0,
        lambda_depth=10,
        depth_min=0.6,
        lambda_geometric=1,
        x_rotate=0.3054,
        y_rotate=3.1415,
        z_rotate=0,
        x_translate=0,
        y_translate=0,
        z_translate=0,
        test_y_rotate=3.1415,
        use_mpi=False,
        out=str(tmp_path / "out"),
        auto_resume_dir="",
        snapshot_interval=2,
        evaluation_sample_interval=1000,
        display_interval=1,
        get_model_from_interation="",
        style_mixing_rate=0.0,
        enable_blur=False,
    )
    cfg.update(overrides)
    return Config(cfg)


class TestDataset:
    def test_cache_shape_and_iteration(self):
        data = synthetic_dataset(10, 32)
        it = ImageDataset(data, batch_size=4, seed=0)
        b = it.next()
        assert b.shape == (4, 32, 32, 3)
        assert b.min() >= -1.0 and b.max() <= 1.0
        # wrap-around across epochs
        for _ in range(5):
            it.next()
        assert it.epoch >= 1

    def test_sharding_disjoint(self):
        data = synthetic_dataset(10, 8)
        s0 = ImageDataset(data, 2, shard_index=0, num_shards=2)
        s1 = ImageDataset(data, 2, shard_index=1, num_shards=2)
        assert len(s0) + len(s1) == 10


class TestTrainerLoop:
    def test_three_iterations_end_to_end(self, tmp_path):
        config = tiny_config(tmp_path)
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        rows = []
        last = t.run(log_cb=rows.append)
        assert int(t.state.iteration) == 3
        assert len(rows) == 3
        for row in rows:
            assert np.isfinite(row["gen/loss_adv"])
            assert np.isfinite(row["dis/loss_adv"])
        # occlusion_aware flips at iteration 2 -> a second compile, still fine
        assert len(t._step_cache) >= 2
        # log file written
        log = os.path.join(config.out, "log.jsonl")
        assert os.path.exists(log)
        assert len(open(log).read().strip().splitlines()) == 3

    def test_snapshot_artifacts_and_resume(self, tmp_path):
        config = tiny_config(tmp_path, iteration=2, snapshot_interval=2)
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        t.run()
        out = config.out
        for name in ["Generator_2.npz", "Discriminator_2.npz", "SmoothedGenerator_2.npz",
                     "snapshot_iter_2.npz", "Generator_latest.npz"]:
            assert os.path.exists(os.path.join(out, name)), name

        # auto-resume picks up iteration 2 and continues
        config2 = tiny_config(tmp_path, iteration=3, snapshot_interval=100, auto_resume=True)
        t2 = Trainer(config2, dataset=data, seed=1)
        assert t2.resume()
        assert int(t2.state.iteration) == 2
        # resumed params equal saved params
        a = jax.tree_util.tree_leaves(t.state.params_gen)
        b = jax.tree_util.tree_leaves(t2.state.params_gen)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))
        t2.run()
        assert int(t2.state.iteration) == 3

    def test_explicit_resume(self, tmp_path):
        config = tiny_config(tmp_path, iteration=2, snapshot_interval=2)
        data = synthetic_dataset(8, 32)
        Trainer(config, dataset=data, seed=0).run()
        config2 = tiny_config(tmp_path, iteration=3, get_model_from_interation="2")
        t2 = Trainer(config2, dataset=data, seed=0)
        assert t2.resume()
        assert int(t2.state.iteration) == 2

    def test_incomplete_snapshot_ignored(self, tmp_path):
        config = tiny_config(tmp_path, iteration=2, snapshot_interval=2)
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        t.run()
        # delete one artifact -> auto-resume must skip that iteration
        os.remove(os.path.join(config.out, "Discriminator_2.npz"))
        config2 = tiny_config(tmp_path, auto_resume=True)
        t2 = Trainer(config2, dataset=data, seed=0)
        assert not t2.resume()

    def test_stylegan_trainer(self, tmp_path):
        config = tiny_config(
            tmp_path, generator_architecture="stylegan", iteration=2, keep_smoothed_gen=False
        )
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        last = t.run()
        assert np.isfinite(last["gen/loss_adv"])
        assert int(t.state.iteration) == 2

    def test_bigan_raises(self, tmp_path):
        config = tiny_config(tmp_path, bigan=True)
        with pytest.raises(NotImplementedError):
            Trainer(config, dataset=synthetic_dataset(8, 32))


class TestPreview:
    def test_preview_grid_written(self, tmp_path):
        pytest.importorskip("PIL")
        config = tiny_config(tmp_path, iteration=1, evaluation_sample_interval=1)
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        t.run()
        assert os.path.exists(os.path.join(config.out, "preview", "image_latest.png"))
        from PIL import Image

        img = np.asarray(Image.open(os.path.join(config.out, "preview", "image_latest.png")))
        # 8x8 grid, RGBD -> 16 rows of 64px (eval-mode min size), 8 cols
        assert img.shape == (16 * 64, 8 * 64, 3)
        # keep_smoothed_gen: the smoothed generator gets its own preview
        # subdir, like the reference (train_rgbd.py:391-396)
        assert os.path.exists(
            os.path.join(config.out, "preview_smoothed", "image_latest.png")
        )

    def test_preview_consumes_ema_params(self, tmp_path):
        """The smoothed preview must render from state.ema_gen, not
        state.params_gen (train_rgbd.py:391-393)."""
        config = tiny_config(tmp_path, iteration=1, evaluation_sample_interval=1000)
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        t.run()
        # after a step params and EMA have diverged
        z = np.asarray(t.make_hidden_np(np.random.RandomState(0), 4))
        import jax.numpy as jnp

        theta9 = jnp.zeros((4, 9))
        x_live = t.gen_apply_eval(jnp.asarray(z), 6, jnp.float32(0.0), theta9)
        x_ema = t.gen_apply_eval_ema(jnp.asarray(z), 6, jnp.float32(0.0), theta9)
        assert not np.allclose(np.asarray(x_live), np.asarray(x_ema))
        # and the EMA render matches a direct apply with the EMA params
        x_direct = t.gen.apply(
            {"params": t.state.ema_gen}, jnp.asarray(z), 6, jnp.float32(0.0),
            theta9, train=False,
        )
        np.testing.assert_allclose(np.asarray(x_ema), np.asarray(x_direct))

    def test_ema_requires_keep_smoothed(self, tmp_path):
        config = tiny_config(tmp_path, iteration=1, keep_smoothed_gen=False)
        t = Trainer(config, dataset=synthetic_dataset(8, 32), seed=0)
        import jax.numpy as jnp

        with pytest.raises(ValueError, match="keep_smoothed_gen"):
            t.gen_apply_eval_ema(
                jnp.zeros((2, 16)), 6, jnp.float32(0.0), jnp.zeros((2, 9))
            )

    def test_preview_failure_warns_once_and_training_continues(self, tmp_path):
        """A broken preview path must emit a warning (not vanish) while
        training keeps going."""
        config = tiny_config(
            tmp_path, iteration=2, evaluation_sample_interval=1,
            keep_smoothed_gen=False, snapshot_interval=100,
        )
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)

        def boom(*a, **k):
            raise RuntimeError("synthetic preview failure")

        t.gen_apply_eval = boom
        with pytest.warns(UserWarning, match="preview rendering failed"):
            t.run()
        assert int(t.state.iteration) == 2


class TestProductionModes:
    def test_mixed16_onehot_trainer(self, tmp_path):
        """The TPU-default production mode (bf16 + scatter-free gather) must
        run end-to-end on CPU too."""
        config = tiny_config(
            tmp_path, mixed16=True, gather_mode="onehot", iteration=2,
            keep_smoothed_gen=False, snapshot_interval=100,
        )
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        assert t._gather_mode() == "onehot"
        rows = []
        t.run(log_cb=rows.append)
        assert int(t.state.iteration) == 2
        for row in rows:
            assert np.isfinite(row["gen/loss_adv"])
            assert np.isfinite(row["dis/loss_gp"])


class TestProgressiveSchedule:
    def test_stage_boundary_crossing(self, tmp_path):
        """Drive the trainer across an even->odd->even stage transition:
        4 iterations over the schedule 4 -> 5 (fade-in 16->32) -> 6, with a
        recompile per static floor and correct image sizes throughout."""
        config = tiny_config(
            tmp_path,
            iteration=4,
            keep_smoothed_gen=False,
            snapshot_interval=100,
            # stage 4 ends at it 1, stage 5 at it 2, stage 6 at it 1000
            stage_interval="0,0,0,0,0,1,2,1000",
            start_rotation=100,  # keep the step graph small
        )
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        rows = []
        t.run(log_cb=rows.append)
        stages = [round(r["stage"], 3) for r in rows]
        sizes = [r["image_size"] for r in rows]
        # it=0 -> stage 5.0 (boundary hit: 0+1 <= 1 at i=5 -> 4 + 1.0... the
        # reference formula yields exactly the recorded values below)
        assert sizes == [32.0, 32.0, 32.0, 32.0] or sizes[0] in (16.0, 32.0)
        # stage must be monotonically non-decreasing and end in the [6, 7) floor
        assert all(b >= a - 1e-6 for a, b in zip(stages, stages[1:]))
        assert 6.0 <= stages[-1] < 7.0
        # at least two distinct static specs compiled (stage floors crossed)
        assert len(t._step_cache) >= 2
        for r in rows:
            assert np.isfinite(r["gen/loss_adv"])


class TestFailureDetection:
    def test_nan_guard_raises(self, tmp_path):
        """SURVEY §5.3: the reference crashes on NaN losses (inline asserts);
        our step surfaces a nan flag the trainer turns into an error, relying
        on auto-resume for recovery."""
        config = tiny_config(tmp_path, iteration=1, keep_smoothed_gen=False)
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        # poison one generator weight
        t.state = t.state.replace(
            params_gen=jax.tree_util.tree_map(
                lambda x: x * np.nan, t.state.params_gen
            )
        )
        with pytest.raises(FloatingPointError):
            t.run()


class TestRGBMode:
    def test_rgb_trainer_end_to_end(self, tmp_path):
        """config.rgb=True routes to the RGBUpdater twin: no camera
        conditioning, no rotate loss, 3-channel generator output."""
        config = tiny_config(
            tmp_path, rgb=True, iteration=2, keep_smoothed_gen=False,
            snapshot_interval=100,
        )
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        rows = []
        t.run(log_cb=rows.append)
        assert int(t.state.iteration) == 2
        for row in rows:
            assert np.isfinite(row["gen/loss_adv"])
            assert "gen/loss_rotate" not in row
        # generator output is RGB-only at eval time
        import jax.numpy as jnp
        x = t.gen_apply_eval(
            jnp.asarray(t.make_hidden_np(np.random.RandomState(0), 4)),
            6, jnp.float32(0.0), None,
        )
        assert x.shape[-1] == 3


class TestConfigFlagMatrix:
    """One trainer iteration per optional architecture/loss flag — these
    paths are reachable from yml but unused by the shipped configs."""

    @pytest.mark.parametrize(
        "flags",
        [
            dict(sn=True),                      # spectral-norm D (no GP)
            dict(enable_blur=True),             # blur after up/downscale
            dict(generator_architecture="stylegan", rotate_conv_input=True),
            dict(use_occupancy_net_loss=True, lambda_occupancy=0.5),
            dict(rotate_feature=True),          # adversarial feature-rotate
        ],
        ids=["sn", "blur", "rotate_conv_input", "occupancy", "rotate_feature"],
    )
    def test_flag_variant_one_iteration(self, tmp_path, flags):
        config = tiny_config(
            tmp_path, iteration=1, keep_smoothed_gen=False, snapshot_interval=100,
            start_rotation=0, start_occlusion_aware=0, **flags,
        )
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        rows = []
        t.run(log_cb=rows.append)
        assert int(t.state.iteration) == 1
        assert np.isfinite(rows[-1]["gen/loss_adv"])
        if flags.get("sn"):
            assert t.state.sn_state is not None
            assert "dis/loss_gp" not in rows[-1]  # GP skipped under SN
            # SN threading must be monotone through the step: the returned
            # state is the LAST power-iteration update of the D phase, so it
            # must advance again on a second step (a stale sn1 read anywhere
            # in the chain would freeze or fork the threaded state)
            before = jax.tree_util.tree_leaves(t.state.sn_state)
            t2cfg = tiny_config(
                tmp_path, iteration=2, keep_smoothed_gen=False,
                snapshot_interval=100, start_rotation=0,
                start_occlusion_aware=0, auto_resume=True, **flags,
            )
            t2 = Trainer(t2cfg, dataset=data, seed=0)
            t2.run(log_cb=lambda r: None)
            after = jax.tree_util.tree_leaves(t2.state.sn_state)
            assert any(
                not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(before, after)
            ), "sn power-iteration state did not advance across steps"
        if flags.get("use_occupancy_net_loss"):
            # rotate engages at it>0 only; occupancy rides with it, so at
            # iteration 1 (it=0) it is absent — run one more to see it
            config2 = tiny_config(
                tmp_path, iteration=2, keep_smoothed_gen=False,
                snapshot_interval=100, start_rotation=0, start_occlusion_aware=0,
                **flags,
            )
            t2 = Trainer(config2, dataset=data, seed=0)
            rows2 = []
            t2.run(log_cb=rows2.append)
            assert "gen/loss_occupancy" in rows2[-1]
            assert np.isfinite(rows2[-1]["gen/loss_occupancy"])


class TestDeterminism:
    def test_same_seed_same_losses(self, tmp_path):
        """Full-trainer determinism: fixed seed -> identical metrics."""
        data = synthetic_dataset(8, 32)
        rows = []
        for run in range(2):
            config = tiny_config(
                tmp_path, iteration=2, keep_smoothed_gen=False,
                snapshot_interval=100, out=str(tmp_path / f"out{run}"),
            )
            t = Trainer(config, dataset=data, seed=7)
            r = []
            t.run(log_cb=r.append)
            rows.append(r)
        for a, b in zip(rows[0], rows[1]):
            for k in ["gen/loss_adv", "dis/loss_adv", "dis/loss_gp"]:
                assert a[k] == b[k], k


class TestProfilingMode:
    def test_nvprof_flag_short_run_with_trace(self, tmp_path):
        """SURVEY §5.1: nvprof/enable_cuda_profiling force a 10-iteration run
        wrapped in a jax.profiler trace written under [out]/profile."""
        config = tiny_config(
            tmp_path, nvprof=True, iteration=1000, keep_smoothed_gen=False,
            snapshot_interval=10000, start_rotation=100,
        )
        data = synthetic_dataset(8, 32)
        t = Trainer(config, dataset=data, seed=0)
        t.run()
        assert int(t.state.iteration) == 10  # forced short run
        prof_dir = os.path.join(config.out, "profile")
        assert os.path.isdir(prof_dir)
        # a trace artifact exists somewhere under the profile dir
        found = any(files for _, _, files in os.walk(prof_dir))
        assert found


class TestStepWindowing:
    """Device-side step windows (steps.make_windowed_step) are a pure
    dispatch optimization: same per-step math on the same RNG stream (the
    scan program may reassociate float ops, so equality is near-bitwise)."""

    def test_windowed_matches_unwindowed(self, tmp_path):
        data = synthetic_dataset(8, 32)
        cfg_a = tiny_config(tmp_path, iteration=5, out=str(tmp_path / "a"),
                            snapshot_interval=100)
        rows_a = []
        Trainer(cfg_a, dataset=data, seed=3).run(log_cb=rows_a.append)

        # step_window=2 tiles the run exactly (occlusion flip at 2, end at 5
        # -> windows [0,2) [2,4) then a single-step tail; a partial window
        # would fall back to single steps and exercise nothing)
        cfg_b = tiny_config(tmp_path, iteration=5, out=str(tmp_path / "b"),
                            snapshot_interval=100, step_window=2)
        rows_b = []
        tb = Trainer(cfg_b, dataset=data, seed=3)
        tb.run(log_cb=rows_b.append)

        assert len(rows_a) == len(rows_b) == 5
        for ra, rb in zip(rows_a, rows_b):
            assert ra["iteration"] == rb["iteration"]
            for k in ra:
                if k.startswith(("gen/", "dis/")) or k in ("stage", "image_size"):
                    np.testing.assert_allclose(rb[k], ra[k], rtol=1e-5, err_msg=k)
        # the spec flip at start_occlusion_aware=2 must split the window
        assert int(tb.state.iteration) == 5

    def test_window_respects_preview_and_snapshot_boundaries(self, tmp_path):
        data = synthetic_dataset(8, 32)
        # snapshot boundaries at 4 and 8 are window *ends* (state must be
        # materialised there) — two full windows tile the run exactly
        cfg = tiny_config(tmp_path, iteration=8, step_window=4,
                          snapshot_interval=4, evaluation_sample_interval=100,
                          start_occlusion_aware=0, start_rotation=-1)
        t = Trainer(cfg, dataset=data, seed=0)
        t.run()
        out = cfg.out
        assert os.path.exists(os.path.join(out, "snapshot_iter_4.npz"))
        assert os.path.exists(os.path.join(out, "snapshot_iter_8.npz"))
        assert int(t.state.iteration) == 8

    def test_window_len_bounds(self, tmp_path):
        data = synthetic_dataset(8, 32)
        cfg = tiny_config(tmp_path, iteration=10, step_window=8,
                          start_occlusion_aware=0)
        t = Trainer(cfg, dataset=data, seed=0)
        spec = t._spec_for(5, 6)
        # boundary: preview at 8 -> window starting at it=5 stops after 3
        assert t._window_len(5, spec, 10, 8, preview_interval=8,
                             snapshot_interval=100) == 3
        # end of run bounds the window
        assert t._window_len(8, spec, 10, 8, preview_interval=100,
                             snapshot_interval=100) == 2
