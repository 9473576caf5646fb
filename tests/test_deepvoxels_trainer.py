import os

import numpy as np
import pytest

from rgbd_gan_tpu.data.dataset import synthetic_dataset
from rgbd_gan_tpu.train.trainer import Trainer

from test_trainer import tiny_config


def dv_config(tmp_path, **overrides):
    cfg = dict(
        generator_architecture="deepvoxels",
        batchsize=4,
        ch=32,
        iteration=2,
        start_rotation=0,
        start_occlusion_aware=0,
        occlusion_type="accumulative",
        uniform_distribution=True,
        focal_loss_gamma=2.0,
        snapshot_interval=2,
        stage_interval="0,0,0,0,0,0,0,0",
        max_stage=11,
    )
    cfg.update(overrides)
    return tiny_config(tmp_path, **cfg)


class TestDeepVoxelsTrainer:
    def test_two_iterations_end_to_end(self, tmp_path):
        config = dv_config(tmp_path)
        data = synthetic_dataset(8, 64)
        t = Trainer(config, dataset=data, seed=0)
        rows = []
        t.run(log_cb=rows.append)
        assert int(t.state.iteration) == 2
        for row in rows:
            assert np.isfinite(row["gen/loss_adv"])
            assert np.isfinite(row["dis/loss_adv"])
            assert row["image_size"] == 64.0
            assert row["stage"] == 8.5
        # second iteration engages the rotate loss (start_rotation=0 ->
        # use_rotate from iteration 1, like the reference's `iteration > 0`)
        assert "gen/loss_rotate" in rows[-1]
        # accumulative occlusion has no BatchNorm -> no carried gen state
        assert t.state.gen_state is None

    def test_softmax_occlusion_carries_bn_stats(self, tmp_path):
        config = dv_config(tmp_path, occlusion_type="deepvoxels", iteration=1)
        data = synthetic_dataset(8, 64)
        t = Trainer(config, dataset=data, seed=0)
        rows = []
        t.run(log_cb=rows.append)
        assert t.state.gen_state is not None
        assert np.isfinite(rows[-1]["gen/loss_adv"])

    def test_snapshot_includes_map_artifact(self, tmp_path):
        config = dv_config(tmp_path, occlusion_type="deepvoxels")
        data = synthetic_dataset(8, 64)
        t = Trainer(config, dataset=data, seed=0)
        t.run()
        assert os.path.exists(os.path.join(config.out, "Map_2.npz"))
        assert os.path.exists(os.path.join(config.out, "Generator_2.npz"))

        # resume round-trips the BN stats too
        config2 = dv_config(tmp_path, occlusion_type="deepvoxels", iteration=3,
                            auto_resume=True, snapshot_interval=100)
        t2 = Trainer(config2, dataset=data, seed=1)
        assert t2.resume()
        assert int(t2.state.iteration) == 2
        a = np.asarray(list(np.asarray(x) for x in
                            __import__("jax").tree_util.tree_leaves(t.state.gen_state))[0])
        b = np.asarray(list(np.asarray(x) for x in
                            __import__("jax").tree_util.tree_leaves(t2.state.gen_state))[0])
        np.testing.assert_allclose(a, b)


def test_eval_forward_accepts_non_grid_batch(tmp_path):
    """gen_apply_eval must handle batches that are not preview-grid shaped
    (8-column multiples) — tools/validate_3d_structure.py sweeps feed
    rows*cols batches like 10 (regression: reshape ValueError)."""
    import jax.numpy as jnp

    from rgbd_gan_tpu.geometry.camera import camera_matrices, theta_to_9dof

    config = dv_config(tmp_path, iteration=0)
    t = Trainer(config, dataset=synthetic_dataset(8, 64), seed=0)
    for n in (5, 8):  # non-grid and grid-shaped
        z = jnp.asarray(t.make_hidden_np(np.random.RandomState(0), n))
        theta6 = jnp.zeros((n, 6), jnp.float32)
        x = t.gen_apply_eval(
            z, 8, jnp.float32(0.0), theta_to_9dof(theta6), camera_matrices(theta6)
        )
        assert x.shape == (n, 64, 64, 4)


def test_r1_interval_unsupported_raises(tmp_path):
    """lazy R1 is implemented for the rgbd/rgb steps only; the deepvoxels
    step ignores the interval, so the Trainer must fail fast rather than
    silently train with R1 every step at 1x weight (ADVICE r3)."""
    config = dv_config(tmp_path, r1_interval=2)
    with pytest.raises(ValueError, match="r1_interval"):
        Trainer(config, dataset=synthetic_dataset(8, 64), seed=0)
