"""Data-parallel sharding tests on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.core import Config
from rgbd_gan_tpu.geometry import CameraParamPrior
from rgbd_gan_tpu.models import DCGANGenerator, Discriminator, dcgan_make_hidden
from rgbd_gan_tpu.parallel import DATA_AXIS, make_mesh, shard_train_step
from rgbd_gan_tpu.parallel.mesh import replicate, shard_batch
from rgbd_gan_tpu.train import StepSpec, TrainState, make_optimizer, make_rgbd_train_step

CH = 16
LOCAL_BATCH = 4


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


def _build(axis_name, gather_mode="xla"):
    gen = DCGANGenerator(in_ch=CH, ch=CH * 2, rgbd=True)
    dis = Discriminator(ch=CH, res=True)
    z = dcgan_make_hidden(jax.random.PRNGKey(0), LOCAL_BATCH, CH)
    params_gen = gen.init(jax.random.PRNGKey(1), z, jnp.zeros((LOCAL_BATCH, 9)),
                          method=gen.init_all)["params"]
    params_dis = dis.init(jax.random.PRNGKey(2), jnp.ones((2, 4, 4, 3)),
                          method=dis.init_all)["params"]
    opt_gen = make_optimizer(0.001, 0.0, 0.999)
    opt_dis = make_optimizer(0.003, 0.0, 0.999)
    spec = StepSpec(
        architecture="dcgan", stage_floor=6, batch_size=LOCAL_BATCH,
        use_rotate=True, lambda_geometric=1.0, axis_name=axis_name,
        gather_mode=gather_mode,
    )
    state = TrainState(
        params_gen=params_gen, params_dis=params_dis, opt_map=None,
        opt_gen=opt_gen.init(params_gen), opt_dis=opt_dis.init(params_dis),
        ema_gen=None, sn_state=None, iteration=jnp.int32(0),
    )
    step = make_rgbd_train_step(
        gen, dis, lambda k, n: dcgan_make_hidden(k, n, CH), _prior(),
        None, opt_gen, opt_dis, spec,
    )
    return state, step


class TestShardedStep:
    def test_eight_device_mesh_runs_and_stays_replicated(self):
        assert jax.device_count() == 8, "conftest must fake 8 CPU devices"
        mesh = make_mesh()
        state, step = _build(DATA_AXIS)
        fn = shard_train_step(step, mesh)
        state = replicate(state, mesh)
        x = jax.random.uniform(
            jax.random.PRNGKey(3), (8 * LOCAL_BATCH, 32, 32, 3), minval=-1, maxval=1
        )
        x = shard_batch(x, mesh)
        new_state, metrics = fn(state, x, jnp.float32(0.0), jax.random.PRNGKey(4))
        assert not bool(metrics["nan"])
        assert np.isfinite(float(metrics["gen/loss_adv"]))
        assert int(new_state.iteration) == 1
        # second step composes
        new_state, metrics = fn(new_state, x, jnp.float32(0.0), jax.random.PRNGKey(5))
        assert int(new_state.iteration) == 2

    def test_hybrid_gather_route_runs_sharded(self):
        """The TPU-default 'hybrid' 3D-consistency route (custom-VJP scan
        accumulator, ops/bilinear_gradgather.py) must compile through the
        replication-CHECKED sharded step: the scan's zero-init carry is
        device-invariant while the body output varies over the data axis,
        which the vma checker rejects without the explicit pcast
        (regression: round-3 sharded bench crash)."""
        mesh = make_mesh()
        state, step = _build(DATA_AXIS, gather_mode="hybrid")
        fn = shard_train_step(step, mesh)
        state = replicate(state, mesh)
        x = jax.random.uniform(
            jax.random.PRNGKey(3), (8 * LOCAL_BATCH, 32, 32, 3), minval=-1, maxval=1
        )
        new_state, metrics = fn(state, shard_batch(x, mesh), jnp.float32(0.0),
                                jax.random.PRNGKey(4))
        assert not bool(metrics["nan"])
        assert np.isfinite(float(metrics["gen/loss_rotate"]))
        assert int(new_state.iteration) == 1

    def test_one_device_mesh_matches_unsharded(self):
        """shard_map on a 1-device mesh == plain jit with the axis fold applied."""
        mesh = make_mesh(jax.devices()[:1])
        state_a, step_axis = _build(DATA_AXIS)
        state_b, step_plain = _build(None)
        fn = shard_train_step(step_axis, mesh)
        x = jax.random.uniform(
            jax.random.PRNGKey(3), (LOCAL_BATCH, 32, 32, 3), minval=-1, maxval=1
        )
        key = jax.random.PRNGKey(4)
        sa, ma = fn(replicate(state_a, mesh), shard_batch(x, mesh), jnp.float32(0.0), key)

        # replicate the axis-index key fold by hand for the unsharded step
        folded = jax.random.fold_in(key, 0)
        sb, mb = jax.jit(step_plain)(state_b, x, jnp.float32(0.0), folded)
        for k in ["gen/loss_adv", "gen/loss_rotate", "dis/loss_adv", "dis/loss_gp"]:
            assert float(ma[k]) == pytest.approx(float(mb[k]), rel=1e-5), k
        la = jax.tree_util.tree_leaves(sa.params_gen)
        lb = jax.tree_util.tree_leaves(sb.params_gen)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_nan_guard_is_any_over_devices(self):
        """The pmax'd nan flag must trip when any single device sees a
        non-finite loss (and be identical on every device shard)."""
        mesh = make_mesh()
        state, step = _build(DATA_AXIS)
        fn = shard_train_step(step, mesh)
        x = np.random.RandomState(0).uniform(
            -1, 1, (8 * LOCAL_BATCH, 32, 32, 3)
        ).astype(np.float32)
        x[:LOCAL_BATCH] = np.nan  # poison device 0's shard only
        _, metrics = fn(replicate(state, mesh), shard_batch(x, mesh),
                        jnp.float32(0.0), jax.random.PRNGKey(4))
        assert bool(metrics["nan"])

    def test_devices_draw_different_latents(self):
        """Folded keys must decorrelate per-device pose/latent draws: with 8
        devices the per-device rotate losses differ, so the pmean'd loss
        differs from any single-device run."""
        mesh = make_mesh()
        state, step = _build(DATA_AXIS)
        fn = shard_train_step(step, mesh)
        x = jax.random.uniform(
            jax.random.PRNGKey(3), (8 * LOCAL_BATCH, 32, 32, 3), minval=-1, maxval=1
        )
        _, m8 = fn(replicate(state, mesh), shard_batch(x, mesh), jnp.float32(0.0),
                   jax.random.PRNGKey(4))

        mesh1 = make_mesh(jax.devices()[:1])
        state1, step1 = _build(DATA_AXIS)
        fn1 = shard_train_step(step1, mesh1)
        _, m1 = fn1(replicate(state1, mesh1), shard_batch(x[:LOCAL_BATCH], mesh1),
                    jnp.float32(0.0), jax.random.PRNGKey(4))
        assert float(m8["gen/loss_rotate"]) != pytest.approx(
            float(m1["gen/loss_rotate"]), rel=1e-6
        )


def _assert_shards_identical(tree, what):
    """Every leaf of a replicated output must hold the SAME value on every
    device — the numeric counterpart of the shard_map replication check."""
    leaves = jax.tree_util.tree_leaves(tree)
    assert leaves, f"{what} has no leaves"
    for leaf in leaves:
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(shards) == jax.device_count()
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s, err_msg=what)


class TestMeshAllArchitectures:
    """Full-trainer DP coverage for every architecture with carried state
    collections (VERDICT r2 #1): deepvoxels BatchNorm batch_stats (sync-BN
    policy) and the SN discriminator's power-iteration state must come back
    genuinely replicated from the sharded step."""

    def test_deepvoxels_mesh_bn_stats_replicated(self, tmp_path):
        from test_deepvoxels_trainer import dv_config
        from rgbd_gan_tpu.data.dataset import synthetic_dataset
        from rgbd_gan_tpu.train.trainer import Trainer

        config = dv_config(
            tmp_path, occlusion_type="deepvoxels", use_mpi=True,
            batchsize=16, iteration=1, snapshot_interval=100, ch=16,
        )
        data = synthetic_dataset(16, 64)
        t = Trainer(config, dataset=data, seed=0)
        assert t.use_mesh and t.local_batch == 2
        rows = []
        t.run(log_cb=rows.append)
        assert int(jax.device_get(t.state.iteration)) == 1
        assert np.isfinite(rows[-1]["gen/loss_adv"])
        assert t.state.gen_state is not None
        _assert_shards_identical(t.state.gen_state, "deepvoxels batch_stats")
        _assert_shards_identical(t.state.params_gen, "deepvoxels params_gen")

    def test_stylegan_sn_mesh_sn_state_replicated(self, tmp_path):
        from test_trainer import tiny_config
        from rgbd_gan_tpu.data.dataset import synthetic_dataset
        from rgbd_gan_tpu.train.trainer import Trainer

        config = tiny_config(
            tmp_path, generator_architecture="stylegan", sn=True,
            rotate_feature=True, use_mpi=True, batchsize=16, iteration=1,
            snapshot_interval=100,
        )
        data = synthetic_dataset(16, 32)
        t = Trainer(config, dataset=data, seed=0)
        assert t.use_mesh and t.local_batch == 2
        rows = []
        t.run(log_cb=rows.append)
        assert int(jax.device_get(t.state.iteration)) == 1
        assert np.isfinite(rows[-1]["gen/loss_adv"])
        assert t.state.sn_state is not None
        _assert_shards_identical(t.state.sn_state, "stylegan sn state")
        _assert_shards_identical(t.state.params_dis, "stylegan params_dis")

    # -- windowed (step_window > 1) variants (VERDICT r4 #5): the device-side
    # step window chains K iterations in one compiled program, so the carried
    # collections (sn_state / batch_stats) flow through a lax-scan carry under
    # the replication-CHECKED shard_map out_specs — these legs fail loudly if
    # the window x carried-state x checked-replication interaction regresses.

    def test_deepvoxels_mesh_windowed_bn_stats_replicated(self, tmp_path):
        from test_deepvoxels_trainer import dv_config
        from rgbd_gan_tpu.data.dataset import synthetic_dataset
        from rgbd_gan_tpu.train.trainer import Trainer

        config = dv_config(
            tmp_path, occlusion_type="deepvoxels", use_mpi=True,
            batchsize=16, iteration=2, step_window=2,
            snapshot_interval=100, ch=16,
        )
        data = synthetic_dataset(16, 64)
        t = Trainer(config, dataset=data, seed=0)
        assert t.use_mesh and t.local_batch == 2
        rows = []
        t.run(log_cb=rows.append)
        assert int(jax.device_get(t.state.iteration)) == 2
        assert np.isfinite(rows[-1]["gen/loss_adv"])
        assert t.state.gen_state is not None
        _assert_shards_identical(t.state.gen_state, "windowed dv batch_stats")
        _assert_shards_identical(t.state.params_gen, "windowed dv params_gen")

    def test_stylegan_sn_mesh_windowed_sn_state_replicated(self, tmp_path):
        from test_trainer import tiny_config
        from rgbd_gan_tpu.data.dataset import synthetic_dataset
        from rgbd_gan_tpu.train.trainer import Trainer

        config = tiny_config(
            tmp_path, generator_architecture="stylegan", sn=True,
            rotate_feature=True, use_mpi=True, batchsize=16, iteration=2,
            step_window=2, snapshot_interval=100,
        )
        data = synthetic_dataset(16, 32)
        t = Trainer(config, dataset=data, seed=0)
        assert t.use_mesh and t.local_batch == 2
        rows = []
        t.run(log_cb=rows.append)
        assert int(jax.device_get(t.state.iteration)) == 2
        assert np.isfinite(rows[-1]["gen/loss_adv"])
        assert t.state.sn_state is not None
        _assert_shards_identical(t.state.sn_state, "windowed sn state")
        _assert_shards_identical(t.state.params_dis, "windowed params_dis")
