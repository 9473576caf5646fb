"""bf16 mixed-precision path: finiteness, dtype discipline, f32 proximity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.models import Discriminator, StyleGANGenerator, stylegan_make_hidden

CH = 32
B = 4


def _theta9(b):
    return jnp.zeros((b, 9))


class TestBF16Generator:
    def test_output_is_f32_and_close_to_f32_path(self):
        z = stylegan_make_hidden(jax.random.PRNGKey(0), B, CH)
        gen32 = StyleGANGenerator(CH, rgbd=True)
        params = gen32.init(jax.random.PRNGKey(1), z, _theta9(B), method=gen32.init_all)
        gen16 = StyleGANGenerator(CH, rgbd=True, compute_dtype=jnp.bfloat16)

        x32 = gen32.apply(params, z, 6, jnp.float32(0.0), _theta9(B))
        x16 = gen16.apply(params, z, 6, jnp.float32(0.0), _theta9(B))
        assert x16.dtype == jnp.float32  # heads compute/emit f32
        assert np.all(np.isfinite(np.asarray(x16)))
        # same params, bf16 trunk: outputs agree to bf16 tolerance
        diff = np.abs(np.asarray(x16[..., :3]) - np.asarray(x32[..., :3]))
        scale = np.abs(np.asarray(x32[..., :3])).mean() + 1e-3
        assert diff.mean() / scale < 0.15
        # depth head is f32: inverse depth stays well-conditioned near 1.0
        assert np.all(np.asarray(x16[..., -1]) > 0)

    def test_bf16_discriminator(self):
        dis32 = Discriminator(ch=CH, res=True)
        params = dis32.init(jax.random.PRNGKey(0), jnp.ones((2, 4, 4, 3)), method=dis32.init_all)
        dis16 = Discriminator(ch=CH, res=True, compute_dtype=jnp.bfloat16)
        x = jax.random.uniform(jax.random.PRNGKey(1), (B, 32, 32, 3), minval=-1, maxval=1)
        y32 = dis32.apply(params, x, 6, jnp.float32(0.0))
        y16 = dis16.apply(params, x, 6, jnp.float32(0.0))
        assert y16.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(y16)))
        # logits close between precisions on the same params
        assert np.abs(np.asarray(y16) - np.asarray(y32)).mean() < (
            np.abs(np.asarray(y32)).mean() * 0.3 + 0.1
        )

    def test_bf16_gradients_finite(self):
        z = stylegan_make_hidden(jax.random.PRNGKey(0), B, CH)
        gen16 = StyleGANGenerator(CH, rgbd=True, compute_dtype=jnp.bfloat16)
        params = gen16.init(jax.random.PRNGKey(1), z, _theta9(B), method=gen16.init_all)

        def loss(p):
            x = gen16.apply(p, z, 6, jnp.float32(0.0), _theta9(B))
            return jnp.mean(x[..., :3] ** 2) + jnp.mean(1.0 / x[..., -1])

        g = jax.grad(lambda p: loss(p))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # grads land in f32 (master weights stay full precision)
        assert all(np.asarray(l).dtype == np.float32 for l in leaves)


class TestBF16DeepVoxels:
    def test_deepvoxels_mixed16_step_finite_and_close(self, tmp_path):
        """mixed16: True runs the voxel stack / refiner / D in bf16 (the
        frustum lift + occlusion reasoning stay f32 — models/deepvoxels.py
        docstring); one production step must stay finite and land near the
        f32 step on the same seed."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_deepvoxels_trainer import dv_config
        from rgbd_gan_tpu.data.dataset import synthetic_dataset
        from rgbd_gan_tpu.train.trainer import Trainer

        losses = {}
        for mixed16 in (False, True):
            # iteration=2: the rotate loss only engages from the second step
            # (start_rotation=0 -> use_rotate when iteration > 1)
            config = dv_config(
                tmp_path, iteration=2, ch=16, snapshot_interval=100,
                mixed16=mixed16, out=str(tmp_path / f"out{int(mixed16)}"),
            )
            data = synthetic_dataset(8, 64)
            t = Trainer(config, dataset=data, seed=0)
            row = t.run()
            for k in ("gen/loss_adv", "dis/loss_adv", "gen/loss_rotate"):
                assert np.isfinite(row[k]), (mixed16, k)
            losses[mixed16] = row["gen/loss_adv"]
        # bf16 trunk, identical seed/params: adversarial loss in the same
        # ballpark (softplus logits; bf16 conv drift stays bounded)
        assert abs(losses[True] - losses[False]) < 0.5 * abs(losses[False]) + 0.2
