"""DeepVoxels train step — the TPU twin of ``updater_deepvoxels.py:76-252``.

Differences from the RGBD step, all faithful to the reference:

- stage is pinned at 8.5 -> the progressive discriminator runs its even
  stage 8 graph at a fixed 64x64 (``updater_deepvoxels.py:105-106``)
- the generator adversarial loss *does* use ``focal_loss_gamma``
  (``updater_deepvoxels.py:170``; the RGBD updater leaves it at 0)
- the 3D-consistency loss uses the projection intrinsic as K
  (``updater_deepvoxels.py:92``) and its weight is fixed at 0.3 — the yml
  key in the reference is typo'd (``lambda_loss_rotatec``) so the override
  can never engage (``updater_deepvoxels.py:202``)
- the depth floor term is added unconditionally under ``use_rotate``
  (``updater_deepvoxels.py:198``)
- with a background generator, the rotate loss splits into a foreground
  term (real matrices, ``max_depth=3``) plus a background term
  (zero-translation matrices, ``min_depth=3``; ``updater_deepvoxels.py:176-190``)
- the discriminator phase renders *fresh, unpaired* latents through the
  *updated* generator (``updater_deepvoxels.py:221-228``) instead of reusing
  the G-phase fakes
- the mapping network is updated twice per step: by its own alpha/100
  optimizer and again inside the whole-generator optimizer
  (``train_rgbd.py:335-343`` wires both over the mapping) — quirk preserved
- occlusion nets carry BatchNorm batch statistics: the generator's
  ``batch_stats`` collection is threaded through the step (both forwards
  update it, matching Chainer train-mode BN)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..geometry.camera import camera_matrices, theta_to_9dof
from ..geometry.warp import rotate_consistency_loss
from ..models.deepvoxels import PROJECTION_INTRINSIC
from .ema import soft_copy_params
from .losses import dis_adv_loss, dis_out_and_r1, gen_adv_loss
from .state import TrainState
from .steps import StepSpec, _dis_apply, _pany, _pmean, _to_unit_range

DEEPVOXELS_STAGE = 8  # floor of the pinned 8.5
IMG_SIZE = 64
LAMBDA_ROTATE_FIXED = 0.3  # typo'd yml key makes this unoverridable


def _avg_pool_to(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """``downsize_real`` for deepvoxels: plain avg-pool to 64
    (``updater_deepvoxels.py:23-26``)."""
    scale = x.shape[1] // size
    if scale <= 1:
        return x
    b, h, w, c = x.shape
    return x.reshape(b, size, scale, size, scale, c).mean(axis=(2, 4))


def make_deepvoxels_train_step(
    gen,
    dis,
    make_hidden: Callable[[jax.Array, int], jnp.ndarray],
    prior,
    opt_map: optax.GradientTransformation,
    opt_gen: optax.GradientTransformation,
    opt_dis: optax.GradientTransformation,
    spec: StepSpec,
    focal_loss_gamma: float = 0.0,
    background_generator: bool = False,
):
    half = spec.batch_size // 2
    base_k = jnp.asarray(PROJECTION_INTRINSIC)

    def gen_apply(params, gen_state, z, mats, z2, theta9, kz3=None):
        variables = {"params": params}
        if gen_state is not None:
            variables["batch_stats"] = gen_state
        z3 = z4 = None
        if background_generator:
            k3, k4 = jax.random.split(kz3)
            z3 = make_hidden(k3, z.shape[0])
            z4 = make_hidden(k4, z.shape[0])
        if gen_state is None:  # occlusion net without BatchNorm (accumulative)
            return gen.apply(variables, z, mats, z2, theta9, z3, z4), None
        out, new_vars = gen.apply(
            variables, z, mats, z2, theta9, z3, z4, mutable=["batch_stats"]
        )
        return out, new_vars["batch_stats"]

    def step(state: TrainState, x_real_full: jnp.ndarray, alpha, key: jax.Array):
        if spec.axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(spec.axis_name))
        kz, kz2, ktheta, kz3, kdz, kdz2, kdz3 = jax.random.split(key, 7)

        # paired latents for BOTH styles (updater_deepvoxels.py:146-148)
        z = jnp.tile(make_hidden(kz, half), (2, 1))
        z2 = jnp.tile(make_hidden(kz2, half), (2, 1))
        thetas6 = prior.sample(ktheta, spec.batch_size)
        mats = camera_matrices(thetas6)
        theta9 = theta_to_9dof(thetas6)

        x_real = _avg_pool_to(_to_unit_range(x_real_full), IMG_SIZE)

        # ---------------- generator phase ----------------
        def gen_loss_fn(params_gen):
            x_fake, bs1 = gen_apply(params_gen, state.gen_state, z, mats, z2, theta9, kz3)
            y_fake, sn1 = _dis_apply(
                dis, state.params_dis, state.sn_state,
                x_fake[..., :3], DEEPVOXELS_STAGE, alpha, mutable_sn=True,
            )
            loss = gen_adv_loss(y_fake, focal_loss_gamma)
            metrics = {"gen/loss_adv": loss}

            if spec.use_rotate:
                if background_generator:
                    loss_fore, _ = rotate_consistency_loss(
                        x_fake[:half], mats[:half], x_fake[half:], mats[half:],
                        lambda_geometric=spec.lambda_geometric, base_k=base_k,
                        max_depth=3.0, exact_bilinear=spec.exact_bilinear,
                        gather_mode=spec.gather_mode,
                    )
                    virtual = mats.at[:, :3, 3].set(0.0)
                    loss_back, _ = rotate_consistency_loss(
                        x_fake[:half], virtual[:half], x_fake[half:], virtual[half:],
                        lambda_geometric=spec.lambda_geometric, base_k=base_k,
                        min_depth=3.0, exact_bilinear=spec.exact_bilinear,
                        gather_mode=spec.gather_mode,
                    )
                    loss_rotate = loss_fore + loss_back
                else:
                    loss_rotate, _ = rotate_consistency_loss(
                        x_fake[:half], mats[:half], x_fake[half:], mats[half:],
                        lambda_geometric=spec.lambda_geometric, base_k=base_k,
                        exact_bilinear=spec.exact_bilinear,
                        gather_mode=spec.gather_mode,
                    )
                loss_rotate = loss_rotate + spec.lambda_depth * jnp.mean(
                    jax.nn.relu(spec.depth_min - x_fake[..., -1]) ** 2
                )
                metrics["gen/loss_rotate"] = loss_rotate
                loss = loss + loss_rotate * LAMBDA_ROTATE_FIXED

            return loss, (bs1, sn1, metrics)

        (loss_gen, (gen_state, sn1, gen_metrics)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.params_gen)
        grads = _pmean(grads, spec.axis_name)

        # mapping double-update quirk: map optimizer first, then the
        # whole-generator optimizer over the same grads
        params_gen = dict(state.params_gen)
        up_map, opt_map_state = opt_map.update(
            grads["mapping"], state.opt_map, params_gen["mapping"]
        )
        params_gen["mapping"] = optax.apply_updates(params_gen["mapping"], up_map)
        up_gen, opt_gen_state = opt_gen.update(grads, state.opt_gen, params_gen)
        params_gen = optax.apply_updates(params_gen, up_gen)

        ema_gen = state.ema_gen
        if spec.keep_smoothed_gen and ema_gen is not None:
            ema_gen = soft_copy_params(ema_gen, params_gen, 1.0 - spec.smoothing)

        # ---------------- discriminator phase ----------------
        # fresh unpaired latents through the *updated* generator
        z_d = make_hidden(kdz, spec.batch_size)
        z2_d = make_hidden(kdz2, spec.batch_size)
        x_fake_d, gen_state = gen_apply(params_gen, gen_state, z_d, mats, z2_d, theta9, kdz3)
        x_fake_rgb = jax.lax.stop_gradient(x_fake_d[..., :3])

        def dis_loss_fn(params_dis):
            y_fake, sn2 = _dis_apply(
                dis, params_dis, sn1, x_fake_rgb, DEEPVOXELS_STAGE, alpha, mutable_sn=True
            )
            metrics = {}
            if not spec.sn and spec.lambda_gp > 0:
                # bf16 R1 input keeps the grad-of-grad tangents bf16 (steps.py)
                r1_dtype = getattr(dis, "compute_dtype", None)
                x_r1 = x_real.astype(r1_dtype) if r1_dtype else x_real
                y_real, gp_raw = dis_out_and_r1(
                    lambda xr: _dis_apply(
                        dis, params_dis, sn2, xr, DEEPVOXELS_STAGE, alpha
                    )[0],
                    x_r1,
                )
                sn3 = sn2
                loss = dis_adv_loss(y_fake, y_real)
                gp = spec.lambda_gp * gp_raw
                metrics["dis/loss_gp"] = gp
                loss = loss + gp
            else:
                y_real, sn3 = _dis_apply(
                    dis, params_dis, sn2, x_real, DEEPVOXELS_STAGE, alpha, mutable_sn=True
                )
                loss = dis_adv_loss(y_fake, y_real)
            metrics["dis/loss_adv"] = loss
            return loss, (sn3, metrics)

        (loss_dis, (sn_state, dis_metrics)), grads_dis = jax.value_and_grad(
            dis_loss_fn, has_aux=True
        )(state.params_dis)
        grads_dis = _pmean(grads_dis, spec.axis_name)
        up_dis, opt_dis_state = opt_dis.update(grads_dis, state.opt_dis, state.params_dis)
        params_dis = optax.apply_updates(state.params_dis, up_dis)

        metrics = {**gen_metrics, **dis_metrics}
        metrics["stage"] = jnp.float32(8.5)
        metrics["image_size"] = jnp.float32(IMG_SIZE)
        nan = jnp.logical_or(jnp.isnan(loss_gen), jnp.isnan(loss_dis))
        metrics = {k: _pmean(v, spec.axis_name) for k, v in metrics.items()}
        metrics["nan"] = _pany(nan, spec.axis_name)

        # sync-BN policy for the occlusion nets' BatchNorm running stats:
        # each device's forwards update its own copy from its own batch, so
        # the collection is device-varying here; pmean-ing it makes the
        # returned state genuinely replicated (the P() out_spec in
        # parallel/mesh.py is checked, not assumed). The reference never
        # synced BN across ranks (ChainerMN, train_rgbd.py:106) — per-rank
        # running stats there were an accident of distribution, and they only
        # feed eval-mode BN, so the cross-device mean is the well-defined
        # TPU-native choice (documented divergence).
        gen_state = _pmean(gen_state, spec.axis_name)

        new_state = TrainState(
            params_gen=params_gen,
            params_dis=params_dis,
            opt_map=opt_map_state,
            opt_gen=opt_gen_state,
            opt_dis=opt_dis_state,
            ema_gen=ema_gen,
            sn_state=sn_state,
            iteration=state.iteration + 1,
            gen_state=gen_state,
        )
        return new_state, metrics

    return step
