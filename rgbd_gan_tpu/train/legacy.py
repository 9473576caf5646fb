"""Legacy StyleGAN RGB updater + auxiliary losses kept for capability parity.

Ports of reference components that are declared but not reachable from the
shipped configs:

- the legacy ``Updater`` (``updater.py:70-211``): RGB StyleGAN with style
  mixing and the per-(device-count, stage) LR scale factor multiplying both
  losses
- ``loss_func_dsgan`` (``updater.py:14-23``): diversity-sensitive GAN loss
  (commented out at its only call site in the reference)
- ``calc_distance`` (``updater.py:63-67``): chamfer-style regulariser
  between estimated and sampled camera parameters
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .ema import soft_copy_params
from .losses import dis_adv_loss, dis_out_and_r1, downsize_real, gen_adv_loss
from .optim import get_lr_scale_factor
from .state import TrainState
from .steps import StepSpec, _dis_apply, _pany, _pmean, _to_unit_range


def loss_func_dsgan(x: jnp.ndarray, z: jnp.ndarray, theta: jnp.ndarray, tau: float = 10.0):
    """Diversity-sensitive GAN loss (``updater.py:14-23``). ``x`` NHWC."""
    if x.shape[-1] == 4:
        x = x[..., :3]
    dx = jnp.sum((x[::2] - x[1::2]) ** 2, axis=tuple(range(1, x.ndim)))
    dz = jnp.sum((z[::2] - z[1::2]) ** 2, axis=tuple(range(1, z.ndim)))
    loss_ds_1 = dx / (dz + 1e-8)
    loss_ds_2 = dx[:, None] / (jnp.abs(theta[::2] - theta[1::2]) + 1e-8) / 1000.0
    loss_ds_1 = jnp.minimum(jnp.sqrt(loss_ds_1), tau)
    loss_ds_2 = jnp.minimum(jnp.sqrt(loss_ds_2), tau)
    return -jnp.mean(loss_ds_1) - jnp.mean(loss_ds_2)


def calc_distance(est_theta: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Two-sided nearest-neighbour distance between camera-parameter sets
    (``updater.py:63-67``)."""
    dist = (
        jnp.sum(est_theta**2, axis=1)[:, None]
        + jnp.sum(theta**2, axis=1)[None, :]
        - 2.0 * jnp.matmul(est_theta, theta.T)
    )
    return jnp.mean(jnp.min(dist, axis=0)) + jnp.mean(jnp.min(dist, axis=1))


def make_legacy_train_step(
    gen,
    dis,
    make_hidden: Callable[[jax.Array, int], jnp.ndarray],
    opt_map: Optional[optax.GradientTransformation],
    opt_gen: optax.GradientTransformation,
    opt_dis: optax.GradientTransformation,
    spec: StepSpec,
    total_devices: int = 1,
):
    """Legacy RGB StyleGAN step with style mixing (``updater.py:115-211``).

    Style mixing: with probability ``spec.style_mixing_rate`` the second
    (fine) style comes from an independent latent; both G and D losses are
    scaled by the LR table factor for the current stage.
    """
    stage = spec.stage_floor
    lr_scale = float(get_lr_scale_factor(total_devices, stage))

    def sample_z(key):
        kz, kmix, kz2 = jax.random.split(key, 3)
        z = make_hidden(kz, spec.batch_size)
        if spec.style_mixing_rate > 0:
            z2 = make_hidden(kz2, spec.batch_size)
            mix = jax.random.uniform(kmix, ()) < spec.style_mixing_rate
            half = z.shape[1] // 2
            # the fine half of z drives w2 = mapping(z2-part)
            z = jnp.where(mix, jnp.concatenate([z[:, :half], z2[:, half:]], axis=1), z)
        return z

    def step(state: TrainState, x_real_full: jnp.ndarray, alpha, key: jax.Array):
        if spec.axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(spec.axis_name))
        kg, kd = jax.random.split(key)

        x_real = downsize_real(_to_unit_range(x_real_full), stage, alpha, spec.max_stage)
        z = sample_z(kg)

        def gen_loss_fn(params_gen):
            x_fake = gen.apply({"params": params_gen}, z, stage, alpha, None)
            y_fake, sn1 = _dis_apply(
                dis, state.params_dis, state.sn_state, x_fake[..., :3], stage, alpha,
                mutable_sn=True,
            )
            loss = gen_adv_loss(y_fake) * lr_scale
            return loss, (sn1, {"gen/loss_adv": loss})

        (loss_gen, (sn1, gmetrics)), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.params_gen
        )
        grads = _pmean(grads, spec.axis_name)
        g_map, g_syn = grads["mapping"], grads["gen"]
        up_map, opt_map_state = opt_map.update(g_map, state.opt_map, state.params_gen["mapping"])
        up_syn, opt_gen_state = opt_gen.update(g_syn, state.opt_gen, state.params_gen["gen"])
        params_gen = {
            "mapping": optax.apply_updates(state.params_gen["mapping"], up_map),
            "gen": optax.apply_updates(state.params_gen["gen"], up_syn),
        }

        ema_gen = state.ema_gen
        if spec.keep_smoothed_gen and ema_gen is not None:
            ema_gen = soft_copy_params(ema_gen, params_gen, 1.0 - spec.smoothing)

        # legacy D phase renders a *fresh* latent (updater.py:172-184)
        z_d = sample_z(kd)
        x_fake = gen.apply({"params": params_gen}, z_d, stage, alpha, None)
        x_fake_rgb = jax.lax.stop_gradient(x_fake[..., :3])

        def dis_loss_fn(params_dis):
            y_fake, sn2 = _dis_apply(
                dis, params_dis, sn1, x_fake_rgb, stage, alpha, mutable_sn=True
            )
            if spec.lambda_gp > 0:
                y_real, gp_raw = dis_out_and_r1(
                    lambda xr: _dis_apply(dis, params_dis, sn2, xr, stage, alpha)[0], x_real
                )
                sn3 = sn2
                loss_adv = dis_adv_loss(y_fake, y_real)
                metrics = {"dis/loss_adv": loss_adv}
                gp = spec.lambda_gp * gp_raw
                metrics["dis/loss_gp"] = gp
                loss = loss_adv + gp
            else:
                y_real, sn3 = _dis_apply(
                    dis, params_dis, sn2, x_real, stage, alpha, mutable_sn=True
                )
                loss_adv = dis_adv_loss(y_fake, y_real)
                metrics = {"dis/loss_adv": loss_adv}
                loss = loss_adv
            return loss * lr_scale, (sn3, metrics)

        (loss_dis, (sn_state, dmetrics)), grads_dis = jax.value_and_grad(
            dis_loss_fn, has_aux=True
        )(state.params_dis)
        grads_dis = _pmean(grads_dis, spec.axis_name)
        up_dis, opt_dis_state = opt_dis.update(grads_dis, state.opt_dis, state.params_dis)
        params_dis = optax.apply_updates(state.params_dis, up_dis)

        metrics = {**gmetrics, **dmetrics}
        metrics["stage"] = jnp.float32(stage) + alpha
        metrics["image_size"] = jnp.float32(x_real.shape[1])
        nan = jnp.logical_or(jnp.isnan(loss_gen), jnp.isnan(loss_dis))
        metrics = {k: _pmean(v, spec.axis_name) for k, v in metrics.items()}
        metrics["nan"] = _pany(nan, spec.axis_name)
        new_state = TrainState(
            params_gen=params_gen,
            params_dis=params_dis,
            opt_map=opt_map_state,
            opt_gen=opt_gen_state,
            opt_dis=opt_dis_state,
            ema_gen=ema_gen,
            sn_state=sn_state,
            iteration=state.iteration + 1,
        )
        return new_state, metrics

    return step
