"""Pure jit-able train steps: the TPU twins of the reference updaters.

``RGBDUpdater.update_core`` (``updater.py:274-448``) and
``RGBUpdater.update_core`` (``updater.py:503-589``) become pure functions
``step(state, x_real, alpha, key) -> (state, metrics)`` compiled once per
(static) ``StepSpec``. The spec carries everything that changes the traced
graph: stage floor, architecture, which losses are active
(``use_rotate`` flips at ``start_rotation``, ``occlusion_aware`` at
``start_occlusion_aware`` — at most a handful of recompiles per run).

Faithful choreography per iteration (all inside ONE compiled step):
 1. sample paired latents ``z = concat([make_hidden(B/2)] * 2)``
    (``updater.py:300``) and paired 6-DoF poses (on device)
 2. build camera matrices + 9-dim conditioning (``updater.py:315-318``)
 3. downsize reals to the stage resolution (``updater.py:322``)
 4. G loss: adversarial + 3D-consistency (+depth floor, +feature-rotate,
    +occupancy) -> grads -> Adam(map at alpha/100 for stylegan) update
 5. EMA soft-copy into the smoothed generator (``updater.py:398-400``)
 6. D loss on the *detached pre-update* fakes + reals, R1 gradient penalty
    via grad-of-grad (``updater.py:407-437``) -> Adam update

Distribution: pass ``axis_name`` to run under ``shard_map`` — each device
samples its own latents/poses from a folded key and gradients are
``pmean``-ed over the mesh, exactly the semantics of the reference's
per-rank sampling + NCCL all-reduce (``train_rgbd.py:151-161``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..geometry.camera import camera_matrices, theta_to_9dof
from ..geometry.warp import occupancy_net_loss, rotate_consistency_loss
from .ema import soft_copy_params
from .losses import dis_adv_loss, dis_out_and_r1, downsize_real, gen_adv_loss, l2_loss
from .state import TrainState


@dataclasses.dataclass(frozen=True)
class StepSpec:
    """Static (hashable) step configuration — one jit compile per value."""

    architecture: str  # 'stylegan' | 'dcgan'
    stage_floor: int
    batch_size: int
    use_rotate: bool = False
    occlusion_aware: bool = False
    rotate_feature: bool = False
    use_occupancy: bool = False
    sn: bool = False
    keep_smoothed_gen: bool = False
    smoothing: float = 0.999
    lambda_gp: float = 1.0
    lambda_depth: float = 10.0
    depth_min: float = 0.6
    lambda_geometric: float = 3.0
    lambda_rotate: float = 2.0
    lambda_occupancy: float = 1.0
    style_mixing_rate: float = 0.0
    # lazy R1 (StyleGAN2 §5.1): apply the gradient penalty every k-th step
    # with weight ×k. 1 = reference-exact semantics (penalty every step,
    # updater.py:407-437); >1 is an opt-in throughput knob — skip steps run
    # one plain D(x_real) forward instead of the grad-of-grad chain.
    r1_interval: int = 1
    exact_bilinear: bool = True
    gather_mode: str = "xla"  # 'xla' | 'onehot' | 'hybrid' | 'pallas' (warp.bilinear_sample)
    axis_name: Optional[str] = None
    max_stage: int = 17


def _pmean(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def _pany(flag, axis_name):
    """Logical-any of a boolean flag over the data axis.

    The NaN guard must trip if ANY device saw a non-finite loss, and the
    result must be replicated so the sharded step's ``P()`` out_spec is
    honest under shard_map's replication checker (bool pmean is ill-typed,
    hence pmax of the 0/1 float)."""
    if axis_name is None:
        return flag
    return jax.lax.pmax(flag.astype(jnp.float32), axis_name) > 0


def _to_unit_range(x_real_full: jnp.ndarray) -> jnp.ndarray:
    """uint8 batches normalise on device — same arithmetic as the host
    pipeline (``data/dataset.py``: x/127.5 - 1 in f32), shipped at 1/4 the
    host->device bandwidth. Float inputs pass through (already in [-1, 1])."""
    if jnp.issubdtype(x_real_full.dtype, jnp.integer):
        return x_real_full.astype(jnp.float32) / 127.5 - 1.0
    return x_real_full


def _dis_apply(dis, params_dis, sn_state, x, stage, alpha, *, return_hidden=False, mutable_sn=False):
    """Apply the discriminator, threading the spectral-norm state."""
    variables = {"params": params_dis}
    if sn_state is not None:
        variables["sn"] = sn_state
    if sn_state is not None and mutable_sn:
        out, new_vars = dis.apply(
            variables, x, stage, alpha, return_hidden=return_hidden, mutable=["sn"]
        )
        return out, new_vars["sn"]
    return dis.apply(variables, x, stage, alpha, return_hidden=return_hidden), sn_state


def make_rgbd_train_step(
    gen,
    dis,
    make_hidden: Callable[[jax.Array, int], jnp.ndarray],
    prior,
    opt_map: Optional[optax.GradientTransformation],
    opt_gen: optax.GradientTransformation,
    opt_dis: optax.GradientTransformation,
    spec: StepSpec,
):
    """Build the RGBD train step (reference ``RGBDUpdater``).

    ``make_hidden(key, n)`` samples n latents for the configured generator.
    Returns ``step(state, x_real_full, alpha, key) -> (state, metrics)`` where
    ``x_real_full`` is the full-resolution (B, S, S, 3) real batch already in
    [-1, 1].
    """
    stage = spec.stage_floor
    half = spec.batch_size // 2
    is_stylegan = spec.architecture == "stylegan"
    # under bf16 compute, hand the R1 forward a bf16 input so the whole
    # grad-of-grad tangent chain stays bf16 (an f32 input pins f32 tangent
    # streams through every D conv of the penalty; the reference's mixed16
    # mode runs the penalty in fp16 throughout)
    r1_dtype = getattr(dis, "compute_dtype", None)

    def step(state: TrainState, x_real_full: jnp.ndarray, alpha, key: jax.Array):
        if spec.axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(spec.axis_name))
        kz, ktheta, kocc = jax.random.split(key, 3)

        # paired latents: same z rendered under two cameras (updater.py:300)
        z = jnp.concatenate([make_hidden(kz, half)] * 2, axis=0)
        thetas6 = prior.sample(ktheta, spec.batch_size)
        mats = camera_matrices(thetas6)
        theta9 = theta_to_9dof(thetas6)

        x_real = downsize_real(_to_unit_range(x_real_full), stage, alpha, spec.max_stage)
        image_size = x_real.shape[1]

        # ---------------- generator phase ----------------
        def gen_loss_fn(params_gen):
            x_fake, feat_g = gen.apply(
                {"params": params_gen}, z, stage, alpha, theta9, return_feature=True
            )
            (y_fake, feat_d), sn1 = _dis_apply(
                dis,
                state.params_dis,
                state.sn_state,
                x_fake[..., :3],
                stage,
                alpha,
                return_hidden=True,
                mutable_sn=True,
            )
            loss = gen_adv_loss(y_fake)
            metrics = {"gen/loss_adv": loss}

            if spec.use_rotate:
                loss_rotate, _ = rotate_consistency_loss(
                    x_fake[:half],
                    mats[:half],
                    x_fake[half:],
                    mats[half:],
                    occlusion_aware=spec.occlusion_aware,
                    lambda_geometric=spec.lambda_geometric,
                    exact_bilinear=spec.exact_bilinear,
                    gather_mode=spec.gather_mode,
                )
                if spec.rotate_feature and feat_d is not None:
                    # reference quirk (updater.py:347): the "depth" appended
                    # to the D features is x_real's last channel — the blue
                    # channel of the 3-channel reals
                    rate = x_real.shape[1] // feat_d.shape[1]
                    depth = jax.lax.reduce_window(
                        x_real[..., -1:], 0.0, jax.lax.add,
                        (1, rate, rate, 1), (1, rate, rate, 1), "VALID",
                    ) / (rate * rate)
                    feat = jnp.concatenate([feat_d, depth], axis=-1)
                    loss_rf, _ = rotate_consistency_loss(
                        feat[:half],
                        mats[:half],
                        feat[half:],
                        mats[half:],
                        occlusion_aware=spec.occlusion_aware,
                        norm="l2",
                        lambda_geometric=spec.lambda_geometric,
                        exact_bilinear=spec.exact_bilinear,
                        gather_mode=spec.gather_mode,
                    )
                    loss_rotate = loss_rotate + loss_rf
                if spec.lambda_depth > 0:
                    # depth floor: push depth above depth_min (updater.py:357-359)
                    loss_rotate = loss_rotate + spec.lambda_depth * jnp.mean(
                        jax.nn.relu(spec.depth_min - x_fake[..., -1]) ** 2
                    )
                metrics["gen/loss_rotate"] = loss_rotate
                lam = spec.lambda_rotate if image_size <= 128 else spec.lambda_rotate * 2
                loss = loss + loss_rotate * lam

                if spec.use_occupancy:
                    occ_apply = lambda zl, coords: gen.apply(
                        {"params": params_gen}, zl, coords, method=gen.occupancy_logits
                    )
                    loss_occ = occupancy_net_loss(
                        occ_apply, x_fake[..., -1:], mats, z.reshape(z.shape[0], -1), kocc
                    )
                    metrics["gen/loss_occupancy"] = loss_occ
                    loss = loss + loss_occ * spec.lambda_occupancy

            return loss, (x_fake, sn1, metrics)

        (loss_gen, (x_fake, sn1, gen_metrics)), grads_gen = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.params_gen)
        grads_gen = _pmean(grads_gen, spec.axis_name)

        params_gen = state.params_gen
        if is_stylegan:
            # two clipping domains: mapping (alpha/100) and synthesis
            g_map, g_syn = grads_gen["mapping"], grads_gen["gen"]
            up_map, opt_map_state = opt_map.update(g_map, state.opt_map, params_gen["mapping"])
            up_syn, opt_gen_state = opt_gen.update(g_syn, state.opt_gen, params_gen["gen"])
            params_gen = {
                "mapping": optax.apply_updates(params_gen["mapping"], up_map),
                "gen": optax.apply_updates(params_gen["gen"], up_syn),
            }
        else:
            up, opt_gen_state = opt_gen.update(grads_gen, state.opt_gen, params_gen)
            params_gen = optax.apply_updates(params_gen, up)
            opt_map_state = state.opt_map

        ema_gen = state.ema_gen
        if spec.keep_smoothed_gen and ema_gen is not None:
            ema_gen = soft_copy_params(ema_gen, params_gen, 1.0 - spec.smoothing)

        # ---------------- discriminator phase ----------------
        # D sees the *pre-update* fakes, detached (updater.py:407)
        x_fake_rgb = jax.lax.stop_gradient(x_fake[..., :3])

        def dis_loss_fn(params_dis):
            (y_fake, feat_fake), sn2 = _dis_apply(
                dis, params_dis, sn1, x_fake_rgb, stage, alpha,
                return_hidden=True, mutable_sn=True,
            )
            metrics = {}
            if not spec.sn and spec.lambda_gp > 0:
                # one shared D(x_real) forward feeds both the adversarial
                # term and the R1 penalty, like the reference's graph reuse
                x_r1 = x_real.astype(r1_dtype) if r1_dtype else x_real
                d_real = lambda xr: _dis_apply(dis, params_dis, sn2, xr, stage, alpha)[0]
                if spec.r1_interval > 1:
                    # lazy R1: only the taken cond branch executes on TPU, so
                    # skip steps pay one plain D(x_real) forward instead of
                    # the forward+tangent+double-backward chain
                    def _with_gp(xr):
                        y, g = dis_out_and_r1(d_real, xr)
                        return y, spec.lambda_gp * spec.r1_interval * g

                    y_real, gp = jax.lax.cond(
                        state.iteration % spec.r1_interval == 0,
                        _with_gp,
                        lambda xr: (d_real(xr), jnp.float32(0.0)),
                        x_r1,
                    )
                else:
                    y_real, gp_raw = dis_out_and_r1(d_real, x_r1)
                    gp = spec.lambda_gp * gp_raw
                sn3 = sn2
                loss = dis_adv_loss(y_fake, y_real)
                metrics["dis/loss_gp"] = gp
                loss = loss + gp
            else:
                (y_real, _), sn3 = _dis_apply(
                    dis, params_dis, sn2, x_real, stage, alpha,
                    return_hidden=True, mutable_sn=True,
                )
                loss = dis_adv_loss(y_fake, y_real)

            if spec.use_rotate and spec.rotate_feature and feat_fake is not None:
                rate = x_real.shape[1] // feat_fake.shape[1]
                depth = jax.lax.reduce_window(
                    x_real[..., -1:], 0.0, jax.lax.add,
                    (1, rate, rate, 1), (1, rate, rate, 1), "VALID",
                ) / (rate * rate)
                feat = jnp.concatenate([feat_fake, depth], axis=-1)
                loss_rf, _ = rotate_consistency_loss(
                    feat[:half], mats[:half], feat[half:], mats[half:],
                    occlusion_aware=spec.occlusion_aware, norm="l2",
                    lambda_geometric=spec.lambda_geometric,
                    exact_bilinear=spec.exact_bilinear,
                    gather_mode=spec.gather_mode,
                )
                # adversarial: D *maximises* feature 3D-consistency error
                loss = loss - loss_rf
                if not spec.sn and spec.lambda_gp > 0:
                    def feat_sum(xf):
                        # uses sn2 — the freshest SN state at this point in the
                        # phase. This branch only runs with spec.sn False, so
                        # the SN state is None and the choice of sn1 vs sn2 is
                        # inert (SN power iteration otherwise carries a u
                        # vector, so they would NOT be interchangeable);
                        # sn2 keeps the threading monotone through the step.
                        (_, f), _ = _dis_apply(
                            dis, params_dis, sn2, xf, stage, alpha, return_hidden=True
                        )
                        return jnp.sum(f)

                    gfake = jax.grad(feat_sum)(x_fake_rgb)
                    gnorm = jnp.sqrt(
                        jnp.sum(gfake**2, axis=tuple(range(1, gfake.ndim))) + 1e-24
                    )
                    loss = loss + spec.lambda_gp * l2_loss(gnorm, 0.0)

            metrics["dis/loss_adv"] = loss  # reference reports the total (updater.py:441)
            return loss, (sn3, metrics)

        (loss_dis, (sn_state, dis_metrics)), grads_dis = jax.value_and_grad(
            dis_loss_fn, has_aux=True
        )(state.params_dis)
        grads_dis = _pmean(grads_dis, spec.axis_name)
        up_dis, opt_dis_state = opt_dis.update(grads_dis, state.opt_dis, state.params_dis)
        params_dis = optax.apply_updates(state.params_dis, up_dis)

        metrics = {**gen_metrics, **dis_metrics}
        metrics["stage"] = jnp.float32(stage) + alpha
        metrics["image_size"] = jnp.float32(image_size)
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


def make_windowed_step(step: Callable, window: int) -> Callable:
    """Chain ``window`` iterations inside ONE compiled program via lax.scan.

    Through a remote-dispatch runtime every ``step`` call costs a host
    roundtrip (dispatch + the per-iteration NaN-guard fetch); scanning K
    steps on device amortises both to one per window. The per-step math is
    identical to K separate calls (up to XLA reassociation between the two
    compiled programs): the caller supplies the K RNG keys (stacked, exactly
    the keys the unwindowed loop would have used), the K real batches, and
    the K alphas; metrics come back stacked (K,) per key so per-iteration
    logging and the NaN guard are preserved.

    ``wstep(state, xs, alphas, keys) -> (state, stacked_metrics)``.
    """

    def wstep(state, xs, alphas, keys):
        def body(carry, inp):
            x, a, k = inp
            new_state, metrics = step(carry, x, a, k)
            return new_state, metrics

        return jax.lax.scan(body, state, (xs, alphas, keys), length=window)

    return wstep


def make_rgb_train_step(
    gen,
    dis,
    make_hidden: Callable[[jax.Array, int], jnp.ndarray],
    opt_map: Optional[optax.GradientTransformation],
    opt_gen: optax.GradientTransformation,
    opt_dis: optax.GradientTransformation,
    spec: StepSpec,
):
    """RGB-only train step (reference ``RGBUpdater``, ``updater.py:451-589``).

    Same skeleton without camera conditioning or 3D-consistency; paired
    latents are still drawn (``updater.py:525``) — quirk preserved.
    """
    stage = spec.stage_floor
    half = spec.batch_size // 2
    is_stylegan = spec.architecture == "stylegan"
    r1_dtype = getattr(dis, "compute_dtype", None)  # see make_rgbd_train_step

    def step(state: TrainState, x_real_full: jnp.ndarray, alpha, key: jax.Array):
        if spec.axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(spec.axis_name))
        (kz,) = jax.random.split(key, 1)
        z = jnp.concatenate([make_hidden(kz, half)] * 2, axis=0)

        x_real = downsize_real(_to_unit_range(x_real_full), stage, alpha, spec.max_stage)
        image_size = x_real.shape[1]

        def gen_loss_fn(params_gen):
            x_fake = gen.apply({"params": params_gen}, z, stage, alpha, None)
            (y_fake), sn1 = _dis_apply(
                dis, state.params_dis, state.sn_state, x_fake[..., :3], stage, alpha,
                mutable_sn=True,
            )
            loss = gen_adv_loss(y_fake)
            return loss, (x_fake, sn1, {"gen/loss_adv": loss})

        (loss_gen, (x_fake, sn1, gen_metrics)), grads_gen = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.params_gen)
        grads_gen = _pmean(grads_gen, spec.axis_name)

        params_gen = state.params_gen
        if is_stylegan:
            g_map, g_syn = grads_gen["mapping"], grads_gen["gen"]
            up_map, opt_map_state = opt_map.update(g_map, state.opt_map, params_gen["mapping"])
            up_syn, opt_gen_state = opt_gen.update(g_syn, state.opt_gen, params_gen["gen"])
            params_gen = {
                "mapping": optax.apply_updates(params_gen["mapping"], up_map),
                "gen": optax.apply_updates(params_gen["gen"], up_syn),
            }
        else:
            up, opt_gen_state = opt_gen.update(grads_gen, state.opt_gen, params_gen)
            params_gen = optax.apply_updates(params_gen, up)
            opt_map_state = state.opt_map

        ema_gen = state.ema_gen
        if spec.keep_smoothed_gen and ema_gen is not None:
            ema_gen = soft_copy_params(ema_gen, params_gen, 1.0 - spec.smoothing)

        x_fake_rgb = jax.lax.stop_gradient(x_fake[..., :3])

        def dis_loss_fn(params_dis):
            y_fake, sn2 = _dis_apply(
                dis, params_dis, sn1, x_fake_rgb, stage, alpha, mutable_sn=True
            )
            metrics = {}
            if not spec.sn and spec.lambda_gp > 0:
                x_r1 = x_real.astype(r1_dtype) if r1_dtype else x_real
                d_real = lambda xr: _dis_apply(dis, params_dis, sn2, xr, stage, alpha)[0]
                if spec.r1_interval > 1:  # lazy R1 (see make_rgbd_train_step)
                    def _with_gp(xr):
                        y, g = dis_out_and_r1(d_real, xr)
                        return y, spec.lambda_gp * spec.r1_interval * g

                    y_real, gp = jax.lax.cond(
                        state.iteration % spec.r1_interval == 0,
                        _with_gp,
                        lambda xr: (d_real(xr), jnp.float32(0.0)),
                        x_r1,
                    )
                else:
                    y_real, gp_raw = dis_out_and_r1(d_real, x_r1)
                    gp = spec.lambda_gp * gp_raw
                sn3 = sn2
                loss = dis_adv_loss(y_fake, y_real)
                metrics["dis/loss_gp"] = gp
                loss = loss + gp
            else:
                y_real, sn3 = _dis_apply(
                    dis, params_dis, sn2, x_real, stage, alpha, mutable_sn=True
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
        metrics["stage"] = jnp.float32(stage) + alpha
        metrics["image_size"] = jnp.float32(image_size)
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
