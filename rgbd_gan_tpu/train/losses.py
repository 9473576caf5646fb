"""GAN losses, R1 gradient penalty, real-image progressive resize.

Ports of ``common/loss_functions.py:7-28`` (adversarial losses),
``updater.py:414-418`` (R1-style zero-centered gradient penalty via double
backprop) and ``common/utils/pggan.py:6-49`` (``downsize_real``) from
nogu-atsu/RGBD-GAN. All functions are pure and jit-able; the gradient
penalty uses ``jax.grad``-of-``jax.grad`` which XLA fuses into the same
compiled step as the discriminator loss.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ..nn.layers import upscale2x


def l2_loss(h: jnp.ndarray, t: Union[jnp.ndarray, float]) -> jnp.ndarray:
    """``loss_l2``: sum((h - t)^2) / numel (``loss_functions.py:7-8``)."""
    return jnp.mean((h - t) ** 2)


def gen_adv_loss(y_fake: jnp.ndarray, focal_loss_gamma: Optional[float] = 0.0) -> jnp.ndarray:
    """Non-saturating softplus generator loss with optional focal weighting
    (``loss_functions.py:11-14``). Note the shipped updaters call this with
    the default gamma=0, so the yml ``focal_loss_gamma`` never engages in the
    rgbd/rgb paths — quirk preserved by the callers."""
    if focal_loss_gamma is None:
        focal_loss_gamma = 0.0
    w = jax.nn.sigmoid(-y_fake) ** focal_loss_gamma if focal_loss_gamma else 1.0
    return jnp.mean(jax.nn.softplus(-y_fake) * w)


def dis_adv_loss(y_fake, y_real) -> jnp.ndarray:
    """Softplus discriminator loss; tuple-aware like the reference
    (``loss_functions.py:17-28``)."""
    if isinstance(y_fake, (tuple, list)):
        loss = 0.0
        for yf, yr in zip(y_fake, y_real):
            loss += jnp.mean(jax.nn.softplus(yf)) + jnp.mean(jax.nn.softplus(-yr))
        return loss
    return jnp.mean(jax.nn.softplus(y_fake)) + jnp.mean(jax.nn.softplus(-y_real))


def r1_penalty(dis_fn: Callable[[jnp.ndarray], jnp.ndarray], x_real: jnp.ndarray) -> jnp.ndarray:
    """Zero-centered gradient penalty on reals (``updater.py:414-418``).

    ``mean_b( ||d sum(D(x)) / dx||_2^2 )`` — the reference computes
    ``loss_l2(grad_l2, 0)`` over per-sample gradient norms, i.e. the batch
    mean of squared norms. Differentiable wrt the discriminator parameters
    (double backprop).
    """
    grad_x = jax.grad(lambda x: jnp.sum(dis_fn(x)))(x_real)
    sq_norms = jnp.sum(grad_x**2, axis=tuple(range(1, grad_x.ndim)))
    return l2_loss(jnp.sqrt(sq_norms + 1e-24), 0.0)


def dis_out_and_r1(dis_fn: Callable[[jnp.ndarray], jnp.ndarray], x_real: jnp.ndarray):
    """One-forward fusion of D(x_real) and its R1 penalty via ``jax.vjp``.

    The reference reuses the ``y_real`` graph for the penalty
    (``chainer.grad([y_real], [x_real])``, ``updater.py:416``); ``jax.vjp``
    reproduces that exactly — the primal forward is shared, the cotangent of
    ones gives d(sum y)/dx, and both outputs stay differentiable wrt the
    discriminator parameters (double backprop through the vjp).
    """
    y_real, vjp_fn = jax.vjp(dis_fn, x_real)
    (grad_x,) = vjp_fn(jnp.ones_like(y_real))
    grad_x = grad_x.astype(jnp.float32)  # penalty math in f32 (input may be bf16)
    sq_norms = jnp.sum(grad_x**2, axis=tuple(range(1, grad_x.ndim)))
    return y_real, l2_loss(jnp.sqrt(sq_norms + 1e-24), 0.0)


def _avg_pool_by(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC average pool with kernel=stride=scale."""
    if scale <= 1:
        return x
    b, h, w, c = x.shape
    return x.reshape(b, h // scale, scale, w // scale, scale, c).mean(axis=(2, 4))


def downsize_real(x_real: jnp.ndarray, stage_floor: int, alpha, max_stage: int = 17) -> jnp.ndarray:
    """Resize full-resolution reals to the active stage's size (NHWC).

    Even stage: avg-pool to ``4*2**(s/2)``. Odd stage: blend
    ``(1-alpha) * upscale(avgpool(low))`` with ``alpha * avgpool(high)``
    (``common/utils/pggan.py:6-49``). ``stage_floor`` is static; ``alpha``
    may be traced.
    """
    assert x_real.shape[1] == x_real.shape[2]
    input_size = x_real.shape[1]
    stage = min(int(stage_floor), max_stage - 1)

    if stage % 2 == 0:
        k = (stage - 2) // 2
        image_size = 4 * (2 ** (k + 1))
        assert image_size <= input_size
        return _avg_pool_by(x_real, input_size // image_size)

    k = (stage - 1) // 2
    size_low = 4 * (2**k)
    size_high = 4 * (2 ** (k + 1))
    assert size_high <= input_size
    scale_low = input_size // size_low
    scale_high = input_size // size_high

    result_low = x_real
    if scale_low > 1:
        result_low = upscale2x(_avg_pool_by(x_real, scale_low))
    result_high = _avg_pool_by(x_real, scale_high)
    return (1.0 - alpha) * result_low + alpha * result_high


def smooth_depth_loss(depth: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware second-derivative depth smoothness (``loss_functions.py:231-253``).

    Unused by the shipped updaters (kept for capability parity). ``depth``
    is (B, H, W, 1) NHWC.
    """
    diff = jnp.asarray(
        [
            [[0, 0, 0], [1, -2, 1], [0, 0, 0]],
            [[0, 1, 0], [0, -2, 0], [0, 1, 0]],
            [[0, 0, 0], [1, -1, 0], [-1, 1, 0]],
        ],
        dtype=depth.dtype,
    )  # (3, 3, 3) -> HWIO (3,3,1,3)
    laplacian = (
        jnp.asarray([[1, 1, 1], [1, -8, 1], [1, 1, 1]], dtype=depth.dtype) / 8.0
    ).reshape(3, 3, 1, 1)

    x = _avg_pool_by(depth, 2)
    d = jax.lax.conv_general_dilated(
        x,
        diff.transpose(1, 2, 0).reshape(3, 3, 1, 3),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    smooth = jnp.sum(jnp.abs(d), axis=-1, keepdims=True)
    edge = jax.lax.conv_general_dilated(
        x, laplacian, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jnp.mean(jnp.exp(-jnp.abs(edge)) * smooth)
