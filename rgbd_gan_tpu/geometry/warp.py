"""Differentiable depth-warping and the 3D-consistency loss (pure JAX, NHWC).

This is the core novelty of RGBD-GAN: each latent is rendered under two
nearby cameras; generated depth unprojects pixels to 3D, the relative pose
transforms them, they reproject into the other view, a bilinear gather reads
the other image, and RGB+depth disagreement is penalised (with optional
occlusion masking). Reference: ``common/loss_functions.py:31-228`` in
nogu-atsu/RGBD-GAN.

Layout: images are NHWC (TPU-native); the depth channel is last. Pixel
coordinates follow the reference convention exactly — the grid ``p`` stacks
``[x(col), y(row), 1]`` flattened row-major, and the bilinear sampler swaps
u/v before gathering (``loss_functions.py:202``) so ``u`` indexes rows.

Gradient flow matches the reference: gradients flow through the projected
coordinates into the bilinear *weights* and through the gathered *values*,
but the corner indices, the out-of-bounds mask, and the occlusion mask are
stop-gradient.

Quirk preserved (``loss_functions.py:219``): the reference overwrites
``u1 = u0 * mask`` (instead of ``u1 * mask``), so interpolation is nearest
(truncated) along u and linear along v. ``exact=True`` (default) reproduces
this; ``exact=False`` gives true bilinear interpolation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

CLIP_Z_MIN = 1e-4
CLIP_Z_MAX = 10000.0


def intrinsics(size: int, base_k: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Camera intrinsics K for a ``size`` x ``size`` image.

    Default matches ``loss_functions.py:48-50``: focal ``2*size`` and
    principal point ``size/2`` (note: *not* centered at (size-1)/2 — quirk
    preserved). With ``base_k`` given, its first two rows are rescaled so the
    principal point maps to ``size/2`` (``loss_functions.py:43-44``).
    """
    if base_k is not None:
        k = jnp.asarray(base_k[:3, :3], dtype=jnp.float32)
        scale = size / k[0, 2] / 2
        return k.at[:2].multiply(scale)
    return jnp.array(
        [[size * 2.0, 0.0, size / 2.0], [0.0, size * 2.0, size / 2.0], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )


def pixel_grid(size: int) -> jnp.ndarray:
    """Homogeneous pixel grid ``p``: shape (3, size*size), rows [x, y, 1].

    ``x`` varies fastest (row-major flatten of a meshgrid), matching
    ``loss_functions.py:59-61``.
    """
    xs = jnp.arange(size, dtype=jnp.float32)
    x, y = jnp.meshgrid(xs, xs)  # 'xy' indexing: x[r, c] = c, y[r, c] = r
    ones = jnp.ones((size, size), dtype=jnp.float32)
    return jnp.stack([x, y, ones]).reshape(3, -1)


def relative_pose(mat1: jnp.ndarray, mat2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Relative pose between two batches of cam2world matrices.

    ``R = R2^T R1`` and ``t = R1^T (t2 - t1)`` (``loss_functions.py:85-91``).
    """
    r1 = mat1[:, :3, :3]
    r2 = mat2[:, :3, :3]
    t1 = mat1[:, :3, -1:]
    t2 = mat2[:, :3, -1:]
    r = jnp.matmul(jnp.transpose(r2, (0, 2, 1)), r1).astype(jnp.float32)
    t = jnp.matmul(jnp.transpose(r1, (0, 2, 1)), t2 - t1).astype(jnp.float32)
    return r, t


def warp(
    k: jnp.ndarray,
    inv_k: jnp.ndarray,
    r: jnp.ndarray,
    t: jnp.ndarray,
    z: jnp.ndarray,
    p: jnp.ndarray,
) -> jnp.ndarray:
    """Forward warp: ``K R K^-1 (z*p) - K R t`` -> (B, HW, 3).

    ``z``: (B, 1, HW) depth, ``p``: (3, HW). Reference
    ``loss_functions.py:171-175``. Differentiable through ``z``.
    """
    krk = jnp.matmul(jnp.matmul(k, r), inv_k)  # (B,3,3)
    krt = jnp.matmul(jnp.matmul(k, r), t)  # (B,3,1)
    new_zp = jnp.matmul(krk, z * p) - krt
    return jnp.transpose(new_zp, (0, 2, 1))


def inv_warp(
    k: jnp.ndarray,
    inv_k: jnp.ndarray,
    inv_r: jnp.ndarray,
    t: jnp.ndarray,
    z: jnp.ndarray,
    p: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse warp: ``K R^T K^-1 (z*p) + K t`` (``loss_functions.py:178-182``)."""
    krk = jnp.matmul(jnp.matmul(k, inv_r), inv_k)
    kt = jnp.matmul(k, t)
    new_zp = jnp.matmul(krk, z * p) + kt
    return jnp.transpose(new_zp, (0, 2, 1))


def bilinear_sample(
    img: jnp.ndarray, zp: jnp.ndarray, exact: bool = True, use_pallas: bool = False,
    gather_mode: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perspective-divide + masked bilinear gather (``loss_functions.py:185-228``).

    :param img: (B, H, W, C) NHWC image (RGBD or feature+depth)
    :param zp: (B, HW, 3) projected homogeneous coords ``depth * (x, y, 1)``
    :param use_pallas: back-compat alias for ``gather_mode='pallas'``
    :param gather_mode: 'xla' (native gather; backward is a scatter-add),
        'onehot' (:mod:`..ops.bilinear_onehot` — scatter-free MXU einsum,
        matmul backward), 'hybrid' (:mod:`..ops.bilinear_gradgather` —
        gather forward + one-pass one-hot custom-VJP backward; the fastest
        route on TPU), or 'pallas' (:mod:`..ops.bilinear_pallas` — fused
        kernel with custom VJP). All routes are numerically identical.
    :returns: ``warped`` (B*HW, C) sampled values (zero where out of bounds)
              and ``mask`` (B*HW,) float32 in-bounds indicator (stop-grad).
    """
    b, hw, _ = zp.shape
    _, h, w, c = img.shape
    if use_pallas:
        gather_mode = "pallas"
    if gather_mode != "xla":
        return _bilinear_sample_fused(img, zp, exact, gather_mode)
    zp = zp.reshape(-1, 3)

    zc = jnp.clip(zp[:, 2], CLIP_Z_MIN, CLIP_Z_MAX)
    u = zp[:, 0] / zc
    v = zp[:, 1] / zc
    v, u = u, v  # axis swap: u indexes rows (H), v indexes cols (W)

    u_s = jax.lax.stop_gradient(u)
    v_s = jax.lax.stop_gradient(v)
    z_s = jax.lax.stop_gradient(zp[:, 2])

    u0i = u_s.astype(jnp.int32)  # truncation toward zero, as in the reference
    u1i = u0i + 1
    v0i = v_s.astype(jnp.int32)
    v1i = v0i + 1

    # interpolation weights — differentiable through u, v
    u0f = u0i.astype(u.dtype)
    u1f = u1i.astype(u.dtype)
    v0f = v0i.astype(v.dtype)
    v1f = v1i.astype(v.dtype)
    w1 = (u1f - u) * (v1f - v)
    w2 = (u - u0f) * (v1f - v)
    w3 = (u1f - u) * (v - v0f)
    w4 = (u - u0f) * (v - v0f)

    mask_b = (u_s >= 0) & (u_s < h - 1) & (v_s >= 0) & (v_s < w - 1) & (z_s > CLIP_Z_MIN)
    mask = mask_b.astype(img.dtype)
    mask_i = mask_b.astype(jnp.int32)

    u0 = u0i * mask_i
    if exact:
        u1 = u0  # reference quirk: ``u1 = u0 * not_getting_out``
    else:
        u1 = u1i * mask_i
    v0 = v0i * mask_i
    v1 = v1i * mask_i
    w1 = w1 * mask
    w2 = w2 * mask
    w3 = w3 * mask
    w4 = w4 * mask

    img_flat = img.reshape(b * h * w, c)
    base = (jnp.arange(b * hw, dtype=jnp.int32) // hw) * (h * w)

    def gather(uu, vv):
        return jnp.take(img_flat, base + uu * w + vv, axis=0)

    warped = (
        w1[:, None] * gather(u0, v0)
        + w2[:, None] * gather(u1, v0)
        + w3[:, None] * gather(u0, v1)
        + w4[:, None] * gather(u1, v1)
    )
    return warped, mask


def _bilinear_sample_fused(img, zp, exact, gather_mode):
    """Pallas-kernel / one-hot-einsum routes: same math/masks as above."""
    b, hw, _ = zp.shape
    _, h, w, c = img.shape
    zc = jnp.clip(zp[..., 2], CLIP_Z_MIN, CLIP_Z_MAX)
    u_rows = zp[..., 1] / zc  # post-swap: u indexes rows
    v_cols = zp[..., 0] / zc
    z_s = jax.lax.stop_gradient(zp[..., 2])
    zmask = (z_s > CLIP_Z_MIN).astype(img.dtype)

    if gather_mode in ("pallas", "pallas_bf16"):
        from ..ops.bilinear_pallas import bilinear_gather_pallas

        dt = jnp.bfloat16 if gather_mode == "pallas_bf16" else None
        warped = bilinear_gather_pallas(img, u_rows, v_cols, exact, False, dt)  # (B, HW, C)
    elif gather_mode == "hybrid":
        from ..ops.bilinear_gradgather import bilinear_gather_grad

        warped = bilinear_gather_grad(img, u_rows, v_cols, exact)
    else:
        from ..ops.bilinear_onehot import bilinear_gather_onehot

        operand_dtype = jnp.bfloat16 if gather_mode == "onehot_bf16" else None
        warped = bilinear_gather_onehot(
            img, u_rows, v_cols, exact, operand_dtype=operand_dtype
        )
    warped = warped * zmask[..., None]

    u_s = jax.lax.stop_gradient(u_rows)
    v_s = jax.lax.stop_gradient(v_cols)
    mask = (
        (u_s >= 0) & (u_s < h - 1) & (v_s >= 0) & (v_s < w - 1) & (z_s > CLIP_Z_MIN)
    ).astype(img.dtype)
    return warped.reshape(b * hw, c), mask.reshape(b * hw)


def rotate_consistency_loss(
    img: jnp.ndarray,
    mat: jnp.ndarray,
    img_rot: jnp.ndarray,
    mat_rot: jnp.ndarray,
    *,
    occlusion_aware: bool = False,
    norm: str = "l1",
    lambda_geometric: float = 3.0,
    max_depth: Optional[float] = None,
    min_depth: Optional[float] = None,
    base_k: Optional[jnp.ndarray] = None,
    exact_bilinear: bool = True,
    use_pallas: bool = False,
    gather_mode: str = "xla",
    return_debug: bool = False,
):
    """3D-consistency loss between two renders of the same latent.

    Faithful port of ``LossFuncRotate.__call__`` (``loss_functions.py:63-146``)
    to NHWC JAX. ``img``/``img_rot`` are (B, H, W, C) with depth in the last
    channel; ``mat``/``mat_rot`` are the (B, 4, 4) cam2world matrices. All
    steps are differentiable through both colour and depth except the
    occlusion / out-of-bounds / fore-background masks (stop-grad, as in the
    reference).
    """
    b, h, w, c = img.shape
    size = w
    k = intrinsics(size, base_k)
    inv_k = jnp.linalg.inv(k).astype(jnp.float32)
    p = pixel_grid(size)

    z = img[..., -1].reshape(b, 1, -1)  # (B, 1, HW)
    z_rot = img_rot[..., -1].reshape(b, 1, -1)

    r, t = relative_pose(mat, mat_rot)
    inv_r = jnp.transpose(r, (0, 2, 1))

    new_zp = warp(k, inv_k, r, t, z, p)  # (B, HW, 3)
    new_zp_rot = inv_warp(k, inv_k, inv_r, t, z_rot, p)

    # both directions in one batched gather (identical numerics; halves the
    # chunked-loop trip count for the fused gather routes)
    warped_cat, not_out_cat = bilinear_sample(
        jnp.concatenate([img_rot, img], axis=0),
        jnp.concatenate([new_zp, new_zp_rot], axis=0),
        exact=exact_bilinear, use_pallas=use_pallas, gather_mode=gather_mode,
    )
    half_flat = b * h * w
    warped, warped_rot = warped_cat[:half_flat], warped_cat[half_flat:]
    not_out, not_out_rot = not_out_cat[:half_flat], not_out_cat[half_flat:]
    if return_debug:
        return warped, not_out, new_zp, warped_rot, not_out_rot, new_zp_rot

    # source colours paired with the *projected* depth, masked where the
    # projection leaves the image (loss_functions.py:107-110)
    warped_target = jnp.concatenate(
        [img[..., :-1].reshape(-1, c - 1), new_zp[:, :, 2].reshape(-1, 1)], axis=1
    ) * not_out[:, None]
    warped_rot_target = jnp.concatenate(
        [img_rot[..., :-1].reshape(-1, c - 1), new_zp_rot[:, :, 2].reshape(-1, 1)], axis=1
    ) * not_out_rot[:, None]

    if occlusion_aware:
        # a pixel is visible iff the depth sampled at the target location is
        # *behind* the projected depth (loss_functions.py:112-119); stop-grad
        not_occluded = (
            jax.lax.stop_gradient(warped[:, -1:])
            > jax.lax.stop_gradient(new_zp[:, :, 2]).reshape(-1, 1)
        ).astype(img.dtype)
        not_occluded_rot = (
            jax.lax.stop_gradient(warped_rot[:, -1:])
            > jax.lax.stop_gradient(new_zp_rot[:, :, 2]).reshape(-1, 1)
        ).astype(img.dtype)
        warped = warped * not_occluded
        warped_rot = warped_rot * not_occluded_rot
        warped_target = warped_target * not_occluded
        warped_rot_target = warped_rot_target * not_occluded_rot

    if max_depth is not None:
        small = (jax.lax.stop_gradient(z).reshape(-1, 1) < max_depth).astype(img.dtype)
        small_rot = (jax.lax.stop_gradient(z_rot).reshape(-1, 1) < max_depth).astype(img.dtype)
        warped = warped * small
        warped_target = warped_target * small
        warped_rot = warped_rot * small_rot
        warped_rot_target = warped_rot_target * small_rot

    if min_depth is not None:
        large = (jax.lax.stop_gradient(z).reshape(-1, 1) > min_depth).astype(img.dtype)
        large_rot = (jax.lax.stop_gradient(z_rot).reshape(-1, 1) > min_depth).astype(img.dtype)
        warped = warped * large
        warped_target = warped_target * large
        warped_rot = warped_rot * large_rot
        warped_rot_target = warped_rot_target * large_rot

    if norm == "l1":
        criteria = lambda a, b_: jnp.mean(jnp.abs(a - b_))
    else:
        criteria = lambda a, b_: jnp.mean((a - b_) ** 2)

    loss = criteria(warped[:, :-1], warped_target[:, :-1]) + criteria(
        warped_rot[:, :-1], warped_rot_target[:, :-1]
    )
    loss += (
        criteria(warped[:, -1], warped_target[:, -1]) * lambda_geometric
        + criteria(warped_rot[:, -1], warped_rot_target[:, -1]) * lambda_geometric
    )
    return loss, jnp.concatenate([new_zp, new_zp_rot], axis=0)


def real_world_positions(img: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """RGB + unprojected world coordinates per pixel (``loss_functions.py:148-158``).

    Returns (B, 6, HW): rows 0-2 RGB, rows 3-5 world xyz. Stop-grad, as the
    reference operates on ``.array``.
    """
    b, h, w, c = img.shape
    size = w
    k = intrinsics(size)
    inv_k = jnp.linalg.inv(k).astype(jnp.float32)
    p = pixel_grid(size)
    r = mat[:, :3, :3]
    t = mat[:, :3, -1:]
    z = jax.lax.stop_gradient(img[..., -1]).reshape(b, 1, -1)
    rgb = jax.lax.stop_gradient(img[..., :3]).transpose(0, 3, 1, 2).reshape(b, 3, -1)
    real_pos = jnp.matmul(jnp.matmul(r, inv_k), z * p) + t
    return jnp.concatenate([rgb, real_pos], axis=1)


def occupancy_net_loss(
    occupancy_apply,
    depth: jnp.ndarray,
    mat: jnp.ndarray,
    z_latent: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """Occupancy-field sigma cross-entropy on jittered depth samples.

    Reference ``loss_functions.py:160-168``: perturb the rendered depth by
    ``eps ~ N(0, 0.05)``, unproject, and train the occupancy MLP to classify
    whether the jittered point lies behind (eps > 0) the surface. Note the
    reference adds ``eps`` to the *coordinates* a second time
    (``occupancy_net(z, real_pos + eps)``) — quirk preserved.

    :param occupancy_apply: callable ``(z_latent, coords(B,3,HW)) -> logits``
    :param depth: (B, H, W, 1) or (B, 1, H, W)-agnostic depth; flattened here
    """
    b = depth.shape[0]
    size = depth.shape[2] if depth.shape[-1] == 1 else depth.shape[-1]
    k = intrinsics(size)
    inv_k = jnp.linalg.inv(k).astype(jnp.float32)
    p = pixel_grid(size)
    r = mat[:, :3, :3]
    t = mat[:, :3, -1:]
    depth = depth.reshape(b, 1, -1)
    eps = 0.05 * jax.random.normal(key, depth.shape, dtype=depth.dtype)
    real_pos = jnp.matmul(jnp.matmul(r, inv_k), (depth + eps) * p) + t
    label = (eps > 0).reshape(-1, 1).astype(jnp.float32)
    logits = occupancy_apply(z_latent, real_pos + eps)
    # chainer F.sigmoid_cross_entropy with normalize=True: mean BCE-with-logits
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * label + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
