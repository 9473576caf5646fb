"""Scatter-free bilinear gather: separable one-hot einsum (pure XLA).

The autodiff backward of a gather is a *scatter-add*, which serialises badly
on TPU and dominates the 3D-consistency loss step cost. Rewriting the gather
as two separable weighted one-hot contractions

    warped[i, c] = sum_h Au[i, h] * sum_w Av[i, w] * img[h, w, c]

makes both the forward and (by einsum transposition, automatically under
``jax.grad``) the backward pure batched matmuls on the MXU — no scatter
anywhere. Point chunking via ``lax.map`` bounds the (chunk, W*C)
intermediate so HBM stays flat.

Semantics are identical to :func:`..geometry.warp.bilinear_sample`'s gather
(including the ``exact`` u-truncation quirk and mask/gradient behaviour);
parity is enforced in tests against both other routes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CHUNK = 512
UNROLL = 1  # chunk-loop unroll factor (1 = plain lax.map)


def _weighted_onehots(u, v, h, w, exact: bool):
    """Per-point weighted one-hot rows Au (.., h) and Av (.., w)."""
    u_s = jax.lax.stop_gradient(u)
    v_s = jax.lax.stop_gradient(v)
    u0 = u_s.astype(jnp.int32)
    v0 = v_s.astype(jnp.int32)
    mask = ((u_s >= 0) & (u_s < h - 1) & (v_s >= 0) & (v_s < w - 1)).astype(u.dtype)
    u1 = u0 if exact else u0 + 1
    v1 = v0 + 1

    u0f = u0.astype(u.dtype)
    wu0 = (u0f + 1.0 - u) * mask
    wu1 = (u - u0f) * mask
    v0f = v0.astype(v.dtype)
    wv0 = v0f + 1.0 - v
    wv1 = v - v0f

    iota_h = jax.lax.broadcasted_iota(jnp.int32, u.shape + (h,), u.ndim)
    au = jnp.where(iota_h == u0[..., None], wu0[..., None], 0.0)
    au = au + jnp.where(iota_h == u1[..., None], wu1[..., None], 0.0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, v.shape + (w,), v.ndim)
    av = jnp.where(iota_w == v0[..., None], wv0[..., None], 0.0)
    av = av + jnp.where(iota_w == v1[..., None], wv1[..., None], 0.0)
    return au, av, mask


def bilinear_gather_onehot(
    img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, exact: bool = True,
    chunk: int = None, operand_dtype=None,
) -> jnp.ndarray:
    """(B, H, W, C), (B, N), (B, N) -> (B, N, C); u rows, v columns.

    ``operand_dtype=jnp.bfloat16`` feeds the MXU bf16 operands with f32
    accumulation (2x rate; weights/values are in [0, 1]/[-1, 1] so bf16's
    8-bit mantissa costs ~3 decimal digits on the loss — opt-in).
    """
    if chunk is None:
        chunk = CHUNK
    b, h, w, c = img.shape
    n = u.shape[1]
    pad = (-n) % chunk
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad)), constant_values=-10.0)  # OOB -> masked
        v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=-10.0)
    k = u.shape[1] // chunk
    u_c = u.reshape(b, k, chunk).transpose(1, 0, 2)  # (k, B, chunk)
    v_c = v.reshape(b, k, chunk).transpose(1, 0, 2)
    img_r = img.reshape(b, h, w * c)

    @jax.checkpoint
    def one(uv):
        # rematerialised under grad: the one-hot weight matrices are cheap
        # iota compares, while storing them as lax.map residuals costs
        # ~16 MB of HBM traffic per chunk iteration (profiler-confirmed)
        uu, vv = uv
        au, av, _ = _weighted_onehots(uu, vv, h, w, exact)  # (B, chunk, h/w)
        lhs, rhs = au, img_r
        if operand_dtype is not None:
            lhs, rhs = au.astype(operand_dtype), img_r.astype(operand_dtype)
        t = jnp.einsum(
            "bih,bhq->biq", lhs, rhs, preferred_element_type=jnp.float32
        ).reshape(b, chunk, w, c)
        av_ = av.astype(operand_dtype) if operand_dtype is not None else av
        return jnp.einsum(
            "biw,biwc->bic", av_, t.astype(av_.dtype) if operand_dtype is not None else t,
            preferred_element_type=jnp.float32,
        )

    if UNROLL > 1:
        # unrolled scan: fewer loop iterations -> less carry/copy overhead
        _, out = jax.lax.scan(
            lambda carry, uv: (carry, one(uv)), None, (u_c, v_c), unroll=min(UNROLL, k)
        )
    else:
        out = jax.lax.map(one, (u_c, v_c))  # (k, B, chunk, C)
    out = out.transpose(1, 0, 2, 3).reshape(b, k * chunk, c)
    return out[:, :n]
