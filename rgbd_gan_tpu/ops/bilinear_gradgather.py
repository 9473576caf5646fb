"""Hybrid bilinear gather: native-gather forward + scatter-free custom VJP.

The three existing routes trade off badly at the 128 px bench shapes:

- ``xla``: the forward gather is ~free (<0.1 ms profiled), but autodiff's
  backward-to-image is a scatter-add that serialises on TPU (~150 ms).
- ``onehot`` (:mod:`.bilinear_onehot`): scatter-free, but pays the full
  separable one-hot contraction in the *forward* as well, and autodiff adds
  two more einsum passes (d_weights and d_image) plus the remat re-forward —
  ~12 ms for the 3D-consistency loss fwd+bwd, bandwidth-bound on the
  per-point (W*C) intermediate (measured flat under bf16 operands and loop
  unrolling, ``tools/sweep_gather.py``).

This route takes the best half of each: the forward is the plain masked
4-corner gather (bit-identical arithmetic to the ``xla`` route in
``geometry/warp.py:bilinear_sample``), and a ``jax.custom_vjp`` supplies the
backward:

- ``d_u`` / ``d_v`` (the depth-gradient path through the projected
  coordinates) are closed-form from the gathered corner values — elementwise,
  no gather/scatter. In ``exact`` mode the reference's ``u1 = u0`` overwrite
  (``loss_functions.py:219``) makes ``d_u`` identically zero, exactly as
  autodiff of the other routes yields.
- ``d_img`` is ONE chunked separable one-hot einsum pass (the transpose of
  the gather), accumulated over point chunks on the MXU — a third of the
  einsum work of the autodiff'd one-hot route and no scatter anywhere.

Gradient semantics match the other routes: corner indices and the
out-of-bounds mask are constants (stop-grad); gradients flow through the
bilinear weights (u, v) and the gathered values (img).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bilinear_onehot import _weighted_onehots

CHUNK = 512


def _corner_data(img, u, v, exact):
    """Masked corner indices/weights + gathered values (xla-route arithmetic).

    ``u``/``v``: (B, N) row/col coordinates. Returns the four (B, N, C)
    corner values, the four (B, N) weights, and intermediates for d_u/d_v.
    """
    b, h, w, c = img.shape
    n = u.shape[1]
    u_s = jax.lax.stop_gradient(u)
    v_s = jax.lax.stop_gradient(v)

    u0i = u_s.astype(jnp.int32)  # truncation toward zero, as in the reference
    u1i = u0i + 1
    v0i = v_s.astype(jnp.int32)
    v1i = v0i + 1

    u0f = u0i.astype(u.dtype)
    u1f = u1i.astype(u.dtype)
    v0f = v0i.astype(v.dtype)
    v1f = v1i.astype(v.dtype)

    mask_b = (u_s >= 0) & (u_s < h - 1) & (v_s >= 0) & (v_s < w - 1)
    mask = mask_b.astype(img.dtype)
    mask_i = mask_b.astype(jnp.int32)

    u0 = u0i * mask_i
    u1 = u0 if exact else u1i * mask_i  # reference quirk (loss_functions.py:219)
    v0 = v0i * mask_i
    v1 = v1i * mask_i

    w1 = (u1f - u_s) * (v1f - v_s) * mask
    w2 = (u_s - u0f) * (v1f - v_s) * mask
    w3 = (u1f - u_s) * (v_s - v0f) * mask
    w4 = (u_s - u0f) * (v_s - v0f) * mask

    # (v0, v1) are adjacent columns, so ONE row-gather of a shifted *pair
    # table* fetches both v-corners: pairs[i] = [flat[i], flat[i+1]]. The
    # random-access fetch granularity is a full tile regardless of row
    # width, so this halves the gather tiles; the table itself is one cheap
    # sequential materialisation. jnp.take (row gather over a flat table)
    # is the only formulation on XLA's fast TPU gather path — lax.gather
    # with 2C-element slices lowered ~100x slower (as did take_along_axis
    # in round 1). In-bounds points have v0 <= W-2 so the pair never
    # crosses a row; masked points read index 0 and carry zero weights.
    flat = img.reshape(b * h * w, c)
    pairs = jnp.concatenate([flat, jnp.roll(flat, -1, axis=0)], axis=1)  # (BHW, 2C)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]

    def gather_pair(uu):
        out = jnp.take(pairs, (base + uu * w + v0).reshape(-1), axis=0)
        out = out.reshape(b, n, 2 * c)
        return out[..., :c], out[..., c:]

    c00, c01 = gather_pair(u0)
    if exact:
        c10, c11 = c00, c01  # u1 == u0 (reference quirk)
    else:
        c10, c11 = gather_pair(u1)
    return (c00, c10, c01, c11), (w1, w2, w3, w4), (u0f, u1f, v0f, v1f, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bilinear_gather_grad(img, u, v, exact=True):
    """(B, H, W, C), (B, N) rows, (B, N) cols -> (B, N, C).

    Value equals the ``xla`` route bit-for-bit; gradients are scatter-free.
    """
    corners, weights, _ = _corner_data(img, u, v, exact)
    (c00, c10, c01, c11), (w1, w2, w3, w4) = corners, weights
    return (
        w1[..., None] * c00
        + w2[..., None] * c10
        + w3[..., None] * c01
        + w4[..., None] * c11
    )


def _fwd(img, u, v, exact):
    corners, weights, aux = _corner_data(img, u, v, exact)
    (c00, c10, c01, c11), (w1, w2, w3, w4) = corners, weights
    out = (
        w1[..., None] * c00
        + w2[..., None] * c10
        + w3[..., None] * c01
        + w4[..., None] * c11
    )
    # corners are recomputable from (img, u, v) by cheap gathers — storing
    # img (already live) + coords keeps residual HBM small
    return out, (img, u, v)


def _dimg_onehot_pass(u, v, gbar, h, w, exact, chunk):
    """d_img[b,h,w,c] = sum_i au[b,i,h] av[b,i,w] gbar[b,i,c] — one chunked
    einsum pass (the transpose of the gather), accumulated over chunks."""
    b, n, c = gbar.shape
    pad = (-n) % chunk
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad)), constant_values=-10.0)  # OOB -> zero row
        v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=-10.0)
        gbar = jnp.pad(gbar, ((0, 0), (0, pad), (0, 0)))
    k = u.shape[1] // chunk
    u_c = u.reshape(b, k, chunk).transpose(1, 0, 2)
    v_c = v.reshape(b, k, chunk).transpose(1, 0, 2)
    g_c = gbar.reshape(b, k, chunk, c).transpose(1, 0, 2, 3)

    def body(acc, uvg):
        uu, vv, gg = uvg
        au, av, _ = _weighted_onehots(uu, vv, h, w, exact)  # (B, chunk, h/w)
        outer = (av[..., :, None] * gg[..., None, :]).reshape(b, chunk, w * c)
        acc = acc + jnp.einsum(
            "bih,biq->bhq", au, outer, preferred_element_type=jnp.float32
        )
        return acc, None

    acc0 = jnp.zeros((b, h, w * c), jnp.float32)
    # under shard_map with replication checking, the freshly-created zero
    # carry is device-invariant while the body output varies over the data
    # axis — cast the init to the cotangent's varying axes so the scan
    # carry types agree (no-op outside shard_map, where vma is empty)
    vma = getattr(jax.typeof(gbar), "vma", frozenset())
    if vma:
        acc0 = jax.lax.pcast(acc0, tuple(vma), to="varying")
    acc, _ = jax.lax.scan(body, acc0, (u_c, v_c, g_c))
    return acc.reshape(b, h, w, c).astype(gbar.dtype)


def _bwd(exact, res, gbar):
    img, u, v = res
    b, h, w, c = img.shape
    corners, _, (u0f, u1f, v0f, v1f, mask) = _corner_data(img, u, v, exact)
    c00, c10, c01, c11 = corners
    u_s = jax.lax.stop_gradient(u)
    v_s = jax.lax.stop_gradient(v)

    # d/du: dw1/du = -(v1-v), dw2/du = +(v1-v), dw3/du = -(v-v0), dw4/du = +(v-v0)
    # (all masked). In exact mode c10 == c00 and c11 == c01, so du == 0 — the
    # same cancellation autodiff produces for the other routes.
    gdot = lambda a: jnp.sum(gbar * a, axis=-1)  # (B, N)
    du = mask * ((v1f - v_s) * gdot(c10 - c00) + (v_s - v0f) * gdot(c11 - c01))
    dv = mask * ((u1f - u_s) * gdot(c01 - c00) + (u_s - u0f) * gdot(c11 - c10))

    dimg = _dimg_onehot_pass(u, v, gbar, h, w, exact, CHUNK)
    return dimg.astype(img.dtype), du.astype(u.dtype), dv.astype(v.dtype)


bilinear_gather_grad.defvjp(_fwd, _bwd)
