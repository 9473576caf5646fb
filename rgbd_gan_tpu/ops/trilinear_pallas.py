"""Pallas TPU kernel: VMEM-resident trilinear frustum lift (DeepVoxels).

The DeepVoxels hot op resamples a 32^3 x C voxel grid at ~230k frustum cells
per camera (``models/deepvoxels.lift_frustum``). The XLA 8-corner gather
fetches a full (8, 128) tile per corner row — measured ~245 ms forward on a
v5e — and its autodiff backward is a serialised scatter-add (~310 ms more).
The whole grid is only 4 MB, so the TPU-native formulation keeps it
*resident in VMEM* and expresses the trilinear sample as a weighted one-hot
MXU contraction:

    out[i, c] = sum_{d0,d1} A01[i, d0*G+d1] * sum_{d2} A2[i, d2] * V[d0,d1,d2,c]

Per tile of TILE_N points: the (d0, d1) one-hot outer product ``A01``
(TILE_N, G^2) is built in-register from iota compares (<= 4 nonzeros per
row), one (TILE_N, G^2) @ (G^2, G*C) matmul on the MXU collapses (d0, d1),
and a cheap VPU weighted reduction collapses d2. The backward for the grid
is the transposed contraction ``dV += A01^T @ (A2 (x) gbar)`` accumulated in
a VMEM-resident output block across point tiles (coordinates are
non-differentiable, as in the reference, whose projection indices are
computed outside the autograd graph — ``deepvoxel/projection.py:48-105``).

FLOP cost is G^2 MACs per (point, grid-channel-column) — ~4.8 TFLOP at the
production shapes — so ``dtype=jnp.bfloat16`` (operands bf16, f32
accumulation) is the intended production mode (~2x MXU rate; the grid
features tolerate bf16).

The ``window`` variants halve that again: a 1024-point tile is 16 frustum
rows x 64 cols of one depth plane, and when the camera has no z-rotation
the tile's grid-dim1 (d1) reach is provably < 16 planes (the cam2world
row-1 Jacobian has no u-component; measured span <= 10 over the production
prior). The grid operand is laid out d1-major and each tile contracts only
a dynamically-positioned (in-kernel ``pl.ds``) 16*G-row window — w/G of
the MACs, same arithmetic for every in-window point, and out-of-window
points are necessarily masked (their one-hot weights are zero). Mode
selection and the span-invariant gate live in
``models/deepvoxels._resolve_lift_mode``.

Reference hot op: ``deepvoxel/deepvoxel.py:388-428`` (interpolate_trilinear
+ scatter_add). Parity: ``tests/test_trilinear_pallas.py`` (vs the dense
gather lift, fwd + grad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

TILE_ROWS = 8  # Mosaic: block dim -2 must be a multiple of 8
TILE_N = TILE_ROWS * 128


def _axis_terms(idx_f, g):
    """Per-axis corner indices and fractions with ``lift_frustum`` clamping."""
    i0 = jnp.clip(idx_f.astype(jnp.int32), 0, g - 1)
    i1 = jnp.minimum(i0 + 1, g - 1)
    frac = idx_f - i0.astype(idx_f.dtype)
    return i0, i1, frac


def _a01_rows(xi, yi, mask, g, dtype):
    """(TILE_N, g*g) weighted one-hot rows over the fused (d0, d1) axis.

    Built from iota compares (no minor-dim reshape, Mosaic-friendly); the
    validity mask is folded into the d0 weights.
    """
    x0, x1, fx = _axis_terms(xi, g)
    y0, y1, fy = _axis_terms(yi, g)
    j = jax.lax.broadcasted_iota(jnp.int32, (xi.shape[0], g * g), 1)
    d0 = j // g
    d1 = j - d0 * g
    w0 = jnp.where(d0 == x0[:, None], ((1.0 - fx) * mask)[:, None], 0.0)
    w0 = w0 + jnp.where(d0 == x1[:, None], (fx * mask)[:, None], 0.0)
    w1 = jnp.where(d1 == y0[:, None], (1.0 - fy)[:, None], 0.0)
    w1 = w1 + jnp.where(d1 == y1[:, None], fy[:, None], 0.0)
    return (w0 * w1).astype(dtype)


def _a2_expanded(zi, g, c, dtype, d2_lo=0, d2_span=None):
    """(TILE_N, span*c) d2 weights expanded per channel (a2[i, d2*c + cc])
    for d2 in [d2_lo, d2_lo + span) — spanning lets the backward kernel
    process the fused (d2, c) axis in column chunks to fit scoped VMEM."""
    span = g if d2_span is None else d2_span
    z0, z1, fz = _axis_terms(zi, g)
    j = jax.lax.broadcasted_iota(jnp.int32, (zi.shape[0], span * c), 1)
    d2 = j // c + d2_lo
    w2 = jnp.where(d2 == z0[:, None], (1.0 - fz)[:, None], 0.0)
    w2 = w2 + jnp.where(d2 == z1[:, None], fz[:, None], 0.0)
    return w2.astype(dtype)


def _channel_selector(g, c, dtype):
    """(g*c, c) constant 0/1 matrix: S[d2*c + cc, cc] = 1 — summing the
    a2-weighted (d2, c) columns per channel as a matmul (Mosaic rejects the
    (N, g*c) -> (N, g, c) minor-dim shape cast, so no reshape-and-reduce)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (g * c, c), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g * c, c), 1)
    return (rows % c == cols).astype(dtype)


def _lift_fwd_kernel(x_ref, y_ref, z_ref, m_ref, grid_ref, out_ref, *, g, c, dtype):
    xi = x_ref[0].reshape(TILE_N)
    yi = y_ref[0].reshape(TILE_N)
    zi = z_ref[0].reshape(TILE_N)
    mask = m_ref[0].reshape(TILE_N)

    # the frustum extends well past the grid (depth planes beyond the cube,
    # lateral strips outside it): ~24% of 1024-point tiles are fully
    # out-of-bounds under production prior cameras. Masked points already
    # contribute exact zeros (mask folds into the d0 one-hot weights), so
    # skipping the MXU contraction for all-masked tiles is bit-exact.
    any_valid = jnp.sum(mask) > 0.0

    @pl.when(any_valid)
    def _():
        a01 = _a01_rows(xi, yi, mask, g, dtype)  # (N, g*g)
        t = jnp.dot(a01, grid_ref[0], preferred_element_type=jnp.float32)  # (N, g*c)
        # d2 collapse in the operand dtype: in bf16 mode this halves the VMEM
        # working set (the f32 set exceeds the 16 MB scoped budget at c=32)
        a2e = _a2_expanded(zi, g, c, dtype)
        out = jnp.dot(
            t.astype(dtype) * a2e, _channel_selector(g, c, dtype),
            preferred_element_type=jnp.float32,
        )  # (N, c)
        out_ref[0] = out.reshape(TILE_ROWS, 128, c).astype(out_ref.dtype)

    @pl.when(jnp.logical_not(any_valid))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])


def _lift_bwd_kernel(x_ref, y_ref, z_ref, m_ref, g_ref, dv_ref, *, g, c, dtype):
    xi = x_ref[0].reshape(TILE_N)
    yi = y_ref[0].reshape(TILE_N)
    zi = z_ref[0].reshape(TILE_N)
    mask = m_ref[0].reshape(TILE_N)
    gb = g_ref[0].reshape(TILE_N, c).astype(dtype)

    # the full-tile working set overflows the 16 MB scoped-VMEM budget at
    # c=32 (the a01 one-hot build needs several (n, g*g)-sized temps live at
    # once, measured 16.04M) — process the points in sub-tiles so every
    # per-point buffer halves; dV accumulates across sub-tiles and grid
    # steps. Zero-init on the first grid step (one 4 MB VMEM store per
    # batch item) so every contribution can be a *conditional* add: ~26% of
    # 512-point sub-tiles are fully out-of-frustum under production prior
    # cameras and skip the MXU contraction entirely (bit-exact — masked
    # points contribute zero rows to a01).
    subs = 2 if g * g * c >= 32 * 1024 else 1
    n_sub = TILE_N // subs
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    for si in range(subs):
        sel = slice(si * n_sub, (si + 1) * n_sub)
        any_valid = jnp.sum(mask[sel]) > 0.0

        @pl.when(any_valid)
        def _(sel=sel):
            a01 = _a01_rows(xi[sel], yi[sel], mask[sel], g, dtype)
            # e[i, d2*c+cc] = a2[i, d2] * gbar[i, cc]
            a2e = _a2_expanded(zi[sel], g, c, dtype)
            e = a2e * jnp.concatenate([gb[sel]] * g, axis=1)
            # dV[(d0 d1), (d2 c)] += sum_i a01[i, .] e[i, .]
            dv_ref[0] += jax.lax.dot_general(
                a01, e, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _win_start(yi, mask, g, w):
    """Per-tile dynamic window start on the d1 axis: the smallest valid y0,
    clamped so the w-wide window stays inside the grid. Invalid points are
    excluded via a +sentinel (their one-hot weights are zero anyway, so they
    may lie outside the window)."""
    y0 = jnp.clip(yi.astype(jnp.int32), 0, g - 1)
    s = jnp.min(jnp.where(mask > 0.0, y0, g))
    return jnp.clip(s, 0, g - w)


def _a01_rows_win(xi, yi, mask, g, w, s, dtype):
    """(TILE_N, w*g) weighted one-hot rows over the fused (d1-window, d0)
    axis — the d1-major twin of :func:`_a01_rows` restricted to the w rows
    [s, s+w). Valid points are guaranteed in-window by the caller's span
    invariant; out-of-window (necessarily masked) points match no column."""
    x0, x1, fx = _axis_terms(xi, g)
    y0, y1, fy = _axis_terms(yi, g)
    j = jax.lax.broadcasted_iota(jnp.int32, (xi.shape[0], w * g), 1)
    jd1 = j // g
    d1 = jd1 + s
    d0 = j - jd1 * g
    w1 = jnp.where(d1 == y0[:, None], ((1.0 - fy) * mask)[:, None], 0.0)
    w1 = w1 + jnp.where(d1 == y1[:, None], (fy * mask)[:, None], 0.0)
    w0 = jnp.where(d0 == x0[:, None], (1.0 - fx)[:, None], 0.0)
    w0 = w0 + jnp.where(d0 == x1[:, None], fx[:, None], 0.0)
    return (w0 * w1).astype(dtype)


def _lift_fwd_kernel_win(x_ref, y_ref, z_ref, m_ref, grid_ref, out_ref, *, g, c, w, dtype):
    """Windowed forward: the grid operand is d1-MAJOR (rows = d1*g + d0) and
    the MXU contraction only touches the w d1-planes the tile can reach —
    w/g of the full kernel's MACs. Requires the per-tile d1 span invariant
    (``lift_frustum`` gates the mode on ``z_rotate == 0``, which bounds the
    span at ~11 < w; see ``models/deepvoxels._resolve_lift_mode``)."""
    xi = x_ref[0].reshape(TILE_N)
    yi = y_ref[0].reshape(TILE_N)
    zi = z_ref[0].reshape(TILE_N)
    mask = m_ref[0].reshape(TILE_N)
    any_valid = jnp.sum(mask) > 0.0

    @pl.when(any_valid)
    def _():
        s = _win_start(yi, mask, g, w)
        a01 = _a01_rows_win(xi, yi, mask, g, w, s, dtype)  # (N, w*g)
        win = grid_ref[0, pl.ds(pl.multiple_of(s * g, g), w * g), :]
        t = jnp.dot(a01, win, preferred_element_type=jnp.float32)  # (N, g*c)
        a2e = _a2_expanded(zi, g, c, dtype)
        out = jnp.dot(
            t.astype(dtype) * a2e, _channel_selector(g, c, dtype),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = out.reshape(TILE_ROWS, 128, c).astype(out_ref.dtype)

    @pl.when(jnp.logical_not(any_valid))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])


def _lift_bwd_kernel_win(x_ref, y_ref, z_ref, m_ref, g_ref, dv_ref, *, g, c, w, dtype):
    """Windowed backward: dV is accumulated in the d1-major layout; each tile
    read-modify-writes only its w*g-row window. The windowed working set
    (g*w*c) fits scoped VMEM without the full kernel's sub-tiling."""
    xi = x_ref[0].reshape(TILE_N)
    yi = y_ref[0].reshape(TILE_N)
    zi = z_ref[0].reshape(TILE_N)
    mask = m_ref[0].reshape(TILE_N)
    gb = g_ref[0].reshape(TILE_N, c).astype(dtype)
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    any_valid = jnp.sum(mask) > 0.0

    @pl.when(any_valid)
    def _():
        s = _win_start(yi, mask, g, w)
        a01 = _a01_rows_win(xi, yi, mask, g, w, s, dtype)
        a2e = _a2_expanded(zi, g, c, dtype)
        e = a2e * jnp.concatenate([gb] * g, axis=1)
        row0 = pl.multiple_of(s * g, g)
        dv_ref[0, pl.ds(row0, w * g), :] += jax.lax.dot_general(
            a01, e, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _point_blocks(vox_coords, in_bounds, b, rows, ref_dtype):
    xi = vox_coords[:, 2].reshape(b, rows, 128)  # grid spatial dim0
    yi = vox_coords[:, 1].reshape(b, rows, 128)
    zi = vox_coords[:, 0].reshape(b, rows, 128)
    m = in_bounds.astype(ref_dtype).reshape(b, rows, 128)
    return xi, yi, zi, m


def _coord_specs():
    return [pl.BlockSpec((1, TILE_ROWS, 128), lambda i, j: (i, j, 0)) for _ in range(4)]


def trilinear_lift_pallas(
    voxel: jnp.ndarray, vox_coords: jnp.ndarray, in_bounds: jnp.ndarray,
    interpret: bool = False, dtype=None, window: int | None = None,
) -> jnp.ndarray:
    """Forward lift: sample ``voxel`` (B, G, G, G, C) at ``vox_coords`` (B, 3, N).

    ``vox_coords`` rows follow ``models/deepvoxels.lift_frustum``'s axis
    roles (row 2 -> grid dim0, row 1 -> dim1, row 0 -> dim2); ``in_bounds``
    (B, N) zeroes out-of-frustum cells. ``dtype`` selects the MXU operand
    dtype (default f32; ``jnp.bfloat16`` for ~2x). ``window`` (static)
    restricts each point tile's contraction to ``window`` consecutive
    d1-planes (grid dim1) around the tile's reach — window/G of the full
    MACs — and REQUIRES every valid point's y0/y1 to fall within a
    window-wide span per tile (guaranteed by the frustum geometry when the
    camera has no z-rotation; see ``models/deepvoxels._resolve_lift_mode``).
    Returns (B, N, C) f32.
    """
    b, g, _, _, c = voxel.shape
    n = vox_coords.shape[2]
    assert n % TILE_N == 0, "pad points to a multiple of TILE_N"
    rows = n // 128
    dt = dtype or voxel.dtype
    xi, yi, zi, m = _point_blocks(vox_coords, in_bounds, b, rows, vox_coords.dtype)

    if window is None:
        grid = voxel.reshape(b, g * g, g * c).astype(dt)
        kernel = functools.partial(_lift_fwd_kernel, g=g, c=c, dtype=dt)
    else:
        assert 0 < window <= g
        # d1-major rows so a d1 window is a contiguous row slice
        grid = jnp.swapaxes(voxel, 1, 2).reshape(b, g * g, g * c).astype(dt)
        kernel = functools.partial(_lift_fwd_kernel_win, g=g, c=c, w=window, dtype=dt)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, rows, 128, c), jnp.float32),
        grid=(b, rows // TILE_ROWS),
        in_specs=_coord_specs() + [pl.BlockSpec((1, g * g, g * c), lambda i, j: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, TILE_ROWS, 128, c), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
    )(xi, yi, zi, m, grid)
    return out.reshape(b, n, c)


def _trilinear_dv_pallas(gbar, vox_coords, in_bounds, g, c, interpret, dtype,
                         window=None):
    """dV (B, G, G, G, C) from cotangents ``gbar`` (B, N, C)."""
    b, n, _ = gbar.shape
    rows = n // 128
    xi, yi, zi, m = _point_blocks(vox_coords, in_bounds, b, rows, vox_coords.dtype)
    # no pre-kernel operand cast: both backward kernels cast their g_ref tile
    # to the MXU dtype in VMEM, so an XLA-side astype here would only add a
    # full cotangent HBM round trip (~440 MB at production shapes)
    gb = gbar.reshape(b, rows, 128, c)

    if window is None:
        kernel = functools.partial(_lift_bwd_kernel, g=g, c=c, dtype=dtype)
    else:
        kernel = functools.partial(_lift_bwd_kernel_win, g=g, c=c, w=window, dtype=dtype)

    dv = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, g * g, g * c), jnp.float32),
        grid=(b, rows // TILE_ROWS),
        in_specs=_coord_specs()
        + [pl.BlockSpec((1, TILE_ROWS, 128, c), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, g * g, g * c), lambda i, j: (i, 0, 0)),
        interpret=interpret,
    )(xi, yi, zi, m, gb)
    dv = dv.reshape(b, g, g, g, c)
    if window is not None:
        dv = jnp.swapaxes(dv, 1, 2)  # back from the d1-major layout
    return dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def trilinear_lift(voxel, vox_coords, in_bounds, interpret=False, dtype=None,
                   window=None):
    """Differentiable VMEM-resident lift; gradient flows to ``voxel`` only
    (coordinates are index data, as in the reference projection)."""
    return trilinear_lift_pallas(voxel, vox_coords, in_bounds, interpret, dtype, window)


def _lift_fwd(voxel, vox_coords, in_bounds, interpret, dtype, window):
    out = trilinear_lift_pallas(voxel, vox_coords, in_bounds, interpret, dtype, window)
    # only voxel's shape/dtype are needed, but residuals must be JAX values
    return out, (jnp.zeros(voxel.shape[1:] + (0,), voxel.dtype), vox_coords, in_bounds)


def _lift_bwd(interpret, dtype, window, res, gbar):
    (vproto, vox_coords, in_bounds) = res
    g, _, _, c, _ = vproto.shape
    dv = _trilinear_dv_pallas(
        gbar, vox_coords, in_bounds, g, c, interpret, dtype or vproto.dtype,
        window,
    )
    return dv.astype(vproto.dtype), None, None


trilinear_lift.defvjp(_lift_fwd, _lift_bwd)
