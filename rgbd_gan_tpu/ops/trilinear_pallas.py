"""Pallas TPU kernel: VMEM-resident trilinear frustum lift (DeepVoxels).

The DeepVoxels hot op resamples a 32^3xC voxel grid at ~230k frustum cells
per camera (``models/deepvoxels.lift_frustum``). The XLA gather fetches a
full (8, 128) tile per 128-byte corner row — measured ~245 ms forward on a
v5e — and its backward is a scatter-add. The whole grid is only 4 MB, so the
TPU-native formulation keeps it *resident in VMEM* and expresses the
trilinear sample as a separable weighted one-hot contraction:

    out[i, c] = sum_d0 A0[i, d0] * sum_d1 A1[i, d1] * sum_d2 A2[i, d2]
                * V[d0, d1, d2, c]

Per tile of points: one (TILE, G) @ (G, G*G*C) matmul on the MXU collapses
``d0``, then two cheap VPU weighted reductions collapse ``d1``/``d2`` —
~134M MACs per 128-point tile, ~5 TFLOP total at the production shapes
(~25 ms at bf16 peak vs 245 ms for the gather). The grid block's index map
is constant across the inner tile axis, so Pallas keeps it in VMEM without
re-DMA.

Status: numerically validated against ``lift_frustum`` in interpret mode
(tests); Mosaic compilation is blocked through this environment's axon
tunnel (see CLAUDE.md), so on-device benchmarking is queued for a runtime
with direct TPU access (ROADMAP item 2). Forward-only: wire with
``jax.custom_vjp`` using the transposed contraction for ``dV`` when adopted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

TILE_ROWS = 1  # point tiles of (TILE_ROWS, 128); T buffer = TILE*G*G*C floats
TILE_N = TILE_ROWS * 128


def _axis_weights(idx_f, frac, g, dtype):
    """(N, g) row with (1-frac) at clip(trunc(idx),0,g-1) and frac at +1."""
    i0 = jnp.clip(idx_f.astype(jnp.int32), 0, g - 1)
    i1 = jnp.minimum(i0 + 1, g - 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, idx_f.shape + (g,), idx_f.ndim)
    a = jnp.where(iota == i0[..., None], (1.0 - frac)[..., None], 0.0)
    return a + jnp.where(iota == i1[..., None], frac[..., None], 0.0)


def _lift_kernel(x_ref, y_ref, z_ref, m_ref, grid_ref, out_ref, *, g, c):
    # point tile: voxel-space coords along the three grid axes + validity
    xi = x_ref[0].reshape(TILE_N)
    yi = y_ref[0].reshape(TILE_N)
    zi = z_ref[0].reshape(TILE_N)
    mask = m_ref[0].reshape(TILE_N)

    def frac_of(v):
        i0 = jnp.clip(v.astype(jnp.int32), 0, g - 1)
        return v - i0.astype(v.dtype)

    a0 = _axis_weights(xi, frac_of(xi), g, xi.dtype)  # (N, g) over grid dim0
    a1 = _axis_weights(yi, frac_of(yi), g, yi.dtype)
    a2 = _axis_weights(zi, frac_of(zi), g, zi.dtype)

    grid = grid_ref[0]  # (g, g*g*c): dim0-major flattening of (g, g, g, c)
    t = jnp.dot(a0, grid, preferred_element_type=jnp.float32)  # (N, g*g*c)
    t = t.reshape(TILE_N, g, g * c)
    t = jnp.sum(t * a1[:, :, None], axis=1)  # collapse d1 -> (N, g*c)
    t = t.reshape(TILE_N, g, c)
    out = jnp.sum(t * a2[:, :, None], axis=1)  # collapse d2 -> (N, c)
    out = out * mask[:, None]
    out_ref[0] = out.reshape(TILE_ROWS, 128, c)


def trilinear_lift_pallas(
    voxel: jnp.ndarray, vox_coords: jnp.ndarray, in_bounds: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sample ``voxel`` (B, G, G, G, C) at ``vox_coords`` (B, 3, N).

    ``vox_coords`` rows follow ``models/deepvoxels._lift_corner_data``'s
    axis roles (row 2 -> grid dim0, row 1 -> dim1, row 0 -> dim2);
    ``in_bounds`` (B, N) zeroes out-of-frustum cells. Returns (B, N, C).
    """
    b, g, _, _, c = voxel.shape
    n = vox_coords.shape[2]
    assert n % TILE_N == 0, "pad points to a multiple of TILE_N"
    rows = n // 128

    xi = vox_coords[:, 2].reshape(b, rows, 128)
    yi = vox_coords[:, 1].reshape(b, rows, 128)
    zi = vox_coords[:, 0].reshape(b, rows, 128)
    m = in_bounds.astype(voxel.dtype).reshape(b, rows, 128)
    grid = voxel.reshape(b, g, g * g * c)

    out = pl.pallas_call(
        functools.partial(_lift_kernel, g=g, c=c),
        out_shape=jax.ShapeDtypeStruct((b, rows, 128, c), jnp.float32),
        grid=(b, rows // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((1, TILE_ROWS, 128), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, TILE_ROWS, 128), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, TILE_ROWS, 128), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, TILE_ROWS, 128), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, g, g * g * c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE_ROWS, 128, c), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
    )(xi, yi, zi, m, grid)
    return out.reshape(b, n, c)
