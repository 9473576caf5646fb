"""Pallas TPU prototype: fused 3x3 conv + bias + leaky-ReLU block.

Round-3 de-risk experiment for the headline step's remaining MFU gap (the
~51 of ~71 ms in discriminator/generator convolutions, PARITY.md): can a
hand-scheduled Mosaic kernel beat XLA's conv emitters at the progressive
GAN's mid-resolution shapes?

Formulation: implicit GEMM with *static* spatial shifts — no im2col
materialisation and no gathers. Pallas block windows cannot overlap, so
the caller materialises three row-shifted views of the padded input (one
per kernel row); the 3x3 conv is then nine statically-shifted
(TILE_H*W, C_in) x (C_in, C_out) MXU dots accumulated in f32, with bias +
leaky-ReLU fused into the epilogue. NHWC, stride 1, SAME padding; the
equalized-LR input scale folds into the caller's input (``nn/layers.py``).

Status: experimental — not wired into any model; benchmarked standalone
against ``jax.lax.conv_general_dilated`` by ``tools/bench_conv_pallas.py``.
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

TILE_H = 8  # output rows per grid step


def _conv3x3_kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref, *, w, cin, cout, slope):
    acc = jnp.zeros((TILE_H * w, cout), jnp.float32)
    for dy, xr in enumerate((x0_ref, x1_ref, x2_ref)):
        rows = xr[0]  # (TILE_H, W+2, Cin) — kernel-row dy's input rows
        for dx in range(3):
            patch = rows[:, dx:dx + w, :].reshape(TILE_H * w, cin)
            acc += jax.lax.dot_general(
                patch, w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[...].astype(jnp.float32)
    out = jnp.where(acc >= 0, acc, slope * acc)  # fused leaky-ReLU epilogue
    o_ref[0] = out.reshape(TILE_H, w, cout).astype(o_ref.dtype)


def conv3x3_bias_lrelu(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
    slope: float = 0.2, interpret: bool = False,
) -> jnp.ndarray:
    """Fused 3x3 SAME conv + bias + leaky-ReLU. NHWC; kernel HWIO.

    ``x`` (B, H, W, Cin) with H % TILE_H == 0; returns (B, H, W, Cout) in
    x.dtype (f32 accumulation).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % TILE_H == 0, "pad H to a multiple of TILE_H"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B, H+2, W+2, Cin)
    # one non-overlapping blocked view per kernel row (windows cannot overlap)
    shifts = tuple(xp[:, dy:dy + h] for dy in range(3))

    row_spec = pl.BlockSpec((1, TILE_H, w + 2, cin), lambda i, j: (i, j, 0, 0))
    out = pl.pallas_call(
        functools.partial(_conv3x3_kernel, w=w, cin=cin, cout=cout, slope=slope),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=(b, h // TILE_H),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, w, cout), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
    )(*shifts, kernel, bias)
    return out
