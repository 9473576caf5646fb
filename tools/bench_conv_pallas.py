#!/usr/bin/env python3
"""Standalone A/B: fused Pallas 3x3 conv block vs XLA at GAN shapes.

Times forward-only conv+bias+lrelu at the progressive-GAN mid-resolution
shapes that dominate the headline step. Chained-output timing; first
measurement of the process is discarded (tunnel warmup).

Usage: python tools/bench_conv_pallas.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rgbd_gan_tpu.ops.conv_pallas import conv3x3_bias_lrelu  # noqa: E402

ITERS = 30
SHAPES = [  # (B, H, W, Cin, Cout) — D/G block shapes at stages 8-10
    (32, 128, 128, 64, 64),
    (32, 128, 128, 64, 128),
    (32, 64, 64, 128, 128),
    (32, 64, 64, 128, 256),
    (32, 32, 32, 256, 256),
]


def xla_ref(x, k, b, slope=0.2):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    return jnp.where(y >= 0, y, slope * y)


def time_fn(fn, x, *rest):
    """One jitted scan of ITERS chained applications — a single dispatch +
    a single completion fetch (per-iteration eager chaining through the
    tunnel dominates the op time otherwise)."""
    cin = x.shape[-1]

    def many(x0):
        def body(c, _):
            o = fn(c, *rest)
            # chain via a non-foldable epsilon (0*o would dead-code the op)
            return c + jnp.asarray(1e-30, c.dtype) * o[..., :cin], o[0, 0, 0, 0]
        c, last = jax.lax.scan(body, x0, None, length=ITERS)
        return jnp.sum(c[0, 0, 0].astype(jnp.float32)) + last[-1].astype(jnp.float32)

    g = jax.jit(many)
    float(jax.device_get(g(x)))  # compile + warm
    t0 = time.perf_counter()
    float(jax.device_get(g(x)))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.RandomState(0)
    warmed = False
    for dtype in (jnp.float32, jnp.bfloat16):
        for (b, h, w, cin, cout) in SHAPES:
            x = jnp.asarray(rng.randn(b, h, w, cin), dtype)
            k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dtype)
            bias = jnp.asarray(rng.randn(cout) * 0.1, dtype)

            f_p = jax.jit(lambda x, k, b: conv3x3_bias_lrelu(x, k, b))
            f_x = jax.jit(xla_ref)
            if not warmed:  # discard the inflated first measurement
                time_fn(f_x, x, k, bias)
                warmed = True
            ms_x = time_fn(f_x, x, k, bias)
            ms_p = time_fn(f_p, x, k, bias)
            # parity check
            yp = np.asarray(f_p(x, k, bias), np.float32)
            yx = np.asarray(f_x(x, k, bias), np.float32)
            err = np.abs(yp - yx).max() / (np.abs(yx).max() + 1e-6)
            flops = 2 * b * h * w * cin * cout * 9
            print(
                f"{str(dtype.__name__):8s} B{b} {h}x{w} {cin}->{cout}: "
                f"xla {ms_x:7.3f} ms ({flops/ms_x/1e9:6.1f} TF/s) | "
                f"pallas {ms_p:7.3f} ms ({flops/ms_p/1e9:6.1f} TF/s) | "
                f"rel-err {err:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
