#!/usr/bin/env python3
"""Isolated sweep of the 3D-consistency loss fwd+bwd at bench shapes.

The full train step takes 5-10 min to compile through the axon tunnel, so
variants of the gather route are A/B'd here on the loss alone (compiles in
seconds, same shapes as the headline bench: half-batch 16, 128 px, RGBD,
occlusion-aware). Timing uses the chained host-fetch method.

Usage: python tools/sweep_gather.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from rgbd_gan_tpu.geometry.camera import camera_matrices
from rgbd_gan_tpu.geometry.prior import CameraParamPrior
from rgbd_gan_tpu.core import Config
from rgbd_gan_tpu.ops import bilinear_onehot

HALF = 16
SIZE = 128
ITERS = 30
WARMUP = 5


def build_inputs():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    rgb = jax.random.uniform(k1, (HALF * 2, SIZE, SIZE, 3), minval=-1, maxval=1)
    depth = jax.random.uniform(k2, (HALF * 2, SIZE, SIZE, 1), minval=0.8, maxval=1.6)
    img = jnp.concatenate([rgb, depth], axis=-1)
    prior = CameraParamPrior(
        Config(dict(x_rotate=0.3054, y_rotate=1.0472, z_rotate=0,
                    x_translate=0, y_translate=0, z_translate=0,
                    uniform_distribution=False))
    )
    thetas = prior.sample(k3, HALF * 2)
    mats = camera_matrices(thetas)
    return img, mats


def make_fn(gather_mode):
    from rgbd_gan_tpu.geometry.warp import rotate_consistency_loss

    def loss_of(img, mats):
        loss, _ = rotate_consistency_loss(
            img[:HALF], mats[:HALF], img[HALF:], mats[HALF:],
            occlusion_aware=True, lambda_geometric=3.0, gather_mode=gather_mode,
        )
        return loss

    return jax.jit(jax.value_and_grad(loss_of))


def time_fn(fn, img, mats):
    for _ in range(WARMUP):
        loss, g = fn(img, mats)
    float(jax.device_get(loss))
    t0 = time.perf_counter()
    outs = []
    for _ in range(ITERS):
        loss, g = fn(img, mats)
        img = img + 0e-9 * g  # chain steps so dispatch can't run ahead
        outs.append(loss)
    float(jax.device_get(outs[-1]))
    float(jax.device_get(jnp.sum(img[0, 0, 0])))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    img, mats = build_inputs()
    ref = None
    modes = sys.argv[1:] or ["xla", "onehot", "onehot_bf16"]
    for mode in modes:
        for chunk in [512, 1024, 2048]:
            for unroll in [1, 4, 8]:
                if mode in ("xla", "pallas", "pallas_bf16", "hybrid") and (chunk != 512 or unroll != 1):
                    continue
                bilinear_onehot.CHUNK = chunk
                bilinear_onehot.UNROLL = unroll
                fn = make_fn(mode)
                ms = time_fn(fn, img, mats)
                loss, _ = fn(img, mats)
                lv = float(jax.device_get(loss))
                if ref is None:
                    ref = lv
                print(f"{mode:12s} chunk={chunk:5d} unroll={unroll}  "
                      f"{ms:7.3f} ms  loss={lv:.6f} (drift {abs(lv-ref):.2e})",
                      flush=True)


if __name__ == "__main__":
    main()
