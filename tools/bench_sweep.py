#!/usr/bin/env python3
"""Quick A/B sweep harness for bench-step variants on the attached chip.

Usage: python tools/bench_sweep.py  — edit VARIANTS below per experiment.
Each variant mutates module constants before building the step, then times
ITERS steps with the chained-state host-fetch method (bench.py semantics).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

ITERS = 30
WARMUP = 4
SYNC_EVERY = 10


def time_step(state, step, x):
    key = jax.random.PRNGKey(10)
    alpha = jnp.float32(0.0)
    for _ in range(WARMUP):
        key, k = jax.random.split(key)
        state, metrics = step(state, x, alpha, k)
        float(jax.device_get(metrics["gen/loss_adv"]))
    t0 = time.perf_counter()
    for i in range(ITERS):
        key, k = jax.random.split(key)
        state, metrics = step(state, x, alpha, k)
        if (i + 1) % SYNC_EVERY == 0:
            loss = float(jax.device_get(metrics["gen/loss_adv"]))
    dt = time.perf_counter() - t0
    assert loss == loss
    return dt / ITERS


def run_variant(name, mutate):
    import importlib

    import bench
    from rgbd_gan_tpu.ops import bilinear_onehot

    importlib.reload(bilinear_onehot)
    mutate()
    state, step = bench.build(mixed16=True)
    x = jax.random.uniform(
        jax.random.PRNGKey(3), (bench.BATCH, bench.FULL_RES, bench.FULL_RES, 3),
        minval=-1, maxval=1,
    )
    ms = time_step(state, step, x) * 1e3
    print(f"{name:40s} {ms:8.2f} ms/step  {bench.BATCH / ms * 1e3:7.1f} img/s", flush=True)


def set_chunk(n):
    def f():
        from rgbd_gan_tpu.ops import bilinear_onehot

        bilinear_onehot.CHUNK = n
    return f


if __name__ == "__main__":
    for name, mut in [
        ("chunk=512 (baseline)", set_chunk(512)),
        ("chunk=1024", set_chunk(1024)),
        ("chunk=2048", set_chunk(2048)),
        ("chunk=4096", set_chunk(4096)),
    ]:
        run_variant(name, mut)
