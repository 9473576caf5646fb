#!/usr/bin/env python3
"""A/B the DeepVoxels production train step: gather vs Pallas frustum lift.

Builds the full trainer from ``configs/deepvoxels_shapenet_car.yml`` on
synthetic data and times the compiled step with the chained-state
host-fetch method (bench.py semantics).

Usage: python tools/bench_deepvoxels.py [mode ...]   (default: gather pallas)
A mode is a lift_mode, optionally with a ":m16" suffix to run the bf16
mixed-precision trunk (config mixed16: True), e.g. "pallas:m16".
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

ITERS = 20
WARMUP = 3
SYNC_EVERY = 5


def time_mode(mode: str) -> float:
    import tempfile

    from rgbd_gan_tpu.core.config import load_config
    from rgbd_gan_tpu.data.dataset import synthetic_dataset
    from rgbd_gan_tpu.train.trainer import Trainer

    lift_mode, _, suffix = mode.partition(":")
    config = load_config("configs/deepvoxels_shapenet_car.yml")
    config.out = tempfile.mkdtemp(prefix=f"dv_bench_{lift_mode}_")
    config.lift_mode = lift_mode
    config.mixed16 = suffix == "m16"
    config.iteration = 1
    config.snapshot_interval = 10**9
    config.evaluation_sample_interval = 10**9
    config.display_interval = 10**9
    data = synthetic_dataset(32, 64)
    t = Trainer(config, dataset=data, seed=0)

    spec = t._spec_for(iteration=10, stage_floor=8)
    step = t._compiled_step(spec)
    state = t.state
    x = jnp.asarray(t.iterator.next())
    alpha = jnp.float32(0.5)

    key = jax.random.PRNGKey(10)
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
    dt = (time.perf_counter() - t0) / ITERS
    assert loss == loss
    return dt


def main():
    modes = sys.argv[1:] or ["gather", "pallas"]
    batch = 10
    for mode in modes:
        dt = time_mode(mode)
        print(
            f"lift_mode={mode}: {dt * 1000:.1f} ms/step "
            f"({batch / dt:.1f} img/s, batch {batch} @ 64px ch=256)"
        )


if __name__ == "__main__":
    main()
