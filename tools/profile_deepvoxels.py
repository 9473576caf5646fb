#!/usr/bin/env python3
"""Profile the DeepVoxels production train step (perfetto through the tunnel).

Builds the trainer-built step like ``tools/bench_deepvoxels.py`` and prints
the device-time breakdown with HLO op_name attribution where available.

Usage: python tools/profile_deepvoxels.py [lift_mode] [N_STEPS]
"""

import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from profile_step import summarize  # noqa: E402  (tools/ sibling)


def run_trace(lift_mode: str, n_steps: int):
    from rgbd_gan_tpu.core.config import load_config
    from rgbd_gan_tpu.data.dataset import synthetic_dataset
    from rgbd_gan_tpu.train.trainer import Trainer

    config = load_config("configs/deepvoxels_shapenet_car.yml")
    config.out = tempfile.mkdtemp(prefix=f"dv_prof_{lift_mode}_")
    config.lift_mode = lift_mode
    config.iteration = 1
    config.snapshot_interval = 10**9
    config.evaluation_sample_interval = 10**9
    config.display_interval = 10**9
    data = synthetic_dataset(32, 64)
    t = Trainer(config, dataset=data, seed=0)
    spec = t._spec_for(iteration=10, stage_floor=8)
    jstep = t._compiled_step(spec)
    state = t.state
    x = jnp.asarray(t.iterator.next())
    alpha = jnp.float32(0.5)

    key = jax.random.PRNGKey(10)
    # AOT lower+compile ONCE so the cost-analysis FLOPs and the profiled
    # executable are the same artifact (a second jit compile through the
    # tunnel costs ~10 min)
    compiled = jstep.lower(state, x, alpha, key).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        print(f"cost_analysis flops/step: {cost.get('flops', 0.0):.4g} "
              "(lower bound: Pallas custom calls are opaque)")
    except Exception as e:  # noqa: BLE001
        print("cost_analysis unavailable:", e)
    step = compiled

    for _ in range(3):
        key, k = jax.random.split(key)
        state, metrics = step(state, x, alpha, k)
        float(jax.device_get(metrics["gen/loss_adv"]))

    tmpdir = tempfile.mkdtemp(prefix="dv_prof_trace_")
    with jax.profiler.trace(tmpdir, create_perfetto_trace=True):
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            state, metrics = step(state, x, alpha, k)
        float(jax.device_get(metrics["gen/loss_adv"]))
    return tmpdir, n_steps


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    d, n = run_trace(mode, n)
    print("trace dir:", d)
    summarize(d, n)
