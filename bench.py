#!/usr/bin/env python3
"""Benchmark: 128x128 RGBD G+D train step throughput (images/sec/chip).

Runs the full RGBD StyleGAN train step — generator forward (paired cameras),
3D-consistency loss with occlusion masking, G Adam update, D phase with the
R1 gradient penalty — at the reference's headline setting
(ffhq_stylegan_occlusion.yml: ch=256, batch 32, stage 10 = 128x128) on the
attached accelerator, in the framework's bf16 mixed-precision mode (f32
params/stats/heads; set BENCH_F32=1 for the pure-f32 path).

Timing is honest: a loss scalar is fetched to the host every SYNC_EVERY
steps. Steps are strictly chained through the (donated) train state, so the
fetch forces completion of every preceding step; syncing in windows only
amortises the host<->device roundtrip latency (~30 ms through the axon
tunnel) without letting dispatch run ahead of execution.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` divides by REFERENCE_IMAGES_PER_SEC, a literature-calibrated
estimate of the Chainer/CuPy reference on a V100 (progressive GANs at 128px
with an R1 penalty and a doubled generator batch run ~30-60 img/s on that
stack; the reference repo publishes no numbers — see BASELINE.md). The
BASELINE.json target is >=10x per chip.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

REFERENCE_IMAGES_PER_SEC = 45.0  # estimated Chainer-GPU (V100) throughput

CH = 256
BATCH = 32
STAGE = 10  # 128x128
FULL_RES = 128
ITERS = 60
WARMUP = 5
SYNC_EVERY = 10


def build(mixed16: bool):
    from rgbd_gan_tpu.core import Config
    from rgbd_gan_tpu.geometry import CameraParamPrior
    from rgbd_gan_tpu.models import Discriminator, StyleGANGenerator, stylegan_make_hidden
    from rgbd_gan_tpu.train import (
        StepSpec,
        TrainState,
        make_optimizer,
        make_rgbd_train_step,
        make_stylegan_gen_optimizer,
    )

    dtype = jnp.bfloat16 if mixed16 else None
    gen = StyleGANGenerator(CH, rgbd=True, compute_dtype=dtype)
    dis = Discriminator(ch=CH, res=True, compute_dtype=dtype)
    z = stylegan_make_hidden(jax.random.PRNGKey(0), BATCH, CH)
    theta9 = jnp.zeros((BATCH, 9))
    params_gen = gen.init(jax.random.PRNGKey(1), z, theta9, method=gen.init_all)["params"]
    params_dis = dis.init(jax.random.PRNGKey(2), jnp.ones((2, 4, 4, 3)), method=dis.init_all)[
        "params"
    ]
    opt_map = make_optimizer(0.001 / 100, 0.0, 0.999)
    opt_gen = make_stylegan_gen_optimizer(0.001, 0.0, 0.999, rgbd=True)
    opt_dis = make_optimizer(0.003, 0.0, 0.999)
    prior = CameraParamPrior(
        Config(
            dict(
                x_rotate=0.3054, y_rotate=1.0472, z_rotate=0,
                x_translate=0, y_translate=0, z_translate=0,
                uniform_distribution=False,
            )
        )
    )
    spec = StepSpec(
        architecture="stylegan",
        stage_floor=STAGE,
        batch_size=BATCH,
        use_rotate=True,
        occlusion_aware=True,
        lambda_gp=1.0,
        lambda_depth=10.0,
        depth_min=1.0,
        lambda_geometric=3.0,
        gather_mode="onehot",  # scatter-free 3D-consistency backward
    )
    state = TrainState(
        params_gen=params_gen,
        params_dis=params_dis,
        opt_map=opt_map.init(params_gen["mapping"]),
        opt_gen=opt_gen.init(params_gen["gen"]),
        opt_dis=opt_dis.init(params_dis),
        ema_gen=None,
        sn_state=None,
        iteration=jnp.int32(0),
    )
    step = jax.jit(  # donate: in-place state update in HBM
        make_rgbd_train_step(
            gen, dis, lambda k, n: stylegan_make_hidden(k, n, CH), prior,
            opt_map, opt_gen, opt_dis, spec,
        ),
        donate_argnums=(0,),
    )
    return state, step


def main():
    mixed16 = os.environ.get("BENCH_F32", "") != "1"
    state, step = build(mixed16)
    x = jax.random.uniform(
        jax.random.PRNGKey(3), (BATCH, FULL_RES, FULL_RES, 3), minval=-1, maxval=1
    )
    alpha = jnp.float32(0.0)

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
            # forces completion of the whole chained window
            loss = float(jax.device_get(metrics["gen/loss_adv"]))
    dt = time.perf_counter() - t0
    assert loss == loss, "NaN loss in benchmark"

    images_per_sec = BATCH * ITERS / dt
    mode = "bf16" if mixed16 else "f32"
    print(
        json.dumps(
            {
                "metric": (
                    "128x128 RGBD G+D train images/sec/chip "
                    f"(stylegan ch=256 batch=32, {mode}, host sync every {SYNC_EVERY} steps)"
                ),
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / REFERENCE_IMAGES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
