#!/usr/bin/env python3
"""Benchmark: 128x128 RGBD G+D train step throughput (images/sec/chip).

Runs the full RGBD StyleGAN train step — generator forward (paired cameras),
3D-consistency loss with occlusion masking, G Adam update, D phase with the
R1 gradient penalty — at the reference's headline setting
(ffhq_stylegan_occlusion.yml: ch=256, batch 32, stage 10 = 128x128) on the
attached accelerator, in the framework's bf16 mixed-precision mode (f32
params/stats/heads; set BENCH_F32=1 for the pure-f32 path).

Timing is honest: a loss scalar is fetched to the host every SYNC_EVERY
steps (default: once, at the end). Steps are strictly chained through the
(donated) train state — step N cannot start on device before step N-1
completes — so the final fetch forces completion of every preceding step
and the wall time cannot undercount device execution. Each additional
intermediate fetch only *adds* a host<->device roundtrip (~30-60 ms through
the axon tunnel) into the measured window.

Prints one JSON line per tracked metric (headline; opt-in lazy-R1 variant;
deepvoxels production step; the same headline step through shard_map on a
1-device mesh), each shaped:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` divides by REFERENCE_IMAGES_PER_SEC, a literature-calibrated
estimate of the Chainer/CuPy reference on a V100 (progressive GANs at 128px
with an R1 penalty and a doubled generator batch run ~30-60 img/s on that
stack; the reference repo publishes no numbers — see BASELINE.md). The
BASELINE.json target is >=10x per chip.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

# --- TPU-tunnel outage resilience -----------------------------------------
# The axon tunnel's remote-compile endpoint goes down intermittently (round 3's
# driver bench run hit "Unable to initialize backend 'axon': UNAVAILABLE" and
# recorded no number). Probe the backend in a SUBPROCESS (a failed backend
# init is cached in-process) and retry with backoff up to BENCH_RETRY_BUDGET_S
# before giving up; on a mid-run UNAVAILABLE the process re-execs itself so
# the retry starts from a clean backend state. Progress goes to stderr —
# stdout stays JSON-only.

RETRY_BUDGET_S = float(os.environ.get("BENCH_RETRY_BUDGET_S", 2700))
_DEADLINE_ENV = "BENCH_RETRY_DEADLINE"

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128));"
    "print(float(jax.device_get((x @ x).sum())))"
)


def _probe_backend(timeout_s: float = 240.0) -> bool:
    """True iff a fresh process can run a tiny matmul on the attached device."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _retry_deadline() -> float:
    """Monotonic-ish deadline carried across re-execs via the environment."""
    if _DEADLINE_ENV not in os.environ:
        os.environ[_DEADLINE_ENV] = str(time.time() + RETRY_BUDGET_S)
    return float(os.environ[_DEADLINE_ENV])


def _wait_for_backend() -> None:
    deadline = _retry_deadline()
    attempt = 0
    while True:
        if _probe_backend():
            if attempt:
                print(f"bench: backend back after {attempt} retries", file=sys.stderr)
            return
        attempt += 1
        remaining = deadline - time.time()
        if remaining <= 0:
            print(
                "bench: accelerator backend unavailable after "
                f"{RETRY_BUDGET_S:.0f}s of retries — giving up",
                file=sys.stderr,
            )
            sys.exit(1)
        sleep_s = min(120.0, 15.0 * attempt, remaining)
        print(
            f"bench: backend probe failed (attempt {attempt}); retrying in "
            f"{sleep_s:.0f}s ({remaining:.0f}s budget left)",
            file=sys.stderr,
        )
        time.sleep(sleep_s)


def _is_unavailable_error(e: BaseException) -> bool:
    msg = f"{type(e).__name__}: {e}"
    return "UNAVAILABLE" in msg or "Connection refused" in msg


def _reexec_after_outage() -> None:
    """Restart bench.py with the retry deadline preserved (fresh backend)."""
    print("bench: backend lost mid-run; re-exec after probe", file=sys.stderr)
    _wait_for_backend()
    os.execv(sys.executable, [sys.executable] + sys.argv)
# ---------------------------------------------------------------------------

REFERENCE_IMAGES_PER_SEC = 45.0  # estimated Chainer-GPU (V100) throughput

# DeepVoxels denominator: the parity-exact gather/scatter formulation of the
# same production step (the straight transcription of the reference's
# trilinear scatter, deepvoxel/deepvoxel.py:388-428) measures 992-1000 ms at
# batch 10 on this chip (PARITY.md round-1) = ~10 img/s; the Chainer/CuPy
# original publishes nothing and runs the identical algorithm, so this is
# the conservative stand-in baseline.
REFERENCE_DV_IMAGES_PER_SEC = 10.0

CH = int(os.environ.get("BENCH_CH", 256))
BATCH = int(os.environ.get("BENCH_BATCH", 32))
STAGE = int(os.environ.get("BENCH_STAGE", 10))  # 10 = 128x128
FULL_RES = 4 * 2 ** ((STAGE + 1) // 2)
ITERS = int(os.environ.get("BENCH_ITERS", 60))
WARMUP = 5
# how often a loss scalar is fetched to the host. Steps chain through the
# donated train state, so even a single end-of-run fetch forces completion
# of every step (honest wall time); smaller windows just add host-roundtrip
# overhead into the measurement (~5 ms/step through the axon tunnel at 10).
SYNC_EVERY = int(os.environ.get("BENCH_SYNC_EVERY", 60))

# peak dense-matmul TFLOP/s per chip (bf16), keyed by device_kind substring;
# used for the MFU figure so the result stands independent of the
# REFERENCE_IMAGES_PER_SEC estimate
PEAK_BF16_TFLOPS = (
    ("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0), ("v5", 197.0),
    ("v6", 918.0), ("v4", 275.0), ("v3", 123.0), ("v2", 45.0),
)


def _peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in PEAK_BF16_TFLOPS:
        if sub in kind:
            return peak
    return 197.0  # assume v5e-class if unrecognised


def _step_flops(step, *args) -> float:
    """XLA's own FLOP count for the compiled step (0.0 if unavailable)."""
    try:
        cost = step.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def build(mixed16: bool, sharded: bool = False, r1_interval: int = 1):
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
    from rgbd_gan_tpu.parallel.mesh import DATA_AXIS

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
        # scatter-free 3D-consistency backward; BENCH_GATHER overrides for A/B
        gather_mode=os.environ.get("BENCH_GATHER", "hybrid"),
        r1_interval=r1_interval,
        axis_name=DATA_AXIS if sharded else None,
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
    step = make_rgbd_train_step(
        gen, dis, lambda k, n: stylegan_make_hidden(k, n, CH), prior,
        opt_map, opt_gen, opt_dis, spec,
    )
    return state, step  # step is un-jitted (callers jit / shard_map / window it)


def _run(step, state, x, alpha, iters=ITERS, warmup=WARMUP):
    key = jax.random.PRNGKey(10)
    for _ in range(warmup):
        key, k = jax.random.split(key)
        state, metrics = step(state, x, alpha, k)
        float(jax.device_get(metrics["gen/loss_adv"]))

    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        state, metrics = step(state, x, alpha, k)
        if (i + 1) % SYNC_EVERY == 0 and (i + 1) < iters:
            # optional mid-run sync (BENCH_SYNC_EVERY < iters)
            float(jax.device_get(metrics["gen/loss_adv"]))
    # final fetch always: forces completion of the whole chained run
    loss = float(jax.device_get(metrics["gen/loss_adv"]))
    dt = time.perf_counter() - t0
    assert loss == loss, "NaN loss in benchmark"
    return BATCH * iters / dt


def _run_windowed(step, state, x, alpha, window, iters=ITERS, warmup=WARMUP):
    """Time the trainer's step-window path: K steps chained on device per
    dispatch (``train.steps.make_windowed_step``), same per-step math."""
    from rgbd_gan_tpu.train.steps import make_windowed_step

    wstep = jax.jit(make_windowed_step(step, window), donate_argnums=(0,))
    xs = jnp.broadcast_to(x, (window,) + x.shape)
    alphas = jnp.full((window,), alpha, jnp.float32)
    key = jax.random.PRNGKey(10)

    def one(state, key):
        keys = jax.random.split(key, window + 1)
        state, metrics = wstep(state, xs, alphas, keys[1:])
        return state, metrics, keys[0]

    for _ in range(max(warmup // window, 1)):
        state, metrics, key = one(state, key)
        float(jax.device_get(metrics["gen/loss_adv"][-1]))
    n_windows = max(iters // window, 1)
    t0 = time.perf_counter()
    for _ in range(n_windows):
        state, metrics, key = one(state, key)
    # single end fetch: windows chain through the donated state
    loss = float(jax.device_get(metrics["gen/loss_adv"][-1]))
    dt = time.perf_counter() - t0
    assert loss == loss, "NaN loss in benchmark"
    return BATCH * window * n_windows / dt


def _bench_deepvoxels(iters: int = 15, warmup: int = 3, lift_mode=None):
    """Time the DeepVoxels production train step from the shipped config
    (deepvoxels_shapenet_car.yml: batch 10, ch=256, 64px) on synthetic data.
    Returns (images_per_sec, ms_per_step, batch, lift_mode_used).

    ``lift_mode`` overrides the config's lift mode (None = config default,
    resolved by ``_resolve_lift_mode``)."""
    import tempfile

    from rgbd_gan_tpu.core.config import load_config
    from rgbd_gan_tpu.data.dataset import synthetic_dataset
    from rgbd_gan_tpu.train.trainer import Trainer

    config = load_config("configs/deepvoxels_shapenet_car.yml")
    if lift_mode is not None:
        config.lift_mode = lift_mode
    config.out = tempfile.mkdtemp(prefix="bench_dv_")
    config.iteration = 1
    for k in ("snapshot_interval", "evaluation_sample_interval", "display_interval"):
        setattr(config, k, 10**9)
    data = synthetic_dataset(32, 64)
    t = Trainer(config, dataset=data, seed=0)
    step = t._compiled_step(t._spec_for(iteration=10, stage_floor=8))
    state = t.state
    x = jnp.asarray(t.iterator.next())
    alpha = jnp.float32(0.5)
    batch = int(x.shape[0])

    key = jax.random.PRNGKey(10)
    # XLA's own FLOP count so the line carries an estimate-independent
    # MFU figure alongside the vs_baseline ratio (the Pallas lift custom
    # calls are opaque to cost_analysis, so this is a LOWER bound on the
    # step's real FLOPs and the MFU is likewise a lower bound).
    flops = _step_flops(step, state, x, alpha, key)
    for _ in range(warmup):
        key, k = jax.random.split(key)
        state, metrics = step(state, x, alpha, k)
        float(jax.device_get(metrics["gen/loss_adv"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        state, metrics = step(state, x, alpha, k)
    loss = float(jax.device_get(metrics["gen/loss_adv"]))  # chained: one fetch
    dt = (time.perf_counter() - t0) / iters
    assert loss == loss, "NaN loss in deepvoxels benchmark"
    achieved_tflops = flops / dt / 1e12
    return (
        batch / dt, dt * 1000.0, batch, getattr(t.gen, "lift_mode", "?"),
        achieved_tflops,
    )


def main():
    mixed16 = os.environ.get("BENCH_F32", "") != "1"
    window = int(os.environ.get("BENCH_WINDOW", "0"))
    state, raw_step = build(mixed16)
    step = jax.jit(raw_step, donate_argnums=(0,))  # donate: in-place in HBM
    x = jax.random.uniform(
        jax.random.PRNGKey(3), (BATCH, FULL_RES, FULL_RES, 3), minval=-1, maxval=1
    )
    alpha = jnp.float32(0.0)
    key0 = jax.random.PRNGKey(10)
    flops = _step_flops(step, state, x, alpha, key0)

    if window > 1:
        images_per_sec = _run_windowed(raw_step, state, x, alpha, window)
    else:
        images_per_sec = _run(step, state, x, alpha)
    mode = "bf16" if mixed16 else "f32"
    steps_per_sec = images_per_sec / BATCH
    achieved_tflops = flops * steps_per_sec / 1e12
    mfu = achieved_tflops / _peak_tflops() if flops else 0.0
    print(
        json.dumps(
            {
                "metric": (
                    f"{FULL_RES}x{FULL_RES} RGBD G+D train images/sec/chip "
                    f"(stylegan ch={CH} batch={BATCH}, {mode}, host sync every {SYNC_EVERY} steps)"
                ),
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / REFERENCE_IMAGES_PER_SEC, 2),
                "achieved_tflops_per_sec": round(achieved_tflops, 2),
                "mfu_vs_bf16_peak": round(mfu, 4),
            }
        )
    )

    # opt-in lazy R1 (StyleGAN2 §5.1; r1_interval in the yml): the penalty
    # fires every k-th step at weight ×k — the standard production setting.
    # Reported as a separate line; the headline above stays reference-exact.
    lazy_k = int(os.environ.get("BENCH_R1_INTERVAL", "16"))
    if lazy_k > 1:
        state_l, raw_l = build(mixed16, r1_interval=lazy_k)
        step_l = jax.jit(raw_l, donate_argnums=(0,))
        lazy_ips = _run(step_l, state_l, x, alpha)
        print(
            json.dumps(
                {
                    "metric": (
                        f"{FULL_RES}x{FULL_RES} RGBD G+D train images/sec/chip "
                        f"(lazy R1 every {lazy_k} steps x{lazy_k} weight, opt-in)"
                    ),
                    "value": round(lazy_ips, 2),
                    "unit": "images/sec/chip",
                    "vs_baseline": round(lazy_ips / REFERENCE_IMAGES_PER_SEC, 2),
                }
            )
        )

    if os.environ.get("BENCH_SKIP_DEEPVOXELS", "") != "1":
        try:
            dv_ips, dv_ms, dv_batch, dv_mode, dv_tflops = _bench_deepvoxels()
        except Exception as e:  # noqa: BLE001
            # Outages are handled by the outer retry loop; anything else
            # (e.g. a Mosaic rejection of the default windowed lift on a
            # device kind it has not been validated on) falls back once to
            # the device-proven full-width 'pallas' kernel so the driver
            # still records a deepvoxels number.
            if _is_unavailable_error(e):
                raise
            print(
                f"bench: deepvoxels default lift failed ({type(e).__name__}: "
                f"{str(e)[:200]}); retrying with lift_mode=pallas",
                file=sys.stderr,
            )
            dv_ips, dv_ms, dv_batch, dv_mode, dv_tflops = _bench_deepvoxels(
                lift_mode="pallas"
            )
        print(
            json.dumps(
                {
                    "metric": (
                        f"deepvoxels 64x64 G+D train images/sec/chip "
                        f"(production step, batch={dv_batch}, lift_mode {dv_mode})"
                    ),
                    "value": round(dv_ips, 2),
                    "unit": "images/sec/chip",
                    "vs_baseline": round(dv_ips / REFERENCE_DV_IMAGES_PER_SEC, 2),
                    "ms_per_step": round(dv_ms, 1),
                    # lower bounds: cost_analysis cannot see inside the Pallas
                    # lift custom calls (see _bench_deepvoxels)
                    "achieved_tflops_per_sec": round(dv_tflops, 2),
                    "mfu_vs_bf16_peak": round(dv_tflops / _peak_tflops(), 4),
                }
            )
        )

    if os.environ.get("BENCH_SKIP_SHARDED", "") == "1":
        return
    # second line: the same step through shard_map on a 1-device mesh — the
    # sharded code path (fold-in RNG, pmean collectives) exercised on real
    # hardware each round to catch TPU-side shard_map regressions
    from rgbd_gan_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_train_step

    state2, step2 = build(mixed16, sharded=True)
    mesh = make_mesh(jax.devices()[:1])
    sharded_step = shard_train_step(step2, mesh)
    state2 = replicate(state2, mesh)
    xs = shard_batch(jax.device_get(x), mesh)
    alpha_r = replicate(alpha, mesh)
    sharded_ips = _run(sharded_step, state2, xs, alpha_r)
    print(
        json.dumps(
            {
                "metric": "same step via shard_map on a 1-device mesh",
                "value": round(sharded_ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(sharded_ips / REFERENCE_IMAGES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    _wait_for_backend()
    try:
        main()
    except Exception as e:  # noqa: BLE001 — only outage errors are retried
        if _is_unavailable_error(e) and time.time() < _retry_deadline():
            _reexec_after_outage()
        raise
