#!/usr/bin/env python3
"""Profile the headline bench step and print a device-time breakdown.

Uses the perfetto path that works through the axon tunnel (CLAUDE.md):
``jax.profiler.trace(dir, create_perfetto_trace=True)`` then parse the
emitted ``perfetto_trace.json.gz`` ourselves — sum ``ph=="X"`` slice
durations by name on the device track.

Usage: python tools/profile_step.py [N_STEPS]
"""

import collections
import glob
import gzip
import json
import sys
import tempfile

import jax
import jax.numpy as jnp


def run_trace(n_steps: int = 10):
    sys.path.insert(0, ".")
    import bench

    state, raw_step = bench.build(mixed16=True)
    step = jax.jit(raw_step, donate_argnums=(0,))
    x = jax.random.uniform(
        jax.random.PRNGKey(3), (bench.BATCH, bench.FULL_RES, bench.FULL_RES, 3),
        minval=-1, maxval=1,
    )
    alpha = jnp.float32(0.0)
    key = jax.random.PRNGKey(10)
    for _ in range(3):  # warmup / compile
        key, k = jax.random.split(key)
        state, metrics = step(state, x, alpha, k)
        float(jax.device_get(metrics["gen/loss_adv"]))

    tmpdir = tempfile.mkdtemp(prefix="rgbd_prof_")
    with jax.profiler.trace(tmpdir, create_perfetto_trace=True):
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            state, metrics = step(state, x, alpha, k)
        float(jax.device_get(metrics["gen/loss_adv"]))
    return tmpdir, n_steps


def summarize(tmpdir: str, n_steps: int, top: int = 40):
    paths = glob.glob(f"{tmpdir}/**/perfetto_trace.json.gz", recursive=True)
    assert paths, f"no perfetto trace under {tmpdir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    # device tracks: pid names containing "TPU"/"Device"; fall back to all X events
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items() if ("TPU" in n or "Device" in n or "/device" in n)
    }

    by_name = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        counts[name] += 1
        total += dur

    print(f"pids seen: { {p: n for p, n in pid_names.items()} }")
    print(f"total device slice time: {total:.1f} ms over {n_steps} steps "
          f"=> {total / n_steps:.2f} ms/step (slices can nest; treat as upper bound)")
    print(f"{'ms/step':>9}  {'count':>6}  name")
    for name, ms in by_name.most_common(top):
        print(f"{ms / n_steps:9.3f}  {counts[name]:6d}  {name[:140]}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    d, n = run_trace(n)
    print("trace dir:", d)
    summarize(d, n)
