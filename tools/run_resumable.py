#!/usr/bin/env python3
"""Run the training CLI until completion, surviving TPU-tunnel outages.

The axon tunnel's remote-compile endpoint goes down intermittently; a long
run then dies with ``UNAVAILABLE`` at the next fresh compile. With
``auto_resume: True`` and a small ``snapshot_interval`` the run is cheap to
resume, so this wrapper loops: probe the backend with a tiny fresh-shape
matmul in a subprocess, launch ``rgbd_gan_tpu.cli.train``, and on a non-zero
exit wait for the backend to come back and relaunch. Exits 0 when a run
completes, 1 when the retry budget is exhausted.

Usage:
    python tools/run_resumable.py --config_path configs/X.yml \
        [--budget_hours 8] [--probe_timeout 240]
"""

import argparse
import os
import subprocess
import sys
import time

PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((157, 157));"
    "print(float(jax.device_get((x @ x).sum())))"
)


def probe(timeout_s: float) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE_SRC],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--budget_hours", type=float, default=8.0)
    ap.add_argument("--probe_timeout", type=float, default=240.0)
    ap.add_argument("--retry_sleep", type=float, default=300.0)
    args = ap.parse_args()

    deadline = time.time() + args.budget_hours * 3600
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        if not probe(args.probe_timeout):
            print(f"[run_resumable] probe failed (attempt {attempt}); "
                  f"sleeping {args.retry_sleep:.0f}s", flush=True)
            time.sleep(args.retry_sleep)
            continue
        print(f"[run_resumable] launching training (attempt {attempt})", flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "rgbd_gan_tpu.cli.train",
             "--config_path", args.config_path],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if r.returncode == 0:
            print("[run_resumable] training completed", flush=True)
            return 0
        print(f"[run_resumable] training exited rc={r.returncode}; "
              f"will probe and resume", flush=True)
        time.sleep(30)
    print("[run_resumable] budget exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
