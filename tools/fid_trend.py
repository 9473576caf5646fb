#!/usr/bin/env python3
"""Production-scale eval proof: FID/IS trend across training checkpoints.

Drives the REAL evaluation CLI (``rgbd_gan_tpu.cli.evaluate`` — the
production route through the device-jitted Inception, ``eval/fid.py``) once
per snapshot tag at reference-scale n (default 10k generated images,
``evaluation.py:16-28`` defaults to 50k), recording FID, Inception Score
and wall time per checkpoint. With deterministically-seeded random-init
Inception weights (``eval/inception.py:214-228``) the absolute values are
not literature-comparable, but the *trend* is real evidence: a monotone
fall across checkpoints means the full gen->resize->feature->Gaussian
pipeline works end-to-end at production scale through the tunnel.

Usage:
    python tools/fid_trend.py [--config configs/structured_spheres_stylegan.yml]
        [--tags 4000,12000,24000] [--n 10000] [--batchsize 100] [--ema]
        [--out /tmp/fid_trend.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/structured_spheres_stylegan.yml")
    ap.add_argument("--tags", default="4000,12000,24000")
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--batchsize", type=int, default=100)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--out", default="/tmp/fid_trend.json")
    args = ap.parse_args()

    from rgbd_gan_tpu.cli import evaluate as eval_cli
    from rgbd_gan_tpu.core.config import load_config

    run_out = load_config(args.config).out
    rows = []
    for tag in [t.strip() for t in args.tags.split(",") if t.strip()]:
        argv = [
            "--config_path", args.config, "--snapshot", tag,
            "--fid", "--inception", "--preview",
            "--n_images", str(args.n), "--batchsize", str(args.batchsize),
        ]
        if args.ema:
            argv.append("--ema")
        t0 = time.perf_counter()
        eval_cli.main(argv)
        wall = time.perf_counter() - t0
        fid = float(
            __import__("numpy").loadtxt(
                os.path.join(run_out, "stats", f"fid_{int(tag):0>8}.txt")
            )
        )
        is_mean, is_std = __import__("numpy").loadtxt(
            os.path.join(run_out, "stats", f"inception_score_{int(tag):0>8}.txt")
        )
        rows.append(
            dict(tag=int(tag), fid=fid, is_mean=float(is_mean),
                 is_std=float(is_std), wall_s=round(wall, 1))
        )
        print(f"[fid_trend] tag={tag} FID={fid:.3f} IS={is_mean:.3f} "
              f"wall={wall:.0f}s", flush=True)
        with open(args.out, "w") as f:
            json.dump(dict(config=args.config, n=args.n, ema=args.ema,
                           rows=rows), f, indent=1)
    print(f"[fid_trend] wrote {args.out}")


if __name__ == "__main__":
    main()
