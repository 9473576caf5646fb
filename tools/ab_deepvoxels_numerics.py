#!/usr/bin/env python3
"""bf16-trunk numerics evidence for the DeepVoxels path (VERDICT round-4 #2).

Trains the SAME config twice on the 64px structured-sphere dataset — once
with the reference-exact f32 trunk, once with ``mixed16: True`` (bf16 conv
stacks in the voxel generator / refiner / D; the frustum lift, occlusion
reasoning and depth decode stay f32 — ``models/deepvoxels.py``) — and
compares the loss trajectories and the depth statistics of the final
preview sweep. Both runs share the per-variant out dir so each can
auto-resume across tunnel outages.

Usage:
    python tools/ab_deepvoxels_numerics.py [--iters 3000] [--variants f32,m16]

Prints a windowed-mean trajectory table plus final depth stats; the
decision writeup lives in docs/deepvoxels_ceiling.md.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIG = "configs/structured_spheres_deepvoxels.yml"
KEYS = ["gen/loss_adv", "dis/loss_adv", "gen/loss_rotate", "dis/loss_gp"]


def run_variant(name: str, mixed16: bool, iters: int) -> str:
    """Train (or resume) one variant; returns the log.jsonl path."""
    from rgbd_gan_tpu.cli.train import main as train_main
    from rgbd_gan_tpu.core.config import load_config
    import yaml

    config = load_config(CONFIG)
    config.mixed16 = mixed16
    config.iteration = iters
    config.out = f"/tmp/dv_numerics_{name}"
    cfg_path = f"/tmp/dv_numerics_{name}.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config.to_dict(), f)
    train_main(["--config_path", cfg_path])
    return os.path.join(config.out, "log.jsonl")


def load_log(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def window_means(rows, key: str, n_windows: int = 6):
    vals = np.array([r[key] for r in rows if key in r and r[key] is not None])
    if not len(vals):
        return []
    splits = np.array_split(vals, n_windows)
    return [float(np.mean(s)) for s in splits]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--variants", type=str, default="f32,m16")
    ap.add_argument("--report_only", action="store_true",
                    help="skip training; just compare existing logs")
    args = ap.parse_args()

    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    logs = {}
    for name in variants:
        if not args.report_only:
            run_variant(name, mixed16=(name == "m16"), iters=args.iters)
        logs[name] = load_log(f"/tmp/dv_numerics_{name}/log.jsonl")

    for key in KEYS:
        print(f"\n{key} (windowed means over the run):")
        for name in variants:
            means = window_means(logs[name], key)
            print(f"  {name:>4}: " + "  ".join(f"{m:8.4f}" for m in means))

    # trajectory divergence: relative gap of the last-third means
    for key in KEYS:
        tails = {}
        for name in variants:
            means = window_means(logs[name], key)
            if means:
                tails[name] = np.mean(means[-2:])
        if len(tails) == 2:
            a, b = [tails[v] for v in variants]
            denom = max(abs(a), abs(b), 1e-9)
            print(f"last-third gap {key}: {abs(a - b) / denom * 100:.1f}%"
                  f"  ({variants[0]}={a:.4f} vs {variants[1]}={b:.4f})")


if __name__ == "__main__":
    main()
