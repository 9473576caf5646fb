"""Evaluation CLI: FID / Inception Score / camera-sweep preview from a run.

The TPU twin of ``evaluation.py`` driven as a standalone tool (the reference
exposes these as trainer extensions plus ad-hoc notebook use):

    python -m rgbd_gan_tpu.cli.evaluate --config_path configs/X.yml \
        [--snapshot latest] [--fid --stat_file stats.npz] [--inception]
        [--preview] [--n_images 5000] [--inception_weights w.npz]

- loads the model set via the trainer's auto-resume machinery
- FID needs a cached real-data stat npz (built on first use from the
  configured dataset via ``compute_dataset_stat``)
- without converted Inception weights the scores use a random-init network
  (internally consistent, not literature-comparable — see eval/inception.py)
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import load_config
from ..core.stage import decompose_stage
from ..eval import fid as fid_mod
from ..eval.inception import load_params
from ..eval.preview import sample_generate_light
from ..geometry.camera import theta_to_9dof
from ..train.trainer import Trainer


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--snapshot", type=str, default="latest")
    p.add_argument("--fid", action="store_true")
    p.add_argument("--inception", action="store_true")
    p.add_argument("--preview", action="store_true")
    p.add_argument("--stat_file", type=str, default=None)
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--n_images", type=int, default=5000)
    p.add_argument("--batchsize", type=int, default=100)
    p.add_argument(
        "--ema",
        action="store_true",
        help="evaluate the smoothed (EMA) generator — the model the reference "
        "previews when keep_smoothed_gen (train_rgbd.py:391-396)",
    )
    args = p.parse_args(argv)

    config = load_config(args.config_path)
    trainer = Trainer(config)
    try:
        trainer.state, trainer.rng_key = __import__(
            "rgbd_gan_tpu.train.checkpoint", fromlist=["load_snapshot"]
        ).load_snapshot(trainer.out, trainer.state, trainer.rng_key, args.snapshot, config)
        print(f"Loaded snapshot '{args.snapshot}' (iteration {int(trainer.state.iteration)})")
    except FileNotFoundError:
        print("No snapshot found — evaluating the freshly initialised model")

    stage = trainer.stage()
    floor, alpha = decompose_stage(stage, trainer.max_stage)

    gen_apply = trainer.gen_apply_eval_ema if args.ema else trainer.gen_apply_eval
    if args.ema and trainer.state.ema_gen is None:
        raise SystemExit("--ema requires a snapshot trained with keep_smoothed_gen")

    if args.preview:
        ext = sample_generate_light(
            gen_apply, trainer.make_hidden_np, trainer.out, config
        )
        path = ext(int(trainer.state.iteration), stage)
        print(f"preview -> {path}")

    if args.fid or args.inception:
        model, variables = load_params(args.inception_weights)

        def theta9_sampler(key, n):
            return theta_to_9dof(trainer.prior.sample(key, n))

        if trainer.arch == "deepvoxels":
            gen = fid_mod.deepvoxels_image_sampler(
                gen_apply, trainer.make_hidden, trainer.prior, floor, alpha,
            )
        else:
            gen = fid_mod.rgbd_image_sampler(
                gen_apply, trainer.make_hidden, floor, alpha,
                theta9_sampler=None if config.rgb else theta9_sampler,
            )

        if args.fid:
            stat_file = args.stat_file or os.path.join(trainer.out, "real_stats.npz")
            if not os.path.exists(stat_file):
                print(f"building real-data stats -> {stat_file}")
                reals = trainer.iterator.images[: args.n_images].astype("float32")
                fid_mod.compute_dataset_stat(model, variables, reals, stat_file,
                                             batch_size=args.batchsize)
            evaluate = fid_mod.calc_FID(
                gen, model, variables, stat_file, dst=trainer.out,
                batchsize=args.batchsize, n_ims=args.n_images,
            )
            print(f"FID@{args.n_images}: {evaluate(int(trainer.state.iteration)):.3f}")

        if args.inception:
            evaluate = fid_mod.calc_inception(
                gen, model, variables, dst=trainer.out,
                batchsize=args.batchsize, n_ims=args.n_images,
            )
            mean, std = evaluate(int(trainer.state.iteration))
            print(f"Inception Score: {mean:.3f} +- {std:.3f}")


if __name__ == "__main__":
    main()
