"""CLI entry point: ``python -m rgbd_gan_tpu.cli.train --config_path configs/X.yml``.

Same interface as the reference driver (``train_rgbd.py:261-265``); the
``--gpu`` flag is accepted for compatibility and ignored (device selection
is JAX's job on TPU).
"""

from __future__ import annotations

import argparse

from ..core.config import load_config
from ..parallel.mesh import maybe_initialize_distributed
from ..train.trainer import REPORT_KEYS, Trainer


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--gpu", "-g", type=int, default=0, help="ignored (TPU-native)")
    parser.add_argument("--config_path", type=str, default="configs/ffhq_stylegan_occlusion.yml")
    parser.add_argument("--iterations", type=int, default=None, help="override config.iteration")
    args = parser.parse_args(argv)

    # multi-host bring-up must precede ANY backend touch (the Trainer calls
    # jax.device_count()); no-op on a single host
    maybe_initialize_distributed()

    config = load_config(args.config_path)
    config.gpu = args.gpu
    print(config.stage_interval)

    trainer = Trainer(config)
    if trainer.resume():
        print(f"Resumed at iteration {int(trainer.state.iteration)}")

    header_printed = False

    def log_cb(row):
        nonlocal header_printed
        if not header_printed:
            print("  ".join(REPORT_KEYS))
            header_printed = True
        print("  ".join(f"{row.get(k, float('nan')):.6g}" if isinstance(row.get(k), float)
                        else str(row.get(k, "")) for k in REPORT_KEYS))

    trainer.run(iterations=args.iterations, log_cb=log_cb)


if __name__ == "__main__":
    main()
