#!/usr/bin/env python3
"""A/B the real trainer loop with and without device-side step windows.

bench.py times the raw step with windowed host fetches; the *trainer loop*
additionally pays a synchronous per-iteration NaN-guard fetch (a full host
roundtrip on the axon tunnel). ``step_window`` amortises dispatch + fetch
to one per window — this measures that end-to-end, at the headline config
(stylegan ch=256, batch 32, stage 10) on synthetic 128px data.

Usage: python tools/bench_trainer_loop.py [window ...]   (default: 1 10)
"""

import sys
import tempfile
import time

sys.path.insert(0, ".")

ITERS = 40


def run(window: int) -> float:
    # warm phase must contain at least one full-size window so the timed
    # phase never compiles
    warm = max(8, 2 * window)
    import numpy as np

    from rgbd_gan_tpu.core.config import load_config
    from rgbd_gan_tpu.data.dataset import synthetic_dataset
    from rgbd_gan_tpu.train.trainer import Trainer

    config = load_config("configs/ffhq_stylegan_occlusion.yml")
    config.out = tempfile.mkdtemp(prefix=f"tl_bench_w{window}_")
    config.dataset_path = "unused"
    config.mixed16 = True
    config.step_window = window
    config.stage_interval = ",".join(["0"] * 11)  # pin stage 10
    config.start_rotation = 0
    config.start_occlusion_aware = 0
    config.iteration = warm
    config.snapshot_interval = 10**9
    config.evaluation_sample_interval = 10**9
    config.display_interval = 10**9

    data = synthetic_dataset(64, 128)
    t = Trainer(config, dataset=data, seed=0)
    t.run()  # compile + warm
    # the final row's elapsed_time covers exactly the ITERS loop (the
    # trailing snapshot save is outside it)
    last = t.run(iterations=warm + ITERS)
    return last["elapsed_time"] / ITERS


def main():
    windows = [int(w) for w in sys.argv[1:]] or [1, 10]
    for w in windows:
        dt = run(w)
        print(
            f"step_window={w:3d}: {dt * 1000:7.1f} ms/iter "
            f"({32 / dt:6.1f} img/s trainer-loop)"
        )


if __name__ == "__main__":
    main()
