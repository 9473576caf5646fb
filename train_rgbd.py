#!/usr/bin/env python3
"""Drop-in entry point matching the reference invocation
(``python train_rgbd.py -g 0 --config_path configs/X.yml``, README.md:56).

Delegates to :mod:`rgbd_gan_tpu.cli.train`; ``-g`` is accepted and ignored
(device selection is JAX's job on TPU).
"""

from rgbd_gan_tpu.cli.train import main

if __name__ == "__main__":
    main()
