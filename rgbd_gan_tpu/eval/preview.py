"""Preview rendering: camera-sweep grids with interleaved RGB/depth rows.

Twin of ``sample_generate_light`` (``train_rgbd.py:39-92``) and
``convert_batch_images`` (``common/utils/save_images.py:9-24``):

- fixed seed; the same z is tiled down each column and the yaw sweeps
  ``linspace(-test_y_rotate, +test_y_rotate, rows)``
- depth rows are colourised as ``clip(1/depth * 128, 0, 255)``
- outputs ``[out]/preview/image_latest.png`` and a 10k-floored snapshot name
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from ..core.stage import decompose_stage
from ..geometry.camera import camera_matrices_np


def convert_batch_images(x: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """(rows*cols, C, H, W) float in [-1,1] (+inverse-depth ch) -> uint8 grid.

    Accepts NCHW like the reference; RGBD inputs produce interleaved
    RGB/depth row pairs.
    """
    rgbd = x.shape[1] == 4
    if rgbd:
        depth = np.tile(x[:, -1:], (1, 3, 1, 1))
        x = x[:, :-1]
    x = np.asarray(np.clip(x * 127.5 + 127.5, 0.0, 255.0), dtype=np.uint8)
    _, _, h, w = x.shape
    x = x.reshape((rows, cols, 3, h, w))
    if rgbd:
        depth = np.asarray(np.clip(1 / depth * 128, 0.0, 255.0), dtype=np.uint8)
        depth = depth.reshape((rows, cols, 3, h, w))
        x = np.concatenate([x, depth], axis=1).reshape(rows * 2, cols, 3, h, w)
    x = x.transpose(0, 3, 1, 4, 2)
    return x.reshape((-1, cols * w, 3))


def render_preview_grid(
    gen_apply: Callable,
    make_hidden: Callable,
    config,
    stage: float,
    rows: int = 8,
    cols: int = 8,
    seed: int = 0,
) -> np.ndarray:
    """Render the camera-sweep preview grid; returns a uint8 HxWx3 array.

    ``gen_apply(z, stage_floor, alpha, theta9, train=False)`` must return
    NHWC images; ``make_hidden(np_rng, n)`` samples latents host-side so the
    fixed-seed behaviour matches the reference's ``np.random.seed(seed)``.
    """
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    n_images = cols
    z = make_hidden(rng, n_images)
    # same z tiled down each column (train_rgbd.py:52)
    z = np.tile(z[:, None], (1, rows) + (1,) * (z.ndim - 1)).reshape(rows * cols, *z.shape[1:])

    if config.rgb:
        theta9 = None
        mats = None
    else:
        theta = np.zeros((rows * cols, 6), dtype="float32")
        theta[:, 1] = np.tile(
            np.linspace(-config.test_y_rotate, config.test_y_rotate, rows), cols
        )
        theta9 = jnp.asarray(np.concatenate(
            [np.cos(theta[:, :3]), np.sin(theta[:, :3]), theta[:, 3:]], axis=1
        ).astype("float32"))
        mats = jnp.asarray(camera_matrices_np(theta))

    floor, alpha = decompose_stage(stage, config.max_stage or 17)
    # render in fixed-size chunks: one whole-grid forward OOMs HBM next to
    # the live train state for the heavier generators (the DeepVoxels
    # frustum volumes alone are ~30 MB/image); eval-mode forwards are
    # per-sample independent, so chunking is output-identical
    zs = jnp.asarray(z)
    chunk = 16
    outs = []
    for i in range(0, zs.shape[0], chunk):
        sl = slice(i, i + chunk)
        t9 = None if theta9 is None else theta9[sl]
        ms = None if mats is None else mats[sl]
        try:
            xi = gen_apply(zs[sl], floor, jnp.float32(alpha), t9, ms)
        except TypeError:
            xi = gen_apply(zs[sl], floor, jnp.float32(alpha), t9)
        outs.append(np.asarray(xi))
    x = np.concatenate(outs, axis=0).transpose(0, 3, 1, 2)  # NHWC -> NCHW
    return convert_batch_images(x, rows, cols)


def sample_generate_light(
    gen_apply: Callable,
    make_hidden: Callable,
    dst: str,
    config,
    rows: int = 8,
    cols: int = 8,
    seed: int = 0,
    subdir: str = "preview",
) -> Callable:
    """Trainer extension: writes ``image_latest.png`` + the 10k-floored
    snapshot image every trigger (``train_rgbd.py:83-90``)."""

    def extension(iteration: int, stage: float) -> str:
        grid = render_preview_grid(gen_apply, make_hidden, config, stage, rows, cols, seed)
        try:
            from PIL import Image
        except ImportError:  # pragma: no cover
            np.save(os.path.join(dst, f"{subdir}_latest.npy"), grid)
            return ""
        preview_dir = os.path.join(dst, subdir)
        os.makedirs(preview_dir, exist_ok=True)
        img = Image.fromarray(grid)
        latest = os.path.join(preview_dir, "image_latest.png")
        img.save(latest)
        img.save(os.path.join(preview_dir, "image{:0>8}.png".format(iteration // 10000 * 10000)))
        return latest

    return extension
