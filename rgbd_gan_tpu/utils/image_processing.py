"""Image post-processing helpers (``common/utils/image_processing.py:11-33``)."""

from __future__ import annotations

import jax
import numpy as np


def to_host(imgs) -> np.ndarray:
    """Device array / tracer output -> host numpy (the ``copy_to_cpu`` twin)."""
    return np.asarray(jax.device_get(imgs))


def postprocessing_tanh(imgs) -> np.ndarray:
    """[-1, 1] -> uint8."""
    imgs = (to_host(imgs) + 1) * 127.5
    return np.clip(imgs, 0, 255).astype(np.uint8)


def postprocessing_sigmoid(imgs) -> np.ndarray:
    """[0, 1] -> uint8."""
    imgs = to_host(imgs) * 255.0
    return np.clip(imgs, 0, 255).astype(np.uint8)
