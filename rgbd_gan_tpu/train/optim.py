"""Optimizers: Adam + global-norm clip(5), per-label LR groups, LR table.

The reference builds one Chainer Adam per model with a
``GradientClipping(5)`` hook (``train_rgbd.py:151-161``); for StyleGAN the
mapping network runs at ``alpha/100`` as a *separate* optimizer (separate
clipping domain, ``train_rgbd.py:316``) and the camera-conditioning layers
``gen.l1/l2`` get a per-parameter ``alpha/100`` override inside the synthesis
optimizer (``train_rgbd.py:323-327``). Here: one optax chain per clipping
domain, with a label-scaled final step for the per-parameter LR override
(Adam's update is linear in alpha, so scaling the transformed update by
1/100 is exactly a per-parameter alpha/100).

The multi-GPU LR boost table (``config.py:3-17``) carries over keyed on
device count.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict

import jax
import optax

# per-(device-count, stage) LR multiplier (reference config.py:3-17)
LR_SCALE_TABLE = {
    1: {15: 1.5, 16: 1.5, 17: 1.5},
    2: {13: 1.5, 14: 1.5, 15: 2, 16: 2, 17: 2},
    3: {11: 1.5, 12: 1.5, 13: 2, 14: 2, 15: 2.5, 16: 2.5, 17: 2.5},
    4: {11: 1.5, 12: 1.5, 13: 2, 14: 2, 15: 3, 16: 3, 17: 3},
    8: {9: 1.5, 10: 1.5, 11: 2, 12: 2, 13: 3, 14: 3, 15: 3, 16: 3, 17: 3},
}


def get_lr_scale_factor(total_devices: int, stage: float) -> float:
    table = LR_SCALE_TABLE.get(total_devices, LR_SCALE_TABLE[1])
    stage = math.floor(stage)
    if stage >= 18:
        return table[17]
    return table.get(stage, 1)


def make_optimizer(alpha: float, beta1: float, beta2: float) -> optax.GradientTransformation:
    """Adam(alpha, beta1, beta2, eps=1e-8) with global-norm clipping at 5,
    matching Chainer's ``GradientClipping(5)`` hook applied before Adam."""
    return optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adam(learning_rate=alpha, b1=beta1, b2=beta2, eps=1e-8),
    )


def scale_updates_by_label(
    label_fn: Callable[[Any], Any], scales: Dict[Any, float]
) -> optax.GradientTransformation:
    """Multiply final updates per-leaf by ``scales[label]`` — a per-parameter
    learning-rate override (exact for Adam, whose step is linear in alpha)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        labels = label_fn(updates)
        updates = jax.tree_util.tree_map(
            lambda u, l: u * scales.get(l, 1.0), updates, labels
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def make_stylegan_gen_optimizer(
    alpha: float,
    beta1: float,
    beta2: float,
    rgbd: bool,
) -> optax.GradientTransformation:
    """Synthesis-network optimizer: Adam + clip(5) with the ``l1``/``l2``
    camera-conditioning layers stepped at ``alpha/100``
    (``train_rgbd.py:323-327``). Clipping spans the whole synthesis tree,
    exactly like the Chainer hook on the ``gen`` optimizer."""

    def label_fn(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        labels = []
        for path, _ in flat:
            keys = [getattr(p, "key", None) for p in path]
            labels.append("slow" if rgbd and ("l1" in keys or "l2" in keys) else "fast")
        treedef = jax.tree_util.tree_structure(tree)
        return jax.tree_util.tree_unflatten(treedef, labels)

    return optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adam(learning_rate=alpha, b1=beta1, b2=beta2, eps=1e-8),
        scale_updates_by_label(label_fn, {"slow": 0.01, "fast": 1.0}),
    )
