"""Checkpoint / resume with the reference's artifact layout and scan logic.

Artifacts every ``snapshot_interval`` iterations, master process only
(``train_rgbd.py:369-381``):

- ``Generator_{iter}.npz``            generator params (+ mapping for stylegan)
- ``Discriminator_{iter}.npz``        discriminator params (+ sn state)
- ``SmoothedGenerator_{iter}.npz``    EMA params (when keep_smoothed_gen)
- ``snapshot_iter_{iter}.npz``        optimizer states + iteration + RNG key
- ``*_latest.npz``                    written at exit (``train_rgbd.py:469-470``)

Auto-resume (``train_rgbd.py:417-459``): scan for ``Generator_*.npz``, keep
only iterations where *all* model files and the trainer snapshot exist, pick
the max, load non-strictly.

Pytrees are flattened to ``/``-joined key paths inside plain ``np.savez``
archives — dependency-free, inspectable, and structurally identical to the
reference's Chainer ``save_npz`` convention.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
            elif hasattr(p, "name"):
                keys.append(str(p.name))
            else:
                keys.append(str(p))
        flat["/".join(keys)] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: Dict[str, np.ndarray], strict: bool = False):
    """Restore a pytree with ``template``'s structure from flat key paths.

    Non-strict (the reference uses ``load_npz(strict=False)``): missing keys
    keep the template's value; extra keys are ignored.
    """
    paths_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves[0]:
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
            elif hasattr(p, "name"):
                keys.append(str(p.name))
            else:
                keys.append(str(p))
        k = "/".join(keys)
        if k in flat:
            leaves.append(np.asarray(flat[k]).astype(np.asarray(leaf).dtype).reshape(np.shape(leaf)))
        elif strict:
            raise KeyError(f"missing key in checkpoint: {k}")
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(paths_leaves[1], leaves)


def save_tree(path: str, tree) -> None:
    np.savez(path, **_flatten(tree))


def load_tree(path: str, template, strict: bool = False):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten_like(template, flat, strict=strict)


def model_names(config) -> List[str]:
    names = ["Generator", "Discriminator"]
    if config.keep_smoothed_gen:
        names.append("SmoothedGenerator")
    return names


def save_snapshot(out_dir: str, state, rng_key, tag: str, config) -> None:
    """Write the per-model + trainer artifacts for ``tag`` (an iteration
    number as string, or 'latest')."""
    os.makedirs(out_dir, exist_ok=True)
    gen_tree = state.params_gen
    if state.gen_state is not None:  # deepvoxels: include BN statistics
        gen_tree = {"params": state.params_gen, "batch_stats": state.gen_state}
    save_tree(os.path.join(out_dir, f"Generator_{tag}.npz"), gen_tree)
    if config.generator_architecture == "deepvoxels":
        # extra mapping artifact for layout parity (train_rgbd.py:374-377)
        save_tree(os.path.join(out_dir, f"Map_{tag}.npz"), state.params_gen["mapping"])
    dis_tree = {"params": state.params_dis}
    if state.sn_state is not None:
        dis_tree["sn"] = state.sn_state
    save_tree(os.path.join(out_dir, f"Discriminator_{tag}.npz"), dis_tree)
    if config.keep_smoothed_gen and state.ema_gen is not None:
        save_tree(os.path.join(out_dir, f"SmoothedGenerator_{tag}.npz"), state.ema_gen)
    trainer_tree = {
        "opt_map": state.opt_map,
        "opt_gen": state.opt_gen,
        "opt_dis": state.opt_dis,
        "iteration": state.iteration,
        "rng_key": rng_key,
    }
    save_tree(os.path.join(out_dir, f"snapshot_iter_{tag}.npz"), trainer_tree)


def load_snapshot(out_dir: str, state, rng_key, tag: str, config):
    """Load artifacts for ``tag`` into (state, rng_key); non-strict."""
    gen_template = state.params_gen
    gen_state = state.gen_state
    if state.gen_state is not None:
        gen_template = {"params": state.params_gen, "batch_stats": state.gen_state}
    gen_tree = load_tree(os.path.join(out_dir, f"Generator_{tag}.npz"), gen_template)
    if state.gen_state is not None:
        params_gen, gen_state = gen_tree["params"], gen_tree["batch_stats"]
    else:
        params_gen = gen_tree
    dis_template = {"params": state.params_dis}
    if state.sn_state is not None:
        dis_template["sn"] = state.sn_state
    dis_tree = load_tree(os.path.join(out_dir, f"Discriminator_{tag}.npz"), dis_template)
    ema_gen = state.ema_gen
    ema_path = os.path.join(out_dir, f"SmoothedGenerator_{tag}.npz")
    if config.keep_smoothed_gen and state.ema_gen is not None and os.path.exists(ema_path):
        ema_gen = load_tree(ema_path, state.ema_gen)
    trainer_template = {
        "opt_map": state.opt_map,
        "opt_gen": state.opt_gen,
        "opt_dis": state.opt_dis,
        "iteration": state.iteration,
        "rng_key": rng_key,
    }
    trainer_tree = load_tree(os.path.join(out_dir, f"snapshot_iter_{tag}.npz"), trainer_template)
    new_state = state.replace(
        params_gen=params_gen,
        gen_state=gen_state,
        params_dis=dis_tree["params"],
        sn_state=dis_tree.get("sn", state.sn_state),
        ema_gen=ema_gen,
        opt_map=trainer_tree["opt_map"],
        opt_gen=trainer_tree["opt_gen"],
        opt_dis=trainer_tree["opt_dis"],
        iteration=trainer_tree["iteration"],
    )
    return new_state, trainer_tree["rng_key"]


def scan_auto_resume(auto_resume_dir: str, names: List[str]) -> Optional[str]:
    """Find the newest complete snapshot set (``train_rgbd.py:417-446``)."""
    if not os.path.isdir(auto_resume_dir):
        return None
    candidates = []
    for fname in os.listdir(auto_resume_dir):
        m = re.fullmatch(r"Generator_(\d+)\.npz", fname)
        if not m:
            continue
        tag = m.group(1)
        complete = all(
            os.path.exists(os.path.join(auto_resume_dir, f"{n}_{tag}.npz")) for n in names
        ) and os.path.exists(os.path.join(auto_resume_dir, f"snapshot_iter_{tag}.npz"))
        if complete:
            candidates.append(tag)
    if not candidates:
        return None
    return max(candidates, key=int)
