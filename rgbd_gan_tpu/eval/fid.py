"""FID / Inception Score on-device feature extraction + host-side algebra.

Ports ``evaluation.py:16-200`` and the stat-caching ``API`` of
``common/evaluation/fid.py:44-121``:

- ``gen_images``: sample n images from a generator callable (the reference's
  generic ``gen(batchsize)`` signature mismatch with the RGBD generators is
  resolved by the explicit :func:`rgbd_image_sampler` adapter)
- ``get_mean_cov``: bilinear-resize to 299, jitted Inception features on
  device, mean/cov on host
- ``FID = ||m0-m1||^2 + tr(c0 + c1 - 2 sqrt(c0 c1))`` with scipy sqrtm
- ``inception_score``: KL-based IS over softmax predictions (splits=10)
- ``compute_dataset_stat``: cache real-data (mean, cov) to npz like the
  reference's ``API.load_dataset_stat``
- trainer-extension factories ``calc_FID`` / ``calc_inception`` writing
  ``stats/fid_*.txt`` / ``stats/inception_score_*.txt``
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .inception import FEATURE_DIM, INPUT_SIZE, InceptionV3


def rgbd_image_sampler(gen_apply: Callable, make_hidden: Callable, stage_floor: int,
                       alpha: float, theta9_sampler: Optional[Callable] = None) -> Callable:
    """Adapt an RGBD generator to the generic ``gen(batchsize)`` signature
    used by ``gen_images`` (``evaluation.py:16``): sample latents (+poses),
    render, keep RGB."""

    state = {"key": jax.random.PRNGKey(0)}

    def gen(batchsize: int):
        state["key"], kz, kt = jax.random.split(state["key"], 3)
        z = make_hidden(kz, batchsize)
        theta9 = theta9_sampler(kt, batchsize) if theta9_sampler else None
        x = gen_apply(z, stage_floor, jnp.float32(alpha), theta9)
        return x[..., :3]

    return gen


def deepvoxels_image_sampler(gen_apply: Callable, make_hidden: Callable, prior,
                             stage_floor: int, alpha: float) -> Callable:
    """DeepVoxels twin of :func:`rgbd_image_sampler`: the generator takes the
    camera matrices alongside the 9-DoF pose. The key is threaded across
    calls — a constant key would make every ``gen_images`` batch identical
    and degenerate the n>=10k feature covariance (found at production-scale
    eval, round 5)."""
    from ..geometry.camera import camera_matrices, theta_to_9dof

    state = {"key": jax.random.PRNGKey(0)}

    def gen(batchsize: int):
        state["key"], kz, kt = jax.random.split(state["key"], 3)
        thetas6 = prior.sample(kt, batchsize)
        x = gen_apply(
            make_hidden(kz, batchsize), stage_floor, jnp.float32(alpha),
            theta_to_9dof(thetas6), camera_matrices(thetas6),
        )
        return x[..., :3]

    return gen


def gen_images(gen: Callable, n: int = 50000, batchsize: int = 100) -> np.ndarray:
    """Sample n uint8 NHWC images from ``gen(batchsize)`` (tanh range in,
    uint8 out — ``evaluation.py:16-28``)."""
    ims = []
    for _ in range(0, n, batchsize):
        x = np.asarray(jax.device_get(gen(batchsize)))
        x = np.asarray(np.clip(x * 127.5 + 127.5, 0.0, 255.0), dtype=np.uint8)
        ims.append(x)
    return np.concatenate(ims, axis=0)[:n]


def gen_images_with_condition(gen: Callable, c: int = 0, n: int = 500,
                              batchsize: int = 100) -> np.ndarray:
    """Class-conditional sampler twin (``evaluation.py:31-45``); ``gen`` must
    accept ``(batchsize, y)``."""
    ims = []
    for _ in range(0, n, batchsize):
        y = np.full((batchsize,), c, dtype=np.int32)
        x = np.asarray(jax.device_get(gen(batchsize, y=y)))
        x = np.asarray(np.clip(x * 127.5 + 127.5, 0.0, 255.0), dtype=np.uint8)
        ims.append(x)
    return np.concatenate(ims, axis=0)[:n]


def _make_feature_fn(model: InceptionV3, variables, get_feature: bool):
    @jax.jit
    def fn(x):
        # x: (B, H, W, 3) float 0..255; bilinear resize to 299 like
        # chainer F.resize_images (evaluation.py:160-162)
        if x.shape[1] != INPUT_SIZE:
            x = jax.image.resize(
                x, (x.shape[0], INPUT_SIZE, INPUT_SIZE, 3), method="bilinear"
            )
        return model.apply(variables, x, get_feature=get_feature)

    return fn


def inception_features(model, variables, ims: np.ndarray, batch_size: int = 100) -> np.ndarray:
    """(n, 2048) pool features; ims uint8/float NHWC in [0, 255]."""
    fn = _make_feature_fn(model, variables, get_feature=True)
    n = len(ims)
    out = np.empty((n, FEATURE_DIM), dtype=np.float32)
    for i in range(0, n, batch_size):
        batch = jnp.asarray(ims[i : i + batch_size], dtype=jnp.float32)
        out[i : i + batch.shape[0]] = np.asarray(jax.device_get(fn(batch)))
    return out


def inception_softmax(model, variables, ims: np.ndarray, batch_size: int = 100) -> np.ndarray:
    fn = _make_feature_fn(model, variables, get_feature=False)
    n = len(ims)
    out = np.empty((n, 1008), dtype=np.float32)
    for i in range(0, n, batch_size):
        batch = jnp.asarray(ims[i : i + batch_size], dtype=jnp.float32)
        out[i : i + batch.shape[0]] = np.asarray(jax.device_get(fn(batch)))
    return out


def get_mean_cov(model, variables, ims: np.ndarray, batch_size: int = 100):
    """Feature mean + covariance (``evaluation.py:140-169``)."""
    ys = inception_features(model, variables, ims, batch_size)
    return np.mean(ys, axis=0), np.cov(ys.T)


def fid_score(m0, c0, m1, c1) -> float:
    """Frechet distance between feature Gaussians (``evaluation.py:172-176``)."""
    import scipy.linalg

    ret = np.sum((m0 - m1) ** 2)
    ret += np.trace(c0 + c1 - 2.0 * scipy.linalg.sqrtm(np.dot(c0, c1)))
    return float(np.real(ret))


def inception_score(model, variables, ims: np.ndarray, batch_size: int = 100,
                    splits: int = 10) -> Tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over ``splits`` folds
    (``inception_score.py:43-71``; classes 1..1000 of the 1008 logits)."""
    ys = inception_softmax(model, variables, ims, batch_size)[:, 1:1001]
    scores = []
    n = len(ys)
    for i in range(splits):
        part = ys[(i * n // splits) : ((i + 1) * n // splits)]
        kl = part * (np.log(part + 1e-12) - np.log(np.mean(part, axis=0, keepdims=True) + 1e-12))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


def inception_accuracy(model, variables, ims, labels, batch_size: int = 100) -> float:
    """Top-1 accuracy of Inception predictions against labels
    (``inception_score.py:74-107``). ``ims`` may be a list of image sets
    whose softmax outputs are averaged before the argmax."""
    if isinstance(ims, (list, tuple)):
        ys = sum(
            inception_softmax(model, variables, im, batch_size) for im in ims
        ) / len(ims)
    else:
        ys = inception_softmax(model, variables, ims, batch_size)
    return float(np.mean(np.argmax(ys[:, 1:1001], axis=1) == np.asarray(labels)))


def compute_dataset_stat(model, variables, ims: np.ndarray, stat_path: str,
                         batch_size: int = 100):
    """Compute-or-load cached real-data stats (``common/evaluation/fid.py:44-121``)."""
    if os.path.exists(stat_path):
        with np.load(stat_path) as f:
            return f["mean"], f["cov"]
    mean, cov = get_mean_cov(model, variables, ims, batch_size)
    os.makedirs(os.path.dirname(stat_path) or ".", exist_ok=True)
    np.savez(stat_path, mean=mean, cov=cov)
    return mean, cov


def calc_FID(gen: Callable, model, variables, stat_file: str, dst: Optional[str] = None,
             batchsize: int = 100, n_ims: int = 5000) -> Callable:
    """Trainer-extension factory (``evaluation.py:179-200``)."""

    def evaluation(iteration: Optional[int] = None) -> float:
        with np.load(stat_file) as stat:
            m0, c0 = stat["mean"], stat["cov"]
        ims = gen_images(gen, n_ims, batchsize=batchsize).astype("f")
        mean, cov = get_mean_cov(model, variables, ims, batch_size=batchsize)
        fid = fid_score(m0, c0, mean, cov)
        if dst is not None:
            stats_dir = os.path.join(dst, "stats")
            os.makedirs(stats_dir, exist_ok=True)
            np.savetxt(
                os.path.join(stats_dir, "fid_{:0>8}.txt".format(iteration)), np.array([fid])
            )
        return fid

    return evaluation


def calc_inception(gen: Callable, model, variables, dst: Optional[str] = None,
                   batchsize: int = 100, n_ims: int = 50000, splits: int = 10) -> Callable:
    """Trainer-extension factory (``evaluation.py:121-137``)."""

    def evaluation(iteration: Optional[int] = None) -> Tuple[float, float]:
        ims = gen_images(gen, n_ims, batchsize=batchsize).astype("f")
        mean, std = inception_score(model, variables, ims, batch_size=batchsize, splits=splits)
        if dst is not None:
            stats_dir = os.path.join(dst, "stats")
            os.makedirs(stats_dir, exist_ok=True)
            np.savetxt(
                os.path.join(stats_dir, "inception_score_{:0>8}.txt".format(iteration)),
                np.array([mean, std]),
            )
        return mean, std

    return evaluation
