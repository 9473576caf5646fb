"""Inception-v3 feature extractor (flax, NHWC) for FID / Inception Score.

Architecture-faithful port of the OpenAI ``inception-2015-12-05`` graph used
by the reference (``source/inception/inception_score.py:157-655``): stem of
5 conv+BN layers with two 3x3/2 max pools, mixed blocks 0..10, 8x8 global
average pool to a 2048-d feature, and a 1008-way logit head (indices 1..1000
are the ImageNet classes; 0 and 1001..1007 are dummies). Quirks preserved:
``mixed_10``'s pool branch uses *max* pooling (the torchvision variant uses
avg) and inputs are preprocessed ``(x - 128) * 0.0078125`` from uint8 range.

Weights: the reference downloads the TF checkpoint and converts it
(``source/inception/download.py``); this environment has no network egress,
so ``load_params`` reads a converted ``.npz`` if present (same flat key
scheme as :mod:`..train.checkpoint`) and otherwise falls back to random
init with a loud warning — the FID *machinery* stays exercisable and the
converter (``convert_tf_checkpoint``) can be run wherever the checkpoint
exists.
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

FEATURE_DIM = 2048
NUM_LOGITS = 1008
INPUT_SIZE = 299


class ConvBN(nn.Module):
    """conv (no bias) -> batch norm (inference stats) -> relu.

    He kernel init, NOT the flax default LeCun: converted real weights
    override it anyway, but the random-init fallback must stay
    scale-preserving through ~90 ReLU layers — under LeCun the activations
    decay ~2x per layer, the pool features collapse to ~1e-4 and FID/IS
    degenerate to exactly 0/1 for *any* pair of image sets.
    """

    features: int
    kernel: Tuple[int, int] = (1, 1)
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            use_bias=False,
            kernel_init=nn.initializers.he_normal(),
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


def _pad_for(k: int) -> int:
    return (k - 1) // 2


def _avg_pool_3x3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])


def _max_pool_3x3(x):
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])


def _max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class InceptionA(nn.Module):
    """35x35 block (reference ``mixed``/``mixed_1``/``mixed_2``)."""

    pool_features: int

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(64, name="b1x1")(x)
        b1 = ConvBN(48, name="b5x5_1")(x)
        b1 = ConvBN(64, (5, 5), padding=(2, 2), name="b5x5_2")(b1)
        b2 = ConvBN(64, name="b3x3dbl_1")(x)
        b2 = ConvBN(96, (3, 3), padding=(1, 1), name="b3x3dbl_2")(b2)
        b2 = ConvBN(96, (3, 3), padding=(1, 1), name="b3x3dbl_3")(b2)
        b3 = ConvBN(self.pool_features, name="bpool")(_avg_pool_3x3(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionB(nn.Module):
    """35->17 reduction (reference ``mixed_3``)."""

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(384, (3, 3), stride=2, name="b3x3")(x)
        b1 = ConvBN(64, name="b3x3dbl_1")(x)
        b1 = ConvBN(96, (3, 3), padding=(1, 1), name="b3x3dbl_2")(b1)
        b1 = ConvBN(96, (3, 3), stride=2, name="b3x3dbl_3")(b1)
        b2 = _max_pool_3x3_s2(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionC(nn.Module):
    """17x17 factorized-7x7 block (reference ``mixed_4``..``mixed_7``)."""

    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b0 = ConvBN(192, name="b1x1")(x)
        b1 = ConvBN(c7, name="b7x7_1")(x)
        b1 = ConvBN(c7, (1, 7), padding=(0, 3), name="b7x7_2")(b1)
        b1 = ConvBN(192, (7, 1), padding=(3, 0), name="b7x7_3")(b1)
        b2 = ConvBN(c7, name="b7x7dbl_1")(x)
        b2 = ConvBN(c7, (7, 1), padding=(3, 0), name="b7x7dbl_2")(b2)
        b2 = ConvBN(c7, (1, 7), padding=(0, 3), name="b7x7dbl_3")(b2)
        b2 = ConvBN(c7, (7, 1), padding=(3, 0), name="b7x7dbl_4")(b2)
        b2 = ConvBN(192, (1, 7), padding=(0, 3), name="b7x7dbl_5")(b2)
        b3 = ConvBN(192, name="bpool")(_avg_pool_3x3(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionD(nn.Module):
    """17->8 reduction (reference ``mixed_8``)."""

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(192, name="b3x3_1")(x)
        b0 = ConvBN(320, (3, 3), stride=2, name="b3x3_2")(b0)
        b1 = ConvBN(192, name="b7x7x3_1")(x)
        b1 = ConvBN(192, (1, 7), padding=(0, 3), name="b7x7x3_2")(b1)
        b1 = ConvBN(192, (7, 1), padding=(3, 0), name="b7x7x3_3")(b1)
        b1 = ConvBN(192, (3, 3), stride=2, name="b7x7x3_4")(b1)
        b2 = _max_pool_3x3_s2(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionE(nn.Module):
    """8x8 expanded block (reference ``mixed_9``/``mixed_10``).

    ``pool='max'`` reproduces the OpenAI-graph quirk in ``mixed_10``
    (``inception_score.py`` uses ``_max_pooling_2d`` there).
    """

    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(320, name="b1x1")(x)
        b1 = ConvBN(384, name="b3x3_1")(x)
        b1a = ConvBN(384, (1, 3), padding=(0, 1), name="b3x3_2a")(b1)
        b1b = ConvBN(384, (3, 1), padding=(1, 0), name="b3x3_2b")(b1)
        b1 = jnp.concatenate([b1a, b1b], axis=-1)
        b2 = ConvBN(448, name="b3x3dbl_1")(x)
        b2 = ConvBN(384, (3, 3), padding=(1, 1), name="b3x3dbl_2")(b2)
        b2a = ConvBN(384, (1, 3), padding=(0, 1), name="b3x3dbl_3a")(b2)
        b2b = ConvBN(384, (3, 1), padding=(1, 0), name="b3x3dbl_3b")(b2)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)
        pooled = _max_pool_3x3(x) if self.pool == "max" else _avg_pool_3x3(x)
        b3 = ConvBN(192, name="bpool")(pooled)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """Full FID Inception-v3; input NHWC uint8-range float (0..255)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, get_feature: bool = False) -> jnp.ndarray:
        x = (x - 128.0) * 0.0078125  # reference preprocessing

        h = ConvBN(32, (3, 3), stride=2, name="conv")(x)  # 149
        h = ConvBN(32, (3, 3), name="conv_1")(h)  # 147
        h = ConvBN(64, (3, 3), padding=(1, 1), name="conv_2")(h)
        h = _max_pool_3x3_s2(h)  # 73
        h = ConvBN(80, (1, 1), name="conv_3")(h)
        h = ConvBN(192, (3, 3), name="conv_4")(h)  # 71
        h = _max_pool_3x3_s2(h)  # 35

        h = InceptionA(32, name="mixed")(h)
        h = InceptionA(64, name="mixed_1")(h)
        h = InceptionA(64, name="mixed_2")(h)
        h = InceptionB(name="mixed_3")(h)  # 17
        h = InceptionC(128, name="mixed_4")(h)
        h = InceptionC(160, name="mixed_5")(h)
        h = InceptionC(160, name="mixed_6")(h)
        h = InceptionC(192, name="mixed_7")(h)
        h = InceptionD(name="mixed_8")(h)  # 8
        h = InceptionE(pool="avg", name="mixed_9")(h)
        h = InceptionE(pool="max", name="mixed_10")(h)

        h = jnp.mean(h, axis=(1, 2))  # 8x8 global average pool -> (B, 2048)
        if get_feature:
            return h
        logits = nn.Dense(NUM_LOGITS, name="logit")(h)
        return jax.nn.softmax(logits, axis=-1)


def init_inception(key: jax.Array):
    """Create the model + (random) variables at the canonical input size."""
    model = InceptionV3()
    variables = model.init(key, jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3)))
    return model, variables


def load_params(path: Optional[str], key: Optional[jax.Array] = None):
    """Load converted weights from ``path`` (flat-key npz); random fallback."""
    from ..train.checkpoint import load_tree

    model, variables = init_inception(key if key is not None else jax.random.PRNGKey(0))
    if path is None:
        warnings.warn(
            "No Inception weights supplied — using random init. FID/IS values "
            "will be internally consistent but not comparable to the literature. "
            "Download inception-2015-12-05.tgz (no TF needed) and convert its "
            "classify_image_graph_def.pb with "
            "rgbd_gan_tpu.eval.inception.convert_tf_checkpoint."
        )
        return model, variables
    return model, load_tree(path, variables)


# ---------------------------------------------------------------------------
# TF-checkpoint conversion (no tensorflow needed — see eval/tf_graphdef.py)
# ---------------------------------------------------------------------------

# TF scope (inside a mixed block) -> our branch module name, per block shape.
# Derived from the reference converter's tower walk
# (source/inception/download.py:70-180).
_MAP_A = [  # mixed / mixed_1 / mixed_2 (35x35)
    ("conv", "b1x1"),
    ("tower/conv", "b5x5_1"), ("tower/conv_1", "b5x5_2"),
    ("tower_1/conv", "b3x3dbl_1"), ("tower_1/conv_1", "b3x3dbl_2"),
    ("tower_1/conv_2", "b3x3dbl_3"),
    ("tower_2/conv", "bpool"),
]
_MAP_B = [  # mixed_3 (35->17 reduction)
    ("conv", "b3x3"),
    ("tower/conv", "b3x3dbl_1"), ("tower/conv_1", "b3x3dbl_2"),
    ("tower/conv_2", "b3x3dbl_3"),
]
_MAP_C = [  # mixed_4..mixed_7 (17x17)
    ("conv", "b1x1"),
    ("tower/conv", "b7x7_1"), ("tower/conv_1", "b7x7_2"), ("tower/conv_2", "b7x7_3"),
    ("tower_1/conv", "b7x7dbl_1"), ("tower_1/conv_1", "b7x7dbl_2"),
    ("tower_1/conv_2", "b7x7dbl_3"), ("tower_1/conv_3", "b7x7dbl_4"),
    ("tower_1/conv_4", "b7x7dbl_5"),
    ("tower_2/conv", "bpool"),
]
_MAP_D = [  # mixed_8 (17->8 reduction)
    ("tower/conv", "b3x3_1"), ("tower/conv_1", "b3x3_2"),
    ("tower_1/conv", "b7x7x3_1"), ("tower_1/conv_1", "b7x7x3_2"),
    ("tower_1/conv_2", "b7x7x3_3"), ("tower_1/conv_3", "b7x7x3_4"),
]
_MAP_E = [  # mixed_9 / mixed_10 (8x8)
    ("conv", "b1x1"),
    ("tower/conv", "b3x3_1"),
    ("tower/mixed/conv", "b3x3_2a"), ("tower/mixed/conv_1", "b3x3_2b"),
    ("tower_1/conv", "b3x3dbl_1"), ("tower_1/conv_1", "b3x3dbl_2"),
    ("tower_1/mixed/conv", "b3x3dbl_3a"), ("tower_1/mixed/conv_1", "b3x3dbl_3b"),
    ("tower_2/conv", "bpool"),
]
_BLOCK_MAPS = {
    "mixed": _MAP_A, "mixed_1": _MAP_A, "mixed_2": _MAP_A,
    "mixed_3": _MAP_B,
    "mixed_4": _MAP_C, "mixed_5": _MAP_C, "mixed_6": _MAP_C, "mixed_7": _MAP_C,
    "mixed_8": _MAP_D,
    "mixed_9": _MAP_E, "mixed_10": _MAP_E,
}
_STEM = ["conv", "conv_1", "conv_2", "conv_3", "conv_4"]
BN_EPS = 1e-3  # hardcoded in ConvBN; the graph's variance_epsilon must agree


def iter_conv_mappings():
    """Yield every (tf_conv_scope, flax_module_path) conv+BN pair.

    ``tf_conv_scope`` owns consts ``{scope}/conv2d_params`` and
    ``{scope}/batchnorm/{gamma,beta,moving_mean,moving_variance}``;
    ``flax_module_path`` is the ``/``-joined ConvBN module path in
    :class:`InceptionV3` (e.g. ``mixed_4/b7x7_1``).
    """
    for name in _STEM:
        yield name, name
    for block, pairs in _BLOCK_MAPS.items():
        for tf_scope, branch in pairs:
            yield f"{block}/{tf_scope}", f"{block}/{branch}"


def convert_tf_checkpoint(pb_path: str, out_npz: str) -> dict:
    """Convert the TF ``inception-2015-12-05`` GraphDef to our flat-key npz.

    TF-free twin of the reference converter
    (``source/inception/download.py:35-246``): reads Const tensors straight
    out of the protobuf wire format. Layouts transfer directly — TF conv
    kernels are HWIO like flax's ``nn.Conv`` (the reference transposes to
    OIHW only because Chainer needs it), and the 2048x1008 logit MatMul
    weight matches ``nn.Dense``'s (in, out).

    Returns the flat dict it wrote (handy for tests).
    """
    import warnings as _warnings

    from ..train.checkpoint import _flatten
    from .tf_graphdef import GraphDef

    with open(pb_path, "rb") as f:
        graph = GraphDef(f.read())

    flat = {}
    for tf_scope, module_path in iter_conv_mappings():
        flat[f"params/{module_path}/conv/kernel"] = graph.const_tensor(
            f"{tf_scope}/conv2d_params"
        )
        bn = f"{tf_scope}/batchnorm"
        flat[f"params/{module_path}/bn/scale"] = graph.const_tensor(f"{bn}/gamma")
        flat[f"params/{module_path}/bn/bias"] = graph.const_tensor(f"{bn}/beta")
        flat[f"batch_stats/{module_path}/bn/mean"] = graph.const_tensor(
            f"{bn}/moving_mean"
        )
        flat[f"batch_stats/{module_path}/bn/var"] = graph.const_tensor(
            f"{bn}/moving_variance"
        )
        try:
            eps = graph.float_attr(bn, "variance_epsilon")
            if abs(eps - BN_EPS) > 1e-9:
                _warnings.warn(
                    f"{bn}: variance_epsilon={eps} differs from the model's "
                    f"hardcoded {BN_EPS}; converted scores will drift"
                )
        except KeyError:
            pass  # synthetic graphs may omit the batchnorm op node

    # logit head: the MatMul's weight operand + the bias const
    # (download.py:172-180)
    w_name = graph.node_input("softmax/logits/MatMul", 1)
    w = np.asarray(graph.const_tensor(w_name))
    flat["params/logit/kernel"] = w.reshape(FEATURE_DIM, NUM_LOGITS)
    flat["params/logit/bias"] = np.asarray(
        graph.const_tensor("softmax/biases")
    ).reshape(NUM_LOGITS)

    # validate completeness + shapes against a freshly-initialised template
    _, template = init_inception(jax.random.PRNGKey(0))
    tmpl_flat = _flatten(template)
    missing = sorted(set(tmpl_flat) - set(flat))
    if missing:
        raise ValueError(f"conversion incomplete; missing keys: {missing[:10]}...")
    for k, v in flat.items():
        if k in tmpl_flat and tuple(np.shape(v)) != tuple(tmpl_flat[k].shape):
            raise ValueError(
                f"shape mismatch for {k}: graph {np.shape(v)} vs model "
                f"{tmpl_flat[k].shape}"
            )

    np.savez(out_npz, **flat)
    return flat
