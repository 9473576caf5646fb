"""TF-free GraphDef executor for the ``inception-2015-12-05`` op set.

The reference's TF-side IS/FID path (``source/inception/inception_score_tf.py:
29-46,130-153``) imports the raw ``classify_image_graph_def.pb`` into a TF
session, feeds ``ExpandDims:0`` and fetches ``pool_3:0``. This image has no
tensorflow, so this module *interprets* the parsed GraphDef
(:mod:`.tf_graphdef`) directly in numpy, with TensorFlow's op semantics:

- ``SAME`` padding is TF's asymmetric split (extra row/col at the END);
- ``AvgPool`` divides by the number of un-padded elements in each window
  (count-EXCLUDE-padding) — note this deliberately differs from the
  reference's own Chainer reimplementation (``inception_score.py:155-655``)
  and our flax twin, which count-include-pad; the two reference paths carry
  the same border divergence, and we preserve each side faithfully;
- ``ResizeBilinear`` uses TF1's asymmetric (non-half-pixel) source grid,
  ``src = dst * (in/out)``, with the ``align_corners`` attr honoured;
- ``BatchNormWithGlobalNormalization`` follows the deprecated op's formula
  with the ``scale_after_normalization`` switch.

Pure numpy on purpose: the executor is the parity/validation path (run the
pb as TF would, compare against the production flax model from the
converter); the production eval path is :mod:`.fid` on the flax net. Keeping
it numpy avoids dispatching hundreds of eager ops through a remote device.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple, Union

import numpy as np

from .tf_graphdef import GraphDef

__all__ = ["GraphExecutor"]


# ---------------------------------------------------------------------------
# op helpers (all NHWC, float32/float64 numpy)
# ---------------------------------------------------------------------------


def _same_pad(in_size: int, k: int, s: int) -> Tuple[int, int]:
    """TF SAME padding: total = max((ceil(in/s)-1)*s + k - in, 0), the odd
    element goes AFTER (bottom/right)."""
    out = -(-in_size // s)
    total = max((out - 1) * s + k - in_size, 0)
    before = total // 2
    return before, total - before


def _pad2d(x: np.ndarray, k: Tuple[int, int], s: Tuple[int, int], padding: str,
           fill: float) -> np.ndarray:
    if padding == "VALID":
        return x
    if padding != "SAME":
        raise ValueError(f"unsupported padding {padding!r}")
    ph = _same_pad(x.shape[1], k[0], s[0])
    pw = _same_pad(x.shape[2], k[1], s[1])
    return np.pad(x, ((0, 0), ph, pw, (0, 0)), constant_values=fill)


def _conv2d(x: np.ndarray, w: np.ndarray, strides: Sequence[int],
            padding: str) -> np.ndarray:
    """NHWC x, HWIO w; shifted-tensordot accumulation (no im2col blowup)."""
    sh, sw = int(strides[1]), int(strides[2])
    kh, kw, ci, co = w.shape
    if x.shape[-1] != ci:
        raise ValueError(f"conv channel mismatch {x.shape} vs {w.shape}")
    x = _pad2d(x, (kh, kw), (sh, sw), padding, 0.0)
    n, h, ww_, _ = x.shape
    oh = (h - kh) // sh + 1
    ow = (ww_ - kw) // sw + 1
    out = np.zeros((n, oh, ow, co), dtype=np.result_type(x, w))
    for i in range(kh):
        for j in range(kw):
            patch = x[:, i : i + oh * sh : sh, j : j + ow * sw : sw, :]
            out += np.tensordot(patch, w[i, j], axes=([3], [0]))
    return out


def _pool2d(x: np.ndarray, ksize: Sequence[int], strides: Sequence[int],
            padding: str, kind: str) -> np.ndarray:
    kh, kw = int(ksize[1]), int(ksize[2])
    sh, sw = int(strides[1]), int(strides[2])
    fill = 0.0 if kind == "avg" else -np.inf
    xp = _pad2d(x, (kh, kw), (sh, sw), padding, fill)
    n, h, w, c = xp.shape
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    acc = None
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i : i + oh * sh : sh, j : j + ow * sw : sw, :]
            if acc is None:
                acc = patch.astype(np.float64) if kind == "avg" else patch.copy()
            elif kind == "avg":
                acc = acc + patch
            else:
                acc = np.maximum(acc, patch)
    if kind == "max":
        return acc
    # TF AvgPool: divide by the count of elements NOT from padding
    ones = _pad2d(np.ones(x.shape[:3] + (1,), np.float64), (kh, kw), (sh, sw),
                  padding, 0.0)
    cnt = None
    for i in range(kh):
        for j in range(kw):
            patch = ones[:, i : i + oh * sh : sh, j : j + ow * sw : sw, :]
            cnt = patch.copy() if cnt is None else cnt + patch
    return (acc / cnt).astype(x.dtype)


def _resize_bilinear(x: np.ndarray, size: Sequence[int],
                     align_corners: bool) -> np.ndarray:
    """TF1 ResizeBilinear (half_pixel_centers=False)."""
    n, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])

    def _grid(in_s: int, out_s: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if align_corners and out_s > 1:
            src = np.arange(out_s, dtype=np.float64) * (in_s - 1) / (out_s - 1)
        else:
            src = np.arange(out_s, dtype=np.float64) * (in_s / out_s)
        i0 = np.clip(np.floor(src).astype(np.int64), 0, in_s - 1)
        i1 = np.minimum(i0 + 1, in_s - 1)
        frac = src - i0
        return i0, i1, frac

    y0, y1, fy = _grid(h, oh)
    x0, x1, fx = _grid(w, ow)
    top = x[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y0][:, :, x1] * fx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y1][:, :, x1] * fx[None, None, :, None]
    out = top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# the executor
# ---------------------------------------------------------------------------


def _strip(tensor_name: str) -> str:
    return tensor_name.split(":")[0].lstrip("^")


class GraphExecutor:
    """Evaluate tensors of a parsed GraphDef with numpy.

    ``run(fetch, feeds)`` accepts node or ``node:0`` names for both the
    fetch and the feed keys (only output :0 is modelled — the inception
    graph is single-output throughout). Node results are memoised per
    ``run`` call.
    """

    def __init__(self, graph: GraphDef):
        self.graph = graph

    # -- public --------------------------------------------------------------

    def run(self, fetch: Union[str, Sequence[str]],
            feeds: Dict[str, np.ndarray] = None):
        feeds = {_strip(k): np.asarray(v) for k, v in (feeds or {}).items()}
        fetches = [fetch] if isinstance(fetch, str) else list(fetch)
        cache: Dict[str, np.ndarray] = dict(feeds)
        outs = [self._eval(_strip(f), cache) for f in fetches]
        return outs[0] if isinstance(fetch, str) else outs

    # -- evaluation ----------------------------------------------------------

    def _eval(self, name: str, cache: Dict[str, np.ndarray]) -> np.ndarray:
        """Iterative post-order evaluation (the real pb is ~100 levels deep;
        no recursion-limit games)."""
        stack: List[str] = [name]
        while stack:
            cur = stack[-1]
            if cur in cache:
                stack.pop()
                continue
            node = self.graph.nodes.get(cur)
            if node is None:
                raise KeyError(f"no node named {cur!r} in graph (and not fed)")
            deps = [_strip(i) for i in node["inputs"]]
            missing = [d for d in deps if d not in cache]
            if missing:
                stack.extend(missing)
                continue
            stack.pop()
            cache[cur] = self._apply(cur, node, [cache[d] for d in deps])
        return cache[name]

    def _apply(self, name: str, node: dict, ins: List[np.ndarray]) -> np.ndarray:
        op = node["op"]
        g = self.graph
        if op == "Const":
            return g.const_tensor(name)
        if op in ("Identity", "CheckNumerics", "StopGradient"):
            return ins[0]
        if op in ("Placeholder", "DecodeJpeg"):
            raise KeyError(f"node {name!r} (op {op}) must be fed")
        if op == "Cast":
            return np.asarray(ins[0], np.float32)
        if op == "ExpandDims":
            return np.expand_dims(ins[0], int(ins[1]))
        if op == "Squeeze":
            dims = None
            if g.has_attr(name, "squeeze_dims"):
                dims = g.int_list_attr(name, "squeeze_dims") or None
            return np.squeeze(ins[0], axis=tuple(dims) if dims else None)
        if op == "Reshape":
            return np.reshape(ins[0], [int(d) for d in np.ravel(ins[1])])
        if op == "ResizeBilinear":
            ac = g.bool_attr(name, "align_corners") if g.has_attr(name, "align_corners") else False
            return _resize_bilinear(ins[0], np.ravel(ins[1]), ac)
        if op == "Sub":
            return ins[0] - ins[1]
        if op == "Add" or op == "AddV2" or op == "BiasAdd":
            return ins[0] + ins[1]
        if op == "Mul":
            return ins[0] * ins[1]
        if op == "Relu":
            return np.maximum(ins[0], 0)
        if op == "Softmax":
            z = ins[0] - np.max(ins[0], axis=-1, keepdims=True)
            e = np.exp(z)
            return e / np.sum(e, axis=-1, keepdims=True)
        if op == "MatMul":
            a, b = ins
            if g.has_attr(name, "transpose_a") and g.bool_attr(name, "transpose_a"):
                a = a.T
            if g.has_attr(name, "transpose_b") and g.bool_attr(name, "transpose_b"):
                b = b.T
            return a @ b
        if op == "Conv2D":
            return _conv2d(ins[0], ins[1], g.int_list_attr(name, "strides"),
                           g.str_attr(name, "padding"))
        if op == "MaxPool":
            return _pool2d(ins[0], g.int_list_attr(name, "ksize"),
                           g.int_list_attr(name, "strides"),
                           g.str_attr(name, "padding"), "max")
        if op == "AvgPool":
            return _pool2d(ins[0], g.int_list_attr(name, "ksize"),
                           g.int_list_attr(name, "strides"),
                           g.str_attr(name, "padding"), "avg")
        if op == "BatchNormWithGlobalNormalization":
            x, mean, var, beta, gamma = ins
            eps = g.float_attr(name, "variance_epsilon")
            scale_after = (
                g.bool_attr(name, "scale_after_normalization")
                if g.has_attr(name, "scale_after_normalization") else True
            )
            inv = 1.0 / np.sqrt(var + eps)
            if scale_after:
                return (x - mean) * inv * gamma + beta
            return (x - mean) * inv + beta
        if op in ("Concat", "ConcatV2"):
            # Concat: dim first; ConcatV2: axis last
            if op == "Concat":
                axis, tensors = int(ins[0]), ins[1:]
            else:
                axis, tensors = int(ins[-1]), ins[:-1]
            return np.concatenate(tensors, axis=axis)
        raise NotImplementedError(f"GraphDef op {op!r} (node {name!r})")
