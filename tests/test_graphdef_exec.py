"""GraphDef executor + TF-path IS/FID twin tests (SURVEY §2.2 row 43).

The reference's TF-side path (``source/inception/inception_score_tf.py``)
imports the raw ``classify_image_graph_def.pb`` into a TF session and fetches
``pool_3:0``. Our twin interprets the pb directly (``eval/graphdef_exec.py``).
TF is absent, so these tests synthesise a FULLY WIRED inception GraphDef —
every Conv2D/BN/Relu/pool/concat node with real attrs (strides, SAME/VALID
padding, ksize), the input chain (DecodeJpeg -> Cast -> ExpandDims ->
ResizeBilinear -> Sub -> Mul), and the biased softmax head — over the same
shape-correct random consts the converter tests use, then check:

1. op-level semantics against hand-computed numpy (TF SAME asymmetric pads,
   count-exclude-padding AvgPool, TF1 ResizeBilinear grid, Concat/ConcatV2
   argument orders, MatMul transposes);
2. ``executor(pb) == NumpyInception(consts)`` end to end, with the twin's
   avg pool switched to TF's count-exclude-padding semantics (the ONE
   deliberate border divergence between the reference's TF graph and its
   Chainer reimplementation — see ``graphdef_exec.py`` docstring);
3. the ``inception_score_compat`` API twin end to end (forward / IS / FID /
   accuracy), including the reference's omit-the-bias softmax-head quirk
   (``inception_score_tf.py:150-153``).

Input is 75x75 for the same reason as ``test_inception_forward_parity``.
"""

import numpy as np
import pytest

from rgbd_gan_tpu.eval import graphdef_exec as gx
from rgbd_gan_tpu.eval import inception
from rgbd_gan_tpu.eval import tf_graphdef as gd

from test_inception_converter import synthesize_consts, template_flat  # noqa: F401
from test_inception_forward_parity import NumpyInception, np_pool


# ---------------------------------------------------------------------------
# op-level unit tests
# ---------------------------------------------------------------------------


def _exec_one(blob, fetch, feeds=None):
    return gx.GraphExecutor(gd.GraphDef(blob)).run(fetch, feeds)


def test_conv2d_same_asymmetric_pad():
    # even input, stride 2, k=3: SAME total pad = 1 -> (0 before, 1 after)
    rng = np.random.RandomState(0)
    x = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    w = rng.normal(size=(3, 3, 2, 5)).astype(np.float32)
    blob = gd.encode_const_node("w", w)
    blob += gd.encode_node("y", "Conv2D", inputs=["x", "w"],
                           str_attrs={"padding": "SAME"},
                           int_list_attrs={"strides": [1, 2, 2, 1]})
    got = _exec_one(blob, "y", {"x": x})
    xp = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # TF: extra AFTER
    want = np.zeros((1, 2, 2, 5))
    for i in range(3):
        for j in range(3):
            want += np.tensordot(xp[:, i : i + 4 : 2, j : j + 4 : 2],
                                 w[i, j], axes=([3], [0]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_avgpool_same_excludes_padding():
    x = np.ones((1, 3, 3, 1), np.float32)
    blob = gd.encode_node("y", "AvgPool", inputs=["x"],
                          str_attrs={"padding": "SAME"},
                          int_list_attrs={"ksize": [1, 3, 3, 1],
                                          "strides": [1, 1, 1, 1]})
    got = _exec_one(blob, "y", {"x": x})
    # all-ones input: TF AvgPool of ones is EXACTLY ones everywhere (the
    # divisor is the overlap count); count-include-pad would give 4/9 at
    # corners
    np.testing.assert_allclose(got, np.ones((1, 3, 3, 1)), atol=1e-6)


def test_maxpool_valid_stride2():
    x = np.arange(25, dtype=np.float32).reshape(1, 5, 5, 1)
    blob = gd.encode_node("y", "MaxPool", inputs=["x"],
                          str_attrs={"padding": "VALID"},
                          int_list_attrs={"ksize": [1, 3, 3, 1],
                                          "strides": [1, 2, 2, 1]})
    got = _exec_one(blob, "y", {"x": x})
    want = np_pool(np.asarray(x, np.float64), 3, 2, 0, "max")
    np.testing.assert_allclose(got, want)


def test_resize_bilinear_tf1_grid():
    # 2 -> 4 upscale, align_corners=False: src = dst * 0.5 (asymmetric, NOT
    # half-pixel: row 0,1,2,3 -> src 0.0,0.5,1.0,1.5)
    x = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32).reshape(1, 2, 2, 1)
    blob = gd.encode_const_node("size", np.array([4, 4], np.int32))
    blob += gd.encode_node("y", "ResizeBilinear", inputs=["x", "size"],
                           bool_attrs={"align_corners": False})
    got = _exec_one(blob, "y", {"x": x})[0, :, :, 0]
    # x holds f(y, x) = 2y + x; src grid clamps at the far edge (src 1.5 ->
    # both lerp endpoints are the last row/col -> effective coordinate 1.0)
    eff = np.array([0.0, 0.5, 1.0, 1.0])
    want = eff[:, None] * 2 + eff[None, :]
    np.testing.assert_allclose(got, want, atol=1e-6)
    # identity resize is exact
    blob2 = gd.encode_const_node("size", np.array([2, 2], np.int32))
    blob2 += gd.encode_node("y", "ResizeBilinear", inputs=["x", "size"],
                            bool_attrs={"align_corners": False})
    np.testing.assert_array_equal(_exec_one(blob2, "y", {"x": x}), x)


def test_concat_and_concat_v2_arg_orders():
    a = np.ones((1, 2), np.float32)
    b = np.zeros((1, 3), np.float32)
    blob = gd.encode_const_node("dim", np.array(1, np.int32))
    blob += gd.encode_node("c1", "Concat", inputs=["dim", "a", "b"])
    blob += gd.encode_node("c2", "ConcatV2", inputs=["a", "b", "dim"])
    ex = gx.GraphExecutor(gd.GraphDef(blob))
    want = np.concatenate([a, b], axis=1)
    np.testing.assert_array_equal(ex.run("c1", {"a": a, "b": b}), want)
    np.testing.assert_array_equal(ex.run("c2", {"a": a, "b": b}), want)


def test_matmul_bn_reshape_squeeze():
    rng = np.random.RandomState(1)
    a = rng.normal(size=(2, 3)).astype(np.float32)
    b = rng.normal(size=(4, 3)).astype(np.float32)
    blob = gd.encode_node("mm", "MatMul", inputs=["a", "b"],
                          bool_attrs={"transpose_b": True})
    np.testing.assert_allclose(_exec_one(blob, "mm", {"a": a, "b": b}),
                               a @ b.T, atol=1e-6)

    x = rng.normal(size=(1, 2, 2, 3)).astype(np.float32)
    m, v = rng.normal(size=3).astype(np.float32), rng.uniform(0.5, 2, 3).astype(np.float32)
    beta, gamma = rng.normal(size=3).astype(np.float32), rng.normal(size=3).astype(np.float32)
    for scale_after, want in [
        (True, (x - m) / np.sqrt(v + 1e-3) * gamma + beta),
        (False, (x - m) / np.sqrt(v + 1e-3) + beta),
    ]:
        blob = gd.encode_node(
            "bn", "BatchNormWithGlobalNormalization",
            inputs=["x", "m", "v", "beta", "gamma"],
            float_attrs={"variance_epsilon": 1e-3},
            bool_attrs={"scale_after_normalization": scale_after},
        )
        got = _exec_one(blob, "bn", {"x": x, "m": m, "v": v,
                                     "beta": beta, "gamma": gamma})
        np.testing.assert_allclose(got, want, atol=1e-5)

    blob = gd.encode_const_node("shape", np.array([-1, 4], np.int32))
    blob += gd.encode_node("r", "Reshape", inputs=["x", "shape"])
    blob += gd.encode_node("s", "Squeeze", inputs=["p"],
                           int_list_attrs={"squeeze_dims": [1, 2]})
    ex = gx.GraphExecutor(gd.GraphDef(blob))
    np.testing.assert_array_equal(ex.run("r", {"x": x}), x.reshape(-1, 4))
    p = rng.normal(size=(2, 1, 1, 5)).astype(np.float32)
    assert ex.run("s", {"p": p}).shape == (2, 5)


def test_unfed_decode_jpeg_raises():
    blob = gd.encode_node("DecodeJpeg", "DecodeJpeg")
    blob += gd.encode_node("Cast", "Cast", inputs=["DecodeJpeg"])
    with pytest.raises(KeyError, match="must be fed"):
        _exec_one(blob, "Cast")


# ---------------------------------------------------------------------------
# fully wired synthetic inception graph
# ---------------------------------------------------------------------------


def build_wired_graphdef(consts, size=75, eps=inception.BN_EPS):
    """Serialise the complete inception-2015 topology over ``consts``.

    Node names / wiring follow the real ``classify_image_graph_def.pb``:
    ``{scope}/Conv2D`` -> ``{scope}/batchnorm`` -> relu node ``{scope}``,
    pools ``pool``/``pool_1``/``{block}/pool``/``{block}/tower_2/pool``,
    ``{block}/join`` Concat nodes (dim first), the input chain fed at
    ``ExpandDims:0``, ``pool_3`` (AvgPool over the full remaining extent,
    as the real graph's 8x8-at-299px kernel is), and the biased
    ``softmax/logits`` -> ``softmax`` head (batch-1 hardcoded reshape, as in
    the real pb)."""
    blob = b""
    for name_, arr in consts.items():
        blob += gd.encode_const_node(name_, arr)

    def conv_bn_relu(scope, inp, stride=1, padding="SAME"):
        nonlocal blob
        blob += gd.encode_node(
            f"{scope}/Conv2D", "Conv2D", inputs=[inp, f"{scope}/conv2d_params"],
            str_attrs={"padding": padding},
            int_list_attrs={"strides": [1, stride, stride, 1]},
        )
        bn = f"{scope}/batchnorm"
        blob += gd.encode_node(
            bn, "BatchNormWithGlobalNormalization",
            inputs=[f"{scope}/Conv2D", f"{bn}/moving_mean",
                    f"{bn}/moving_variance", f"{bn}/beta", f"{bn}/gamma"],
            float_attrs={"variance_epsilon": eps},
            bool_attrs={"scale_after_normalization": True},
        )
        blob += gd.encode_node(scope, "Relu", inputs=[bn])
        return scope

    def pool(name_, inp, kind, k=3, stride=1, padding="SAME"):
        nonlocal blob
        blob += gd.encode_node(
            name_, {"max": "MaxPool", "avg": "AvgPool"}[kind], inputs=[inp],
            str_attrs={"padding": padding},
            int_list_attrs={"ksize": [1, k, k, 1], "strides": [1, stride, stride, 1]},
        )
        return name_

    def join(name_, branches):
        nonlocal blob
        blob += gd.encode_const_node(f"{name_}/dim", np.array(3, np.int32))
        blob += gd.encode_node(name_, "Concat", inputs=[f"{name_}/dim"] + branches)
        return name_

    # input chain (DecodeJpeg is never evaluated: tests feed ExpandDims:0)
    blob += gd.encode_node("DecodeJpeg", "DecodeJpeg")
    blob += gd.encode_node("Cast", "Cast", inputs=["DecodeJpeg"])
    blob += gd.encode_const_node("ExpandDims/dim", np.array(0, np.int32))
    blob += gd.encode_node("ExpandDims", "ExpandDims", inputs=["Cast", "ExpandDims/dim"])
    blob += gd.encode_const_node("ResizeBilinear/size", np.array([size, size], np.int32))
    blob += gd.encode_node("ResizeBilinear", "ResizeBilinear",
                           inputs=["ExpandDims", "ResizeBilinear/size"],
                           bool_attrs={"align_corners": False})
    blob += gd.encode_const_node("Sub/y", np.array(128.0, np.float32))
    blob += gd.encode_node("Sub", "Sub", inputs=["ResizeBilinear", "Sub/y"])
    blob += gd.encode_const_node("Mul/y", np.array(0.0078125, np.float32))
    blob += gd.encode_node("Mul", "Mul", inputs=["Sub", "Mul/y"])

    # stem (inception_score.py:581-605 topology; VALID/SAME per kernel)
    h = conv_bn_relu("conv", "Mul", stride=2, padding="VALID")
    h = conv_bn_relu("conv_1", h, padding="VALID")
    h = conv_bn_relu("conv_2", h, padding="SAME")
    h = pool("pool", h, "max", stride=2, padding="VALID")
    h = conv_bn_relu("conv_3", h, padding="VALID")
    h = conv_bn_relu("conv_4", h, padding="VALID")
    h = pool("pool_1", h, "max", stride=2, padding="VALID")
    spatial = ((size - 3) // 2 + 1) - 2  # conv (s2 VALID) then conv_1 (VALID; conv_2 is SAME)
    spatial = (spatial - 3) // 2 + 1  # pool
    spatial = spatial - 2  # conv_4 (conv_3 is 1x1)
    spatial = (spatial - 3) // 2 + 1  # pool_1

    def mixed_a(b, inp):
        return join(f"{b}/join", [
            conv_bn_relu(f"{b}/conv", inp),
            conv_bn_relu(f"{b}/tower/conv_1", conv_bn_relu(f"{b}/tower/conv", inp)),
            conv_bn_relu(f"{b}/tower_1/conv_2", conv_bn_relu(
                f"{b}/tower_1/conv_1", conv_bn_relu(f"{b}/tower_1/conv", inp))),
            conv_bn_relu(f"{b}/tower_2/conv", pool(f"{b}/tower_2/pool", inp, "avg")),
        ])

    def mixed_b(b, inp):
        return join(f"{b}/join", [
            conv_bn_relu(f"{b}/conv", inp, stride=2, padding="VALID"),
            conv_bn_relu(f"{b}/tower/conv_2", conv_bn_relu(
                f"{b}/tower/conv_1", conv_bn_relu(f"{b}/tower/conv", inp)),
                stride=2, padding="VALID"),
            pool(f"{b}/pool", inp, "max", stride=2, padding="VALID"),
        ])

    def mixed_c(b, inp):
        t = conv_bn_relu(f"{b}/tower/conv", inp)
        t = conv_bn_relu(f"{b}/tower/conv_2", conv_bn_relu(f"{b}/tower/conv_1", t))
        t1 = conv_bn_relu(f"{b}/tower_1/conv", inp)
        for i in range(1, 5):
            t1 = conv_bn_relu(f"{b}/tower_1/conv_{i}", t1)
        return join(f"{b}/join", [
            conv_bn_relu(f"{b}/conv", inp), t, t1,
            conv_bn_relu(f"{b}/tower_2/conv", pool(f"{b}/tower_2/pool", inp, "avg")),
        ])

    def mixed_d(b, inp):
        t = conv_bn_relu(f"{b}/tower/conv", inp)
        t = conv_bn_relu(f"{b}/tower/conv_1", t, stride=2, padding="VALID")
        t1 = conv_bn_relu(f"{b}/tower_1/conv", inp)
        t1 = conv_bn_relu(f"{b}/tower_1/conv_1", t1)
        t1 = conv_bn_relu(f"{b}/tower_1/conv_2", t1)
        t1 = conv_bn_relu(f"{b}/tower_1/conv_3", t1, stride=2, padding="VALID")
        return join(f"{b}/join", [
            t, t1, pool(f"{b}/pool", inp, "max", stride=2, padding="VALID"),
        ])

    def mixed_e(b, inp, pool_kind):
        t = conv_bn_relu(f"{b}/tower/conv", inp)
        t = join(f"{b}/tower/join", [
            conv_bn_relu(f"{b}/tower/mixed/conv", t),
            conv_bn_relu(f"{b}/tower/mixed/conv_1", t),
        ])
        t1 = conv_bn_relu(f"{b}/tower_1/conv", inp)
        t1 = conv_bn_relu(f"{b}/tower_1/conv_1", t1)
        t1 = join(f"{b}/tower_1/join", [
            conv_bn_relu(f"{b}/tower_1/mixed/conv", t1),
            conv_bn_relu(f"{b}/tower_1/mixed/conv_1", t1),
        ])
        return join(f"{b}/join", [
            conv_bn_relu(f"{b}/conv", inp), t, t1,
            conv_bn_relu(f"{b}/tower_2/conv",
                         pool(f"{b}/tower_2/pool", inp, pool_kind)),
        ])

    h = mixed_a("mixed", h)
    h = mixed_a("mixed_1", h)
    h = mixed_a("mixed_2", h)
    h = mixed_b("mixed_3", h)
    spatial = (spatial - 3) // 2 + 1
    h = mixed_c("mixed_4", h)
    h = mixed_c("mixed_5", h)
    h = mixed_c("mixed_6", h)
    h = mixed_c("mixed_7", h)
    h = mixed_d("mixed_8", h)
    spatial = (spatial - 3) // 2 + 1
    h = mixed_e("mixed_9", h, "avg")
    h = mixed_e("mixed_10", h, "max")

    # the real graph's pool_3 kernel equals the full remaining extent
    # (8x8 VALID at 299px input)
    h = pool("pool_3", h, "avg", k=spatial, padding="VALID")

    # biased in-graph head with the real pb's batch-1 hardcoded reshape
    fdim = consts["softmax/weights"].shape[0]
    blob += gd.encode_const_node("pool_3/reshape/shape", np.array([1, fdim], np.int32))
    blob += gd.encode_node("pool_3/reshape", "Reshape",
                           inputs=["pool_3", "pool_3/reshape/shape"])
    blob += gd.encode_node("softmax/logits/MatMul", "MatMul",
                           inputs=["pool_3/reshape:0", "softmax/weights:0"])
    blob += gd.encode_node("softmax/logits", "BiasAdd",
                           inputs=["softmax/logits/MatMul", "softmax/biases"])
    blob += gd.encode_node("softmax", "Softmax", inputs=["softmax/logits"])
    return blob


@pytest.fixture(scope="module")
def wired(template_flat):  # noqa: F811
    rng = np.random.RandomState(11)
    consts = synthesize_consts(template_flat, rng)
    blob = build_wired_graphdef(consts)
    return blob, consts


def _tf_avg3(x):
    """TF-semantics 3x3 SAME avg pool (divides by the un-padded count)."""
    s = np_pool(x, 3, 1, 1, "avg") * 9.0
    cnt = np_pool(np.ones(x.shape[:3] + (1,), np.float64), 3, 1, 1, "avg") * 9.0
    return s / cnt


def test_wired_graph_matches_numpy_twin(wired, monkeypatch):
    """executor(pb) == the independent numpy transcription, with the twin's
    avg pooling flipped to TF semantics (count-exclude-padding)."""
    import test_inception_forward_parity as parity

    blob, consts = wired
    monkeypatch.setattr(parity, "_avg3", _tf_avg3)
    twin = NumpyInception(consts, eps=inception.BN_EPS)

    rng = np.random.RandomState(5)
    x = rng.uniform(0, 255, size=(2, 75, 75, 3)).astype(np.float32)
    ex = gx.GraphExecutor(gd.GraphDef(blob))
    pool3 = ex.run("pool_3:0", {"ExpandDims:0": x})
    assert pool3.shape == (2, 1, 1, inception.FEATURE_DIM)
    feat = pool3.reshape(2, -1)
    want = twin(x, get_feature=True)
    scale = np.abs(want).max()
    np.testing.assert_allclose(feat, want, atol=2e-3 * scale, rtol=1e-3)


def test_wired_graph_softmax_head_batch1(wired, monkeypatch):
    """The in-graph (biased, batch-1 reshape) head matches the twin's
    probabilities — exercises Reshape/MatMul/BiasAdd/Softmax in-graph."""
    import test_inception_forward_parity as parity

    blob, consts = wired
    monkeypatch.setattr(parity, "_avg3", _tf_avg3)
    twin = NumpyInception(consts, eps=inception.BN_EPS)

    rng = np.random.RandomState(6)
    x = rng.uniform(0, 255, size=(1, 75, 75, 3)).astype(np.float32)
    probs = gx.GraphExecutor(gd.GraphDef(blob)).run(
        "softmax:0", {"ExpandDims:0": x})
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(probs, twin(x), atol=1e-4)


# ---------------------------------------------------------------------------
# the inception_score_tf API twin
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def compat_pb(template_flat, tmp_path_factory):  # noqa: F811
    """A wired pb whose softmax weights are scaled so probabilities stay
    strictly positive: the reference's IS uses an epsilon-free ``np.log``
    (``inception_score_tf.py:80``), so saturated one-hot softmaxes would
    turn the FORMULA itself into NaN — a property of the reference math,
    not of this twin. Calibrated from a probe forward."""
    rng = np.random.RandomState(13)
    consts = synthesize_consts(template_flat, rng)
    probe = rng.uniform(0, 255, size=(1, 75, 75, 3)).astype(np.float32)
    feats = gx.GraphExecutor(gd.GraphDef(build_wired_graphdef(consts))).run(
        "pool_3:0", {"ExpandDims:0": probe}).reshape(1, -1)
    fdim = feats.shape[1]
    w_scale = 8.0 / (np.linalg.norm(feats) * np.sqrt(fdim))
    consts["softmax/weights"] = (
        rng.normal(size=(fdim, inception.NUM_LOGITS)) * w_scale
    ).astype(np.float32)
    blob = build_wired_graphdef(consts)
    pb = tmp_path_factory.mktemp("compat") / "classify_image_graph_def.pb"
    pb.write_bytes(blob)
    return pb, consts


def test_compat_api_end_to_end(compat_pb, monkeypatch):
    from rgbd_gan_tpu.eval import inception_score_compat as compat

    pb, consts = compat_pb
    monkeypatch.setenv(compat.PB_ENV, str(pb))
    # reset the lazy globals so this test owns initialisation
    monkeypatch.setattr(compat, "_executor", None)
    monkeypatch.setattr(compat, "softmax", None)
    monkeypatch.setattr(compat, "last_layer", None)

    rng = np.random.RandomState(9)
    ims = rng.uniform(0, 255, size=(6, 3, 75, 75)).astype(np.float32)  # NCHW

    feats = compat.inception_forward(ims, "last_layer")
    assert feats.shape == (6, inception.FEATURE_DIM)

    # the hand-built softmax head omits the bias (inception_score_tf.py:150-153)
    probs = compat.inception_forward(ims, "softmax")
    assert np.all(probs > 0), "softmax saturated; compat_pb calibration broke"
    logits = feats @ consts["softmax/weights"]
    z = logits - logits.max(axis=-1, keepdims=True)
    want = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)
    np.testing.assert_allclose(probs, want, atol=1e-5)

    m, cov = compat.get_mean_and_cov(ims)
    np.testing.assert_allclose(m, feats.mean(0), atol=1e-6)
    np.testing.assert_allclose(cov, np.cov(feats, rowvar=False), atol=1e-6)

    # IS on 2 splits reproduces the formula
    is_mean, is_std = compat.get_inception_score(ims, splits=2)
    scores = []
    for i in range(2):
        part = probs[i * 3:(i + 1) * 3]
        kl = part * (np.log(part) - np.log(part.mean(0, keepdims=True)))
        scores.append(np.exp(kl.sum(1).mean()))
    assert is_mean == pytest.approx(np.mean(scores), rel=1e-5)
    assert is_std == pytest.approx(np.std(scores), rel=1e-5)

    # FID of a set against itself with full-set ref stats: ~0 per split only
    # if the split equals the set; just assert finiteness + the provided
    # ref_stats branch works (the reference's NameError bug, fixed here)
    fid_mean, fid_std = compat.get_fid(ims, ref_stats=(m, cov), splits=2)
    assert np.isfinite(fid_mean) and np.isfinite(fid_std)

    labels = np.argmax(probs[:, 1:1001], axis=1)
    assert compat.get_inception_accuracy(ims, labels) == 1.0
    assert compat.get_inception_accuracy([ims, ims], labels) == 1.0


def test_compat_forward_asserts_reference_preconditions(compat_pb, monkeypatch):
    from rgbd_gan_tpu.eval import inception_score_compat as compat

    pb, _ = compat_pb
    monkeypatch.setenv(compat.PB_ENV, str(pb))
    monkeypatch.setattr(compat, "_executor", None)
    with pytest.raises(AssertionError):
        # [0,1]-ranged images violate the reference's max>10 assert (:32)
        compat.inception_forward(np.random.rand(2, 3, 75, 75).astype(np.float32),
                                 "last_layer")
