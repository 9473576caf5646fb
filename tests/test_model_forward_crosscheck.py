"""Independent numpy transcription of the reference *model forwards* vs our JAX.

Chainer is absent from this image, so fixed-seed parity against the reference
cannot be executed directly. ``test_numpy_crosscheck.py`` covers the loss /
geometry math; this file extends the same technique to full model forwards —
the cheapest way to catch AdaIN-statistics or equalized-LR-placement drift
end-to-end (VERDICT round 1, item 7):

- a full DCGAN generator forward (stem linear -> DCGANBlock stack -> toRGBD
  -> inverse-depth head), transcribed in pure numpy NCHW from
  ``net.py:603-773`` + ``common/networks/component/pggan.py:13-50`` +
  ``rescale.py:4-33``
- a StyleGAN mapping + SynthesisBlock chain (camera-conditioned rotate_w,
  AdaIN via instance-norm, w2 switch at block 3, odd-stage fade-in with the
  unconditioned w) from ``net.py:22-62,105-161,164-311``

The *same weights* are injected into both sides: every parameter of the flax
model (including zero-initialised biases and depth-head rows) is replaced by
a fresh random draw, then converted to Chainer layout (linear (out,in), conv
(out,in,kh,kw)) for the numpy twin. Outputs must agree elementwise.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.models import DCGANGenerator, StyleGANGenerator

# ---------------------------------------------------------------------------
# pure-numpy NCHW transcription of the reference primitives
# ---------------------------------------------------------------------------


def np_conv2d(x, W, pad):
    """Plain NCHW conv, stride 1 (Chainer ``L.Convolution2D``). W: (out,in,kh,kw)."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = W.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = h + 2 * pad - kh + 1
    ow = w + 2 * pad - kw + 1
    cols = np.stack(
        [xp[:, :, i : i + oh, j : j + ow] for i in range(kh) for j in range(kw)], axis=2
    )  # (b, cin, kh*kw, oh, ow)
    return np.einsum("bckhw,ock->bohw", cols, W.reshape(cout, cin, kh * kw)).astype("float32")


def np_eq_conv(x, W, b=None, gain=math.sqrt(2.0), pad=0):
    """EqualizedConv2d (pggan.py:13-24): conv(inv_c * x) + b."""
    in_ch, k = W.shape[1], W.shape[2]
    inv_c = gain * math.sqrt(1.0 / (in_ch * k**2))
    y = np_conv2d((inv_c * x).astype("float32"), W, pad)
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def np_eq_linear(x, W, b=None, gain=math.sqrt(2.0)):
    """EqualizedLinear (pggan.py:40-50): (inv_c * x) @ W.T + b. W: (out,in)."""
    x = x.reshape(x.shape[0], -1)
    inv_c = gain * math.sqrt(1.0 / x.shape[1])
    y = (inv_c * x) @ W.T
    if b is not None:
        y = y + b[None]
    return y.astype("float32")


def np_upscale2x(x):
    """F.unpooling_2d(h, 2, 2, 0) — nearest unpool (rescale.py:4-5)."""
    return x.repeat(2, axis=2).repeat(2, axis=3)


def np_blur(x):
    """[1,2,1]^2/16 depthwise blur, pad 1 (rescale.py:21-26)."""
    k = np.array([1.0, 2.0, 1.0], "float32")
    k = k[:, None] * k[None, :]
    k = (k / k.sum()).reshape(1, 1, 3, 3)
    b, c, h, w = x.shape
    return np_conv2d(x.reshape(b * c, 1, h, w), k, pad=1).reshape(b, c, h, w)


def np_lrelu(x):
    return np.where(x >= 0, x, 0.2 * x).astype("float32")


def np_pixel_norm(x, eps=1e-8):
    """feature_vector_normalization (pggan.py:7-10), channel axis 1."""
    return x / np.sqrt((x * x).mean(axis=1, keepdims=True) + eps)


def np_f_normalize(x, eps=1e-5):
    """Chainer F.normalize default: x / (||x||_2(axis=1) + eps)."""
    return x / (np.sqrt((x * x).sum(axis=1, keepdims=True)) + eps)


def np_adain(x, ws, wb, eps=1e-5):
    """AdaIN (adain.py:10-77): per-(b,c) instance norm (biased var, eps 1e-5)
    through the batch-norm reshape trick, then the style affine."""
    mean = x.mean(axis=(2, 3), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(2, 3), keepdims=True)
    xn = (x - mean) / np.sqrt(var + eps)
    return xn * ws[:, :, None, None] + wb[:, :, None, None]


def np_softplus(x):
    return np.logaddexp(0.0, x).astype("float32")


# ---------------------------------------------------------------------------
# weight injection: flax tree -> Chainer-layout numpy dict
# ---------------------------------------------------------------------------


def randomize_params(params, seed, scale=0.3):
    """Replace every leaf (incl. zero-init biases / depth rows) with N(0, scale)."""
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(0, scale, p.shape).astype("float32")), params
    )


def lin_w(p):
    """flax (in, out) kernel -> Chainer (out, in)."""
    return np.asarray(p["kernel"]).T


def conv_w(p):
    """flax HWIO kernel -> Chainer (out, in, kh, kw)."""
    return np.asarray(p["kernel"]).transpose(3, 2, 0, 1)


def vec(p, key="bias"):
    return np.asarray(p[key])


# ---------------------------------------------------------------------------
# DCGAN generator (net.py:603-773)
# ---------------------------------------------------------------------------


def np_dcgan_block(p, x, enable_blur=False):
    """DCGANBlock.forward (net.py:620-646), add_noise=False."""
    h = np_upscale2x(x)
    if enable_blur:
        h = np_blur(h)
    h = np_eq_conv(h, conv_w(p["c0"]), pad=1)
    h = np_lrelu(h + vec(p, "b0")[None, :, None, None])
    h = np_f_normalize(h)
    h = np_eq_conv(h, conv_w(p["c1"]), pad=1)
    h = np_lrelu(h + vec(p, "b1")[None, :, None, None])
    return np_f_normalize(h)


def np_dcgan_forward(params, z, theta, stage, alpha, ch, enable_blur=False):
    """DCGANGenerator.forward (net.py:710-773), rgbd, train mode."""
    h = np.concatenate([z, theta * 10], axis=1)
    h = np_eq_linear(h, lin_w(params["linear"]), vec(params["linear"]))
    h = h.reshape(z.shape[0], ch, 4, 4)

    def out(i, hh):
        return np_eq_conv(hh, conv_w(params[f"out{i}"]), vec(params[f"out{i}"]), gain=1.0)

    if stage % 2 == 0:
        k = (stage - 2) // 2
        for i in range(0, k + 1):
            h = np_dcgan_block(params[f"block{i}"], h, enable_blur)
        h = out(k, h)
    else:
        k = (stage - 1) // 2
        for i in range(0, k):
            h = np_dcgan_block(params[f"block{i}"], h, enable_blur)
        h_0 = np_upscale2x(out(k - 1, h))
        h_1 = out(k, np_dcgan_block(params[f"block{k}"], h, enable_blur))
        h = (1.0 - alpha) * h_0 + alpha * h_1

    depth = 1.0 / (np_softplus(h[:, -1:]) + 1e-4)
    return np.concatenate([h[:, :3], depth], axis=1)


@pytest.mark.parametrize(
    "stage,alpha,blur", [(6, 0.0, False), (7, 0.3, False), (8, 0.0, True)]
)
def test_dcgan_forward_matches_numpy_transcription(stage, alpha, blur):
    in_ch, ch, batch = 12, 16, 2
    gen = DCGANGenerator(in_ch=in_ch, ch=ch, rgbd=True, enable_blur=blur)
    rng = np.random.RandomState(0)
    z = rng.normal(size=(batch, in_ch)).astype("float32")
    theta = rng.uniform(-0.5, 0.5, (batch, 9)).astype("float32")

    params = gen.init(jax.random.PRNGKey(1), jnp.asarray(z), jnp.asarray(theta),
                      method=gen.init_all)["params"]
    params = randomize_params(params, seed=7)

    ours = gen.apply({"params": params}, jnp.asarray(z), stage, jnp.float32(alpha),
                     jnp.asarray(theta))
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)

    ref = np_dcgan_forward(
        jax.tree_util.tree_map(np.asarray, params), z, theta, stage, alpha, ch, blur
    )
    np.testing.assert_allclose(ours_nchw, ref, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# StyleGAN generator (net.py:22-62,105-161,164-311)
# ---------------------------------------------------------------------------


def np_mapping(p, x):
    """MappingNetwork.forward (net.py:58-62)."""
    h = np_pixel_norm(x.reshape(x.shape[0], -1))
    for i in range(8):
        h = np_lrelu(np_eq_linear(h, lin_w(p[f"l{i}"]), vec(p[f"l{i}"])))
    return h


def np_style_block(p, w, h):
    """StyleBlock (net.py:90-102): two gain=1 equalized linears -> AdaIN."""
    ws = np_eq_linear(w, lin_w(p["s"]), vec(p["s"]), gain=1.0)
    wb = np_eq_linear(w, lin_w(p["b"]), vec(p["b"]), gain=1.0)
    return np_adain(h, ws, wb)


def np_synthesis_block(p, w, x, upsample, enable_blur=False):
    """SynthesisBlock.forward (net.py:130-161), add_noise=False."""
    if upsample:
        h = np_upscale2x(x)
        if enable_blur:
            h = np_blur(h)
        h = np_eq_conv(h, conv_w(p["c0"]), pad=1)
    else:
        const = np.asarray(p["const"]).transpose(2, 0, 1)  # HWC -> CHW
        h = np.broadcast_to(const[None], (w.shape[0],) + const.shape).astype("float32")
    h = np_lrelu(h + vec(p, "b0")[None, :, None, None])
    h = np_style_block(p["s0"], w, h)
    h = np_eq_conv(h, conv_w(p["c1"]), pad=1)
    h = np_lrelu(h + vec(p, "b1")[None, :, None, None])
    return np_style_block(p["s1"], w, h)


def np_rotate_w(p, w, theta):
    """StyleGenerator.rotate_w (net.py:220-224)."""
    h = np.concatenate([w, theta * 16], axis=1)
    h = np_lrelu(np_eq_linear(h, lin_w(p["l1"]), vec(p["l1"])))
    return np_lrelu(np_eq_linear(h, lin_w(p["l2"]), vec(p["l2"])))


def np_stylegan_forward(params, z, theta, stage, alpha, enable_blur=False):
    """StyleGANGenerator.forward (net.py:345-354 -> 232-311), rgbd, train."""
    z1, z2 = np.split(z.reshape(z.shape[0], -1), 2, axis=1)
    w = np_mapping(params["mapping"], z1)
    w2 = np_mapping(params["mapping"], z2)
    g = params["gen"]

    def cond_w(i, wi):
        return np_rotate_w(g, wi, theta) if i < 2 else wi

    def block(i, wi, h):
        return np_synthesis_block(g[f"block{i}"], wi, h, upsample=(i != 0),
                                  enable_blur=enable_blur)

    def out(i, hh):
        return np_eq_conv(hh, conv_w(g[f"out{i}"]), vec(g[f"out{i}"]), gain=1.0)

    h = None
    if stage % 2 == 0:
        k = (stage - 2) // 2
        for i in range(0, (k + 1) + 1):
            if i == 3:
                w = w2
            h = block(i, cond_w(i, w), h)
        h = out(k + 1, h)
    else:
        k = (stage - 1) // 2
        for i in range(0, k + 1):
            if i == 3:
                w = w2
            h = block(i, cond_w(i, w), h)
        h_0 = np_upscale2x(out(k, h))
        # fade-in block sees the *unconditioned* w (net.py:290)
        h_1 = out(k + 1, block(k + 1, w, h))
        h = (1.0 - alpha) * h_0 + alpha * h_1

    depth = 1.0 / (np_softplus(h[:, -1:]) + 1e-4)
    return np.concatenate([h[:, :3], depth], axis=1)


@pytest.mark.parametrize(
    "stage,alpha,blur", [(6, 0.0, False), (7, 0.4, False), (8, 0.0, True)]
)
def test_stylegan_forward_matches_numpy_transcription(stage, alpha, blur):
    ch, batch = 16, 2
    gen = StyleGANGenerator(ch, rgbd=True, enable_blur=blur)
    rng = np.random.RandomState(3)
    z = rng.normal(size=(batch, ch * 2)).astype("float32")
    theta = rng.uniform(-0.5, 0.5, (batch, 9)).astype("float32")

    params = gen.init(jax.random.PRNGKey(1), jnp.asarray(z), jnp.asarray(theta),
                      method=gen.init_all)["params"]
    params = randomize_params(params, seed=11)

    ours = gen.apply({"params": params}, jnp.asarray(z), stage, jnp.float32(alpha),
                     jnp.asarray(theta))
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)

    ref = np_stylegan_forward(
        jax.tree_util.tree_map(np.asarray, params), z, theta, stage, alpha, blur
    )
    np.testing.assert_allclose(ours_nchw, ref, rtol=2e-5, atol=2e-5)


def test_stylegan_even_stage_w2_takeover_detected():
    """Sanity: the crosscheck is sensitive — swapping w/w2 must break it."""
    ch, batch, stage = 16, 2, 8  # blocks 0..4, switch at 3
    gen = StyleGANGenerator(ch, rgbd=True)
    rng = np.random.RandomState(5)
    z = rng.normal(size=(batch, ch * 2)).astype("float32")
    theta = rng.uniform(-0.5, 0.5, (batch, 9)).astype("float32")
    params = gen.init(jax.random.PRNGKey(1), jnp.asarray(z), jnp.asarray(theta),
                      method=gen.init_all)["params"]
    # scale=1.0: keeps the 8-layer mapping from contracting to its biases, so
    # w actually depends on z and a w/w2 swap is visible in the output
    params = randomize_params(params, seed=13, scale=1.0)
    ours = np.asarray(
        gen.apply({"params": params}, jnp.asarray(z), stage, jnp.float32(0.0),
                  jnp.asarray(theta))
    ).transpose(0, 3, 1, 2)
    z_swapped = np.concatenate(np.split(z, 2, axis=1)[::-1], axis=1)
    ref_swapped = np_stylegan_forward(
        jax.tree_util.tree_map(np.asarray, params), z_swapped, theta, stage, 0.0
    )
    assert not np.allclose(ours, ref_swapped, rtol=1e-3, atol=1e-3)
