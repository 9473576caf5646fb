"""NN component library (flax.linen, NHWC) — the TPU twin of the reference L1.

Re-implements the primitives in ``common/networks/component/`` of
nogu-atsu/RGBD-GAN with TPU-native layouts:

- equalized-learning-rate conv/linear (``pggan.py:13-50``): weights are
  initialised N(0, 1/lrmul) and the *input* is scaled at runtime by
  ``inv_c = gain * sqrt(1/fan_in) * lrmul`` (scale placement preserved)
- PixelNorm (``pggan.py:7-10``) and Chainer ``F.normalize`` semantics
- AdaIN as instance-norm(eps=1e-5) + per-channel style affine
  (``normalization/adain.py:10-77``)
- nearest-unpool upscale / 2x2 avg-pool downscale / separable [1,2,1] blur
  (``rescale.py:4-33``)
- noise injection with the *same noise broadcast across channels* quirk
  (``net.py:72-81``) and a zero-initialised per-channel gain
- spectral normalisation with carried power-iteration state (the TPU
  version of Chainer's SpectralNormalization hook)

All images are NHWC; channel-last is the natural TPU layout (lane dimension
= channels) and lets XLA tile convs straight onto the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# ---------------------------------------------------------------------------
# functional primitives
# ---------------------------------------------------------------------------


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    """Chainer's default leaky ReLU slope is 0.2."""
    return jnp.where(x >= 0, x, slope * x)


def pixel_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """``feature_vector_normalization``: x / sqrt(mean(x^2, channels) + eps).

    Channel axis is last (NHWC / NC). Reference ``pggan.py:7-10``. The
    statistics are computed in f32 (stable under bf16 mixed precision).
    """
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return out.astype(x.dtype)


def l2_normalize_channels(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Chainer ``F.normalize`` semantics: x / (||x||_2 + eps) over channels.
    Statistics in f32 for bf16 stability."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    return (xf / (norm + eps)).astype(x.dtype)


def adain(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Adaptive instance norm (``adain.py:10-77``).

    Per-(sample, channel) normalisation over spatial dims with *biased*
    variance and eps=1e-5 (the reference routes through batch_normalization),
    then a per-channel affine from the style vector.

    :param x: (B, ..., C) with at least one spatial dim
    :param scale, bias: (B, C)
    """
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    out = xn * scale.reshape(shape).astype(jnp.float32) + bias.reshape(shape).astype(jnp.float32)
    return out.astype(x.dtype)


def upscale2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x unpool (``rescale.py:4-5``). NHWC."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def downscale2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool (``rescale.py:12-13``). NHWC."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def upscale2x_3d(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x unpool over (D, H, W). NDHWC."""
    return jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), 2, axis=3)


def downscale2x_3d(x: jnp.ndarray) -> jnp.ndarray:
    b, d, h, w, c = x.shape
    return x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4, 6))


def _blur_kernel_2d(dtype=jnp.float32) -> jnp.ndarray:
    k = jnp.asarray([1.0, 2.0, 1.0], dtype=dtype)
    k = k[:, None] * k[None, :]
    return k / jnp.sum(k)


def blur3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 [1,2,1]^2/16 blur, pad 1 (``rescale.py:21-26``). NHWC."""
    c = x.shape[-1]
    k = _blur_kernel_2d(x.dtype).reshape(3, 3, 1, 1)
    k = jnp.broadcast_to(k, (3, 3, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def blur3x3_3d(x: jnp.ndarray) -> jnp.ndarray:
    """3D variant; the reference applies the same *2D* kernel over the last
    two axes of the volume (``rescale.py:29-33`` reshapes to 2D conv) — quirk
    preserved: only (H, W) of an NDHWC volume are blurred, per depth slice.
    """
    b, d, h, w, c = x.shape
    flat = x.transpose(0, 1, 4, 2, 3).reshape(b * d * c, h, w, 1)
    out = blur3x3(flat)
    return out.reshape(b, d, c, h, w).transpose(0, 1, 3, 4, 2)


# ---------------------------------------------------------------------------
# equalized-LR modules
# ---------------------------------------------------------------------------


class EqualizedLinear(nn.Module):
    """Linear with equalized learning rate (``pggan.py:40-50``)."""

    features: int
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    use_bias: bool = True
    bias_init: Callable = nn.initializers.zeros_init()
    kernel_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        in_ch = x.shape[-1]
        inv_c = self.gain * math.sqrt(1.0 / in_ch) * self.lrmul
        kinit = self.kernel_init or nn.initializers.normal(stddev=1.0 / self.lrmul)
        kernel = self.param("kernel", kinit, (in_ch, self.features), jnp.float32)
        y = jnp.dot((inv_c * x).astype(self.dtype or x.dtype), kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class EqualizedConv2D(nn.Module):
    """3x3/1x1/4x4 conv with equalized learning rate (``pggan.py:13-24``).

    ``inv_c = gain * sqrt(1 / (in_ch * k^2)) * lrmul`` multiplies the input.
    NHWC, kernel HWIO.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        inv_c = self.gain * math.sqrt(1.0 / (in_ch * k**2)) * self.lrmul
        kinit = self.kernel_init or nn.initializers.normal(stddev=1.0 / self.lrmul)
        kernel = self.param("kernel", kinit, (k, k, in_ch, self.features), jnp.float32)
        y = jax.lax.conv_general_dilated(
            (inv_c * x),
            kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class EqualizedConv3D(nn.Module):
    """3D conv with equalized LR (``pggan.py:27-38``). NDHWC, kernel DHWIO.

    Quirk preserved: the reference computes ``inv_c`` with ``ksize**2`` (not
    ``**3``) even for 3D convs.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        inv_c = self.gain * math.sqrt(1.0 / (in_ch * k**2)) * self.lrmul
        kinit = self.kernel_init or nn.initializers.normal(stddev=1.0 / self.lrmul)
        kernel = self.param("kernel", kinit, (k, k, k, in_ch, self.features), jnp.float32)
        if k == 1 and self.stride == 1 and self.padding == 0:
            # 1x1x1 conv == channel matmul. The conv emitter at these shapes
            # wants a batch-in-sublanes operand layout and forces a relayout
            # copy of the (large) frustum volume; the dot contracts the
            # already-minor channel axis in the array's natural row-major
            # layout instead (profiled 2x4.7 ms of copies + 2x5.8 ms of conv
            # per deepvoxels step). Same arithmetic, same parameter tree.
            y = jax.lax.dot_general(
                inv_c * x, kernel[0, 0, 0].astype(x.dtype),
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            )
        else:
            y = jax.lax.conv_general_dilated(
                (inv_c * x),
                kernel.astype(x.dtype),
                window_strides=(self.stride,) * 3,
                padding=[(self.padding, self.padding)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# style / noise blocks
# ---------------------------------------------------------------------------


class NoiseBlock(nn.Module):
    """Noise injection (``net.py:65-87``): a *single-channel* noise map is
    broadcast to every channel (quirk preserved) and scaled by a per-channel
    gain initialised to zero (Scale(initialW=0))."""

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        c = h.shape[-1]
        gain = self.param("gain", nn.initializers.zeros_init(), (c,), jnp.float32)
        noise = jax.random.normal(self.make_rng("noise"), h.shape[:-1] + (1,), dtype=h.dtype)
        return h + noise * gain.astype(h.dtype)


class AdaINBlock(nn.Module):
    """StyleBlock (``net.py:90-102``): two equalized linears (gain=1; scale
    head bias-initialised to one) producing the AdaIN affine from ``w``."""

    features: int

    @nn.compact
    def __call__(self, w: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        ws = EqualizedLinear(
            self.features, gain=1.0, bias_init=nn.initializers.ones_init(), name="s"
        )(w)
        wb = EqualizedLinear(
            self.features, gain=1.0, bias_init=nn.initializers.zeros_init(), name="b"
        )(w)
        return adain(h, ws, wb)


# ---------------------------------------------------------------------------
# spectral normalisation (power iteration as carried state)
# ---------------------------------------------------------------------------


def _uniform_pm1_init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -1.0, 1.0)


def _power_iteration(w_mat: jnp.ndarray, u: jnp.ndarray, eps: float = 1e-12):
    """One power-iteration step; returns (sigma, new_u). w_mat: (out, in)."""
    v = jnp.matmul(u, w_mat)  # (1, in)
    v = v * jax.lax.rsqrt(jnp.sum(v * v) + eps)
    u_new = jnp.matmul(v, w_mat.T)  # (1, out)
    u_new = u_new * jax.lax.rsqrt(jnp.sum(u_new * u_new) + eps)
    sigma = jnp.sum(u_new * jnp.matmul(v, w_mat.T))
    return sigma, u_new


class SNConv2D(nn.Module):
    """Spectrally-normalised conv (Chainer SpectralNormalization-hook twin).

    The ``u`` vector lives in the mutable ``sn`` collection and advances one
    power iteration per call when that collection is mutable (i.e. during
    training); eval applies the last sigma without updating. Weight init is
    Uniform(1) scaled like Chainer's ``initializers.Uniform(1)``.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            _uniform_pm1_init,  # Chainer initializers.Uniform(1): U(-1, 1)
            (k, k, in_ch, self.features),
            jnp.float32,
        )
        w_mat = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)
        u = self.variable(
            "sn", "u", lambda: jax.random.normal(self.make_rng("params"), (1, self.features))
        )
        sigma, u_new = _power_iteration(w_mat, jax.lax.stop_gradient(u.value))
        if not self.is_initializing() and not self.is_mutable_collection("sn"):
            sigma = jax.lax.stop_gradient(sigma)
        else:
            u.value = jax.lax.stop_gradient(u_new)
        kernel = kernel / sigma
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class SNLinear(nn.Module):
    """Spectrally-normalised linear layer."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", _uniform_pm1_init, (in_ch, self.features), jnp.float32
        )
        w_mat = kernel.T  # (out, in)
        u = self.variable(
            "sn", "u", lambda: jax.random.normal(self.make_rng("params"), (1, self.features))
        )
        sigma, u_new = _power_iteration(w_mat, jax.lax.stop_gradient(u.value))
        if not self.is_initializing() and not self.is_mutable_collection("sn"):
            sigma = jax.lax.stop_gradient(sigma)
        else:
            u.value = jax.lax.stop_gradient(u_new)
        y = jnp.dot(x, (kernel / sigma).astype(x.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# depth-head initialisers (``net.py:211-214``)
# ---------------------------------------------------------------------------


def depth_head_kernel_init(lrmul: float = 1.0) -> Callable:
    """toRGBD 1x1 conv kernel init: N(0, 1/lrmul) with the depth (last)
    output channel zeroed, so generated depth starts flat."""

    base = nn.initializers.normal(stddev=1.0 / lrmul)

    def init(key, shape, dtype=jnp.float32):
        w = base(key, shape, dtype)
        return w.at[..., -1].set(0.0)

    return init


def depth_head_bias_init(initial_depth: float) -> Callable:
    """toRGBD bias init: zero except the depth channel at
    ``log(e^initial_depth - 1)`` (softplus inverse), so the initial inverse
    depth is ~1/initial_depth."""

    b_last = math.log(math.e**initial_depth - 1.0)

    def init(key, shape, dtype=jnp.float32):
        b = jnp.zeros(shape, dtype)
        return b.at[-1].set(b_last)

    return init
