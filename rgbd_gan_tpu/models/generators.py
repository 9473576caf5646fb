"""Generators: mapping network, StyleGAN synthesis, DCGAN (flax, NHWC).

TPU-first port of ``net.py`` (nogu-atsu/RGBD-GAN). Progressive growing is
expressed as a *static* ``stage_floor`` (each floor is its own jit compile —
at most ``max_stage`` compiles per run) and a *traced* fade-in ``alpha``, so
every compiled graph has static shapes and a fixed block set.

Reference semantics preserved (with file:line cites at each site):

- stage/alpha schedule and even/odd block selection (``net.py:232-292``)
- camera conditioning of the first two blocks via ``rotate_w`` (concat
  ``[w, theta*16]`` -> 2 lrelu-linears) or ``w_from_theta``
  (``net.py:220-230``); the fade-in block of odd stages is *not*
  conditioned (``net.py:290`` uses plain ``w``) — quirk preserved
- ``w2`` takes over at block 3 / resolution 32 (``net.py:258,276``)
- inverse-depth head ``depth = 1/(softplus(h_last) + 1e-4)`` with
  zero-initialised depth weights and softplus-inverse bias
  (``net.py:294-299, 211-214``)
- ``add_noise`` is forced off inside forward (``net.py:243, 720``) but the
  noise parameters exist (created during init) for checkpoint parity
- eval mode nearest-upsamples outputs below 64 px (``net.py:305-311``)
- latent normalisation quirks in ``make_hidden`` (``net.py:333-343``
  divides the 2*ch-dim z by sqrt(sum/ch), not sum/(2*ch))
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .extras import OccupancyNet
from ..nn.layers import (
    AdaINBlock,
    EqualizedConv2D,
    EqualizedLinear,
    NoiseBlock,
    blur3x3,
    depth_head_bias_init,
    depth_head_kernel_init,
    l2_normalize_channels,
    leaky_relu,
    pixel_norm,
    upscale2x,
)

MAX_STAGE = 17
MIN_SAMPLE_IMAGE_SIZE = 64  # eval-mode minimum output size (net.py:306)


# ---------------------------------------------------------------------------
# latent samplers (the reference's ``make_hidden`` twins, explicit-key RNG)
# ---------------------------------------------------------------------------


def mapping_make_hidden(key: jax.Array, batch_size: int, ch: int) -> jnp.ndarray:
    """Plain N(0,1) latent for the legacy RGB path (``net.py:47-56``)."""
    return jax.random.normal(key, (batch_size, ch), dtype=jnp.float32)


def stylegan_make_hidden(key: jax.Array, batch_size: int, ch: int) -> jnp.ndarray:
    """(B, 2*ch) Gaussian normalised by sqrt(sum(z^2)/ch + 1e-8).

    Note the divisor uses ``ch`` although z has ``2*ch`` dims — reference
    quirk (``net.py:333-343``).
    """
    z = jax.random.normal(key, (batch_size, ch * 2), dtype=jnp.float32)
    return z / jnp.sqrt(jnp.sum(z * z, axis=1, keepdims=True) / ch + 1e-8)


def dcgan_make_hidden(key: jax.Array, batch_size: int, in_ch: int) -> jnp.ndarray:
    """(B, in_ch) Gaussian normalised by sqrt(sum(z^2)/in_ch + 1e-8)
    (``net.py:697-707``)."""
    z = jax.random.normal(key, (batch_size, in_ch), dtype=jnp.float32)
    return z / jnp.sqrt(jnp.sum(z * z, axis=1, keepdims=True) / in_ch + 1e-8)


# ---------------------------------------------------------------------------
# mapping network
# ---------------------------------------------------------------------------


class MappingNetwork(nn.Module):
    """8x (equalized linear + leaky ReLU) on a PixelNorm'd latent
    (``net.py:22-62``)."""

    ch: int = 512

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = pixel_norm(z.reshape(z.shape[0], -1))
        for i in range(8):
            h = leaky_relu(EqualizedLinear(self.ch, name=f"l{i}")(h))
        return h


# ---------------------------------------------------------------------------
# StyleGAN synthesis
# ---------------------------------------------------------------------------


class SynthesisBlock(nn.Module):
    """One StyleGAN synthesis block (``net.py:105-161``).

    const-4x4 input (init ones, ``net.py:113-114``) or upsample->conv, then
    2x { conv -> (noise) -> bias -> lrelu -> AdaIN }.
    """

    ch: int
    ch_in: int
    upsample: bool = True
    enable_blur: bool = False

    @nn.compact
    def __call__(
        self, w: jnp.ndarray, x: Optional[jnp.ndarray] = None, add_noise: bool = False
    ) -> jnp.ndarray:
        batch_size = w.shape[0]
        if self.upsample:
            assert x is not None
            h = upscale2x(x)
            if self.enable_blur:
                h = blur3x3(h)
            h = EqualizedConv2D(self.ch, 3, 1, 1, use_bias=False, name="c0")(h)
        else:
            const = self.param(
                "const", nn.initializers.ones_init(), (4, 4, self.ch_in), jnp.float32
            )
            h = jnp.broadcast_to(const[None], (batch_size, 4, 4, self.ch_in)).astype(w.dtype)

        if add_noise:
            h = NoiseBlock(name="n0")(h)
        b0 = self.param("b0", nn.initializers.zeros_init(), (self.ch,), jnp.float32)
        h = leaky_relu(h + b0.astype(h.dtype))
        h = AdaINBlock(self.ch, name="s0")(w, h)

        h = EqualizedConv2D(self.ch, 3, 1, 1, use_bias=False, name="c1")(h)
        if add_noise:
            h = NoiseBlock(name="n1")(h)
        b1 = self.param("b1", nn.initializers.zeros_init(), (self.ch,), jnp.float32)
        h = leaky_relu(h + b1.astype(h.dtype))
        h = AdaINBlock(self.ch, name="s1")(w, h)
        return h


def _stylegan_block_channels(ch: int) -> Tuple[Tuple[int, int], ...]:
    """(ch_out, ch_in) per block: 4, 8, 16, 32, 64, 128 px (``net.py:174-184``)."""
    return (
        (ch, ch),
        (ch, ch),
        (ch, ch),
        (ch, ch),
        (ch // 2, ch),
        (ch // 4, ch // 2),
    )


class StyleGenerator(nn.Module):
    """Progressive StyleGAN synthesis stack (``net.py:164-311``).

    ``compute_dtype=jnp.bfloat16`` runs the conv stack in bf16 on the MXU
    (params stay f32; AdaIN/PixelNorm statistics and the toRGBD +
    inverse-depth head compute in f32)."""

    ch: int = 512
    enable_blur: bool = False
    rgbd: bool = False
    rotate_conv_input: bool = False
    use_occupancy_net: bool = False
    initial_depth: float = 1.0
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        chans = _stylegan_block_channels(self.ch)
        self.blocks = [
            SynthesisBlock(
                c_out, c_in, upsample=(i != 0), enable_blur=self.enable_blur, name=f"block{i}"
            )
            for i, (c_out, c_in) in enumerate(chans)
        ]
        out_ch = 4 if self.rgbd else 3
        kinit = depth_head_kernel_init() if self.rgbd else None
        binit = (
            depth_head_bias_init(self.initial_depth)
            if self.rgbd
            else nn.initializers.zeros_init()
        )
        self.outs = [
            EqualizedConv2D(
                out_ch, 1, 1, 0, gain=1.0, kernel_init=kinit, bias_init=binit, name=f"out{i}"
            )
            for i in range(len(chans))
        ]
        if self.rgbd:
            self.l1 = EqualizedLinear(self.ch, name="l1")
            self.l2 = EqualizedLinear(self.ch, name="l2")
        if self.use_occupancy_net:
            # latent is the full 2*ch z (net.py:209)
            self.occupancy = OccupancyNet(in_ch=self.ch * 2 + 3, hidden_ch=32, name="occupancy")

    @property
    def n_blocks(self) -> int:
        return 6

    def rotate_w(self, w: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
        """Camera conditioning: concat ``[w, theta*16]`` -> 2 lrelu-linears
        (``net.py:220-224``)."""
        h = jnp.concatenate([w, theta * 16], axis=1)
        h = leaky_relu(self.l1(h))
        return leaky_relu(self.l2(h))

    def w_from_theta(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Pure camera-driven style for the first blocks (``net.py:226-230``)."""
        h = leaky_relu(self.l1(theta))
        return leaky_relu(self.l2(h))

    def _conditioned_w(self, i: int, w: jnp.ndarray, theta: Optional[jnp.ndarray]):
        if self.rgbd and i < 2:
            if self.rotate_conv_input:
                return self.w_from_theta(theta)
            return self.rotate_w(w, theta)
        return w

    def __call__(
        self,
        w: jnp.ndarray,
        w2: jnp.ndarray,
        stage_floor: int,
        alpha: jnp.ndarray,
        theta: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        return_feature: bool = False,
        add_noise: bool = False,
    ):
        # the reference forces add_noise off for RGBD training (net.py:243)
        add_noise = False
        stage = min(int(stage_floor), MAX_STAGE - 1)
        if self.rgbd and theta is None:
            raise ValueError("theta is required for an RGBD generator")
        if self.compute_dtype is not None:
            w = w.astype(self.compute_dtype)
            w2 = w2.astype(self.compute_dtype)
            if theta is not None:
                theta = theta.astype(self.compute_dtype)

        feat = None
        h = None
        if stage % 2 == 0:
            k = (stage - 2) // 2
            for i in range(0, (k + 1) + 1):  # 0 .. k+1
                if i == 3:  # resolution 32 switches to the second style
                    w = w2
                h = self.blocks[i](self._conditioned_w(i, w, theta), x=h, add_noise=add_noise)
                if return_feature and i == 3:
                    feat = h
            h = self.outs[k + 1](h.astype(jnp.float32))
        else:
            k = (stage - 1) // 2
            for i in range(0, k + 1):  # 0 .. k
                if i == 3:
                    w = w2
                h = self.blocks[i](self._conditioned_w(i, w, theta), x=h, add_noise=add_noise)
                if return_feature and i == 3:
                    feat = h
            h_0 = upscale2x(self.outs[k](h.astype(jnp.float32)))
            # NB: the fade-in block gets the *unconditioned* w (net.py:290)
            h_1 = self.outs[k + 1](
                self.blocks[k + 1](w, x=h, add_noise=add_noise).astype(jnp.float32)
            )
            h = (1.0 - alpha) * h_0 + alpha * h_1

        if self.rgbd:
            depth = 1.0 / (jax.nn.softplus(h[..., -1:]) + 1e-4)
            h = jnp.concatenate([h[..., :3], depth], axis=-1)
        if feat is not None:
            feat = feat.astype(jnp.float32)

        if train:
            return (h, feat) if return_feature else h
        if h.shape[1] < MIN_SAMPLE_IMAGE_SIZE:
            scale = int(MIN_SAMPLE_IMAGE_SIZE // h.shape[1])
            h = jnp.repeat(jnp.repeat(h, scale, axis=1), scale, axis=2)
        return h

    def init_all(self, w, w2, theta):
        """Touch every submodule so ``init`` creates the full parameter set
        (all blocks, all toRGBD convs, noise gains, camera conditioning)."""
        for i, block in enumerate(self.blocks):
            x = None if i == 0 else jnp.zeros((w.shape[0], 4, 4, block.ch_in), w.dtype)
            h = block(self._conditioned_w(i, w if i < 3 else w2, theta), x=x, add_noise=True)
            self.outs[i](h)
        if self.use_occupancy_net:
            zcat = jnp.concatenate([w, w2], axis=1)
            self.occupancy(zcat, jnp.zeros((w.shape[0], 3, 4), w.dtype))
        return h


class StyleGANGenerator(nn.Module):
    """Mapping + synthesis wrapper (``net.py:314-354``)."""

    ch: int
    enable_blur: bool = False
    rgbd: bool = False
    rotate_conv_input: bool = False
    use_occupancy_net: bool = False
    initial_depth: float = 1.0
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.mapping = MappingNetwork(self.ch)
        self.gen = StyleGenerator(
            self.ch,
            enable_blur=self.enable_blur,
            rgbd=self.rgbd,
            rotate_conv_input=self.rotate_conv_input,
            use_occupancy_net=self.use_occupancy_net,
            initial_depth=self.initial_depth,
            compute_dtype=self.compute_dtype,
        )

    def __call__(
        self,
        z: jnp.ndarray,
        stage_floor: int,
        alpha: jnp.ndarray,
        theta: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        return_feature: bool = False,
    ):
        z = z.reshape(z.shape[0], -1)
        z1, z2 = jnp.split(z, 2, axis=1)  # low-res / high-res styles
        w = self.mapping(z1)
        w2 = self.mapping(z2)
        return self.gen(
            w, w2, stage_floor, alpha, theta, train=train, return_feature=return_feature
        )

    def init_all(self, z, theta):
        z = z.reshape(z.shape[0], -1)
        z1, z2 = jnp.split(z, 2, axis=1)
        w = self.mapping(z1)
        w2 = self.mapping(z2)
        return self.gen.init_all(w, w2, theta)

    def occupancy_logits(self, z: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        """Occupancy field logits for world coords (wired like
        ``updater.py:367-371``: the raw z latent, not w, feeds the MLP)."""
        return self.gen.occupancy(z.reshape(z.shape[0], -1), coords)


# ---------------------------------------------------------------------------
# DCGAN generator
# ---------------------------------------------------------------------------


class DCGANBlock(nn.Module):
    """upsample -> conv -> bias -> lrelu -> L2-channel-normalise, twice
    (``net.py:603-648``). The normalisation is Chainer ``F.normalize`` —
    division by the channel L2 *norm* (not RMS)."""

    ch: int
    ch_in: int
    enable_blur: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, add_noise: bool = False) -> jnp.ndarray:
        h = upscale2x(x)
        if self.enable_blur:
            h = blur3x3(h)
        h = EqualizedConv2D(self.ch, 3, 1, 1, use_bias=False, name="c0")(h)
        if add_noise:
            h = NoiseBlock(name="n0")(h)
        b0 = self.param("b0", nn.initializers.zeros_init(), (self.ch,), jnp.float32)
        h = leaky_relu(h + b0.astype(h.dtype))
        h = l2_normalize_channels(h)
        h = EqualizedConv2D(self.ch, 3, 1, 1, use_bias=False, name="c1")(h)
        if add_noise:
            h = NoiseBlock(name="n1")(h)
        b1 = self.param("b1", nn.initializers.zeros_init(), (self.ch,), jnp.float32)
        h = leaky_relu(h + b1.astype(h.dtype))
        return l2_normalize_channels(h)


class DCGANGenerator(nn.Module):
    """Progressive DCGAN generator (``net.py:651-773``).

    Conditioning: ``concat([z, theta*10])`` into the stem linear
    (``net.py:729-734``). Note the reference driver passes ``config.ch`` as
    ``in_ch`` while the hidden width stays at the default ``ch=512``
    (``train_rgbd.py:229-232``) — mirrored by the caller here.
    """

    in_ch: int = 128
    ch: int = 512
    enable_blur: bool = False
    rgbd: bool = False
    use_occupancy_net: bool = False
    initial_depth: float = 1.0
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.linear = EqualizedLinear(self.ch * 4 * 4, name="linear")
        chans = [
            (self.ch, self.ch),
            (self.ch, self.ch),
            (self.ch, self.ch),
            (self.ch // 2, self.ch),
            (self.ch // 4, self.ch // 2),
        ]  # 8, 16, 32, 64, 128 px
        self.blocks = [
            DCGANBlock(c_out, c_in, enable_blur=self.enable_blur, name=f"block{i}")
            for i, (c_out, c_in) in enumerate(chans)
        ]
        out_ch = 4 if self.rgbd else 3
        kinit = depth_head_kernel_init() if self.rgbd else None
        binit = (
            depth_head_bias_init(self.initial_depth)
            if self.rgbd
            else nn.initializers.zeros_init()
        )
        self.outs = [
            EqualizedConv2D(
                out_ch, 1, 1, 0, gain=1.0, kernel_init=kinit, bias_init=binit, name=f"out{i}"
            )
            for i in range(len(chans))
        ]
        if self.use_occupancy_net:
            self.occupancy = OccupancyNet(in_ch=self.in_ch + 3, hidden_ch=32, name="occupancy")

    def occupancy_logits(self, z: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        return self.occupancy(z.reshape(z.shape[0], -1), coords)

    def _stem(self, z: jnp.ndarray, theta: Optional[jnp.ndarray]) -> jnp.ndarray:
        if self.compute_dtype is not None:
            z = z.astype(self.compute_dtype)
            if theta is not None:
                theta = theta.astype(self.compute_dtype)
        if self.rgbd:
            h = jnp.concatenate([z, theta * 10], axis=1)
        else:
            h = z
        h = self.linear(h)
        # reshape matches the reference's NCHW view of the stem vector, then
        # transposes to NHWC
        return h.reshape(z.shape[0], self.ch, 4, 4).transpose(0, 2, 3, 1)

    def __call__(
        self,
        z: jnp.ndarray,
        stage_floor: int,
        alpha: jnp.ndarray,
        theta: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        return_feature: bool = False,
        add_noise: bool = False,
    ):
        add_noise = False  # forced off, as in the reference (net.py:720)
        stage = min(int(stage_floor), MAX_STAGE - 1)
        if self.rgbd and theta is None:
            raise ValueError("theta is required for an RGBD generator")
        if stage < 2:
            raise ValueError(
                "DCGANGenerator requires stage >= 2 (the reference indexes outs[-1] "
                "below that, which is a shape error there too)"
            )

        feat = None
        h = self._stem(z, theta)
        if stage % 2 == 0:
            k = (stage - 2) // 2
            for i in range(0, k + 1):  # 0 .. k
                h = self.blocks[i](h, add_noise=add_noise)
                if return_feature and i == 2:
                    feat = h
            h = self.outs[k](h.astype(jnp.float32))
        else:
            k = (stage - 1) // 2
            for i in range(0, k):  # 0 .. k-1
                h = self.blocks[i](h, add_noise=add_noise)
                if return_feature and i == 2:
                    feat = h
            h_0 = upscale2x(self.outs[k - 1](h.astype(jnp.float32)))
            h_1 = self.outs[k](self.blocks[k](h, add_noise=add_noise).astype(jnp.float32))
            h = (1.0 - alpha) * h_0 + alpha * h_1

        if self.rgbd:
            depth = 1.0 / (jax.nn.softplus(h[..., -1:]) + 1e-4)
            h = jnp.concatenate([h[..., :3], depth], axis=-1)

        if train:
            return (h, feat) if return_feature else h
        if h.shape[1] < MIN_SAMPLE_IMAGE_SIZE:
            scale = int(MIN_SAMPLE_IMAGE_SIZE // h.shape[1])
            h = jnp.repeat(jnp.repeat(h, scale, axis=1), scale, axis=2)
        return h

    def init_all(self, z, theta):
        h = self._stem(z, theta)
        for i, block in enumerate(self.blocks):
            h = block(h, add_noise=True)
            self.outs[i](h)
        if self.use_occupancy_net:
            self.occupancy(z, jnp.zeros((z.shape[0], 3, 4), z.dtype))
        return h
