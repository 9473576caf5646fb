"""PGGAN discriminators (flax, NHWC) — port of ``net.py:357-599``.

The discriminator sees RGB only (depth is never shown to D; the
3-channel ``ins`` convs enforce it, ``net.py:447-465``). Progressive fade-in
mirrors the generator; the hidden 32x32 feature is exposed (tap before
``blocks[3]``) for the adversarial feature-rotate loss (``net.py:487-500``).
``sn=True`` swaps all convs/linears for spectrally-normalised ones (power
iteration carried in the mutable ``sn`` collection); ``res=True`` adds a
conv shortcut per block.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (
    EqualizedConv2D,
    EqualizedLinear,
    SNConv2D,
    SNLinear,
    blur3x3,
    downscale2x,
    leaky_relu,
)

MAX_STAGE = 17


def _conv(sn: bool, features: int, ksize: int, stride: int, pad: int, name: str):
    if sn:
        return SNConv2D(features, ksize, stride, pad, name=name)
    return EqualizedConv2D(features, ksize, stride, pad, name=name)


def _linear(sn: bool, features: int, name: str, gain: float = 1.0):
    if sn:
        return SNLinear(features, name=name)
    return EqualizedLinear(features, gain=gain, name=name)


class DiscriminatorBlockBase(nn.Module):
    """Final 4x4 head: 3x3 conv -> 4x4 valid conv -> linear
    (``net.py:357-377``)."""

    ch: int
    out_dim: int = 1
    sn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = leaky_relu(_conv(self.sn, self.ch, 3, 1, 1, "c0")(x))
        h = leaky_relu(_conv(self.sn, self.ch, 4, 1, 0, "c1")(h))
        return _linear(self.sn, self.out_dim, "l2")(h)


class DiscriminatorBlock(nn.Module):
    """conv x2 (+optional residual shortcut, +optional BN) then downscale
    (``net.py:380-426``)."""

    in_ch: int
    out_ch: int
    enable_blur: bool = False
    sn: bool = False
    res: bool = False
    bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = _conv(self.sn, self.out_ch, 3, 1, 1, "c0")(x)
        if self.bn:
            h = nn.BatchNorm(use_running_average=not train, name="b0")(h)
        h = leaky_relu(h)
        h = _conv(self.sn, self.out_ch, 3, 1, 1, "c1")(h)
        if self.bn:
            h = nn.BatchNorm(use_running_average=not train, name="b1")(h)
        if self.res:
            h = h + _conv(self.sn, self.out_ch, 3, 1, 1, "c_sc")(x)
        h = leaky_relu(h)
        h = downscale2x(h)
        if self.enable_blur:
            h = blur3x3(h)
        return h


def _dis_block_channels(ch: int):
    """(in, out) for blocks 1..5 at 8/16/32/64/128 px (``net.py:438-445``)."""
    return [
        (ch, ch),
        (ch, ch),
        (ch, ch),
        (ch // 2, ch),
        (ch // 4, ch // 2),
    ]


def _dis_in_channels(ch: int):
    return [ch, ch, ch, ch, ch // 2, ch // 4]


class Discriminator(nn.Module):
    """Progressive PGGAN discriminator (``net.py:429-504``).

    ``compute_dtype=jnp.bfloat16`` casts the input at entry and runs the conv
    trunk in bf16 (params f32); the scalar logit head and the hidden-feature
    tap are returned in f32."""

    ch: int = 512
    out_dim: int = 1
    enable_blur: bool = False
    sn: bool = False
    res: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.block0 = DiscriminatorBlockBase(self.ch, self.out_dim, sn=self.sn, name="block0")
        self.blocks = [
            DiscriminatorBlock(
                c_in, c_out, enable_blur=self.enable_blur, sn=self.sn, res=self.res,
                name=f"block{i + 1}",
            )
            for i, (c_in, c_out) in enumerate(_dis_block_channels(self.ch))
        ]
        self.ins = [
            _conv(self.sn, c, 1, 1, 0, f"in{i}") for i, c in enumerate(_dis_in_channels(self.ch))
        ]

    def _run_block(self, i: int, h: jnp.ndarray) -> jnp.ndarray:
        return self.block0(h) if i == 0 else self.blocks[i - 1](h)

    def __call__(
        self,
        x: jnp.ndarray,
        stage_floor: int,
        alpha: jnp.ndarray = 0.0,
        *,
        return_hidden: bool = False,
    ):
        stage = min(int(stage_floor), MAX_STAGE - 1)
        feat = None
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        h = x
        if stage % 2 == 0:
            k = (stage - 2) // 2
            h = leaky_relu(self.ins[k + 1](h))
            for i in reversed(range(0, (k + 1) + 1)):  # k+1 .. 0
                if i == 3:
                    feat = h  # 32x32 tap for the adversarial 3D-consistency loss
                h = self._run_block(i, h)
        else:
            k = (stage - 1) // 2
            h_0 = leaky_relu(self.ins[k](downscale2x(x)))
            h_1 = self._run_block(k + 1, leaky_relu(self.ins[k + 1](x)))
            h = (1.0 - alpha) * h_0 + alpha * h_1
            for i in reversed(range(0, k + 1)):  # k .. 0
                if i == 3:
                    feat = h
                h = self._run_block(i, h)
        h = h.astype(jnp.float32)
        if return_hidden:
            return h, (feat.astype(jnp.float32) if feat is not None else None)
        return h

    def init_all(self, x4: jnp.ndarray):
        """Touch every block and input conv to create the full param set.

        ``x4``: a (B, 4, 4, 3) RGB tensor; each block is driven at a small
        compatible size (params are resolution-independent).
        """
        for i, conv in enumerate(self.ins):
            conv(x4)
        out = self.block0(jnp.zeros((x4.shape[0], 4, 4, self.ch), x4.dtype))
        for i, block in enumerate(self.blocks):
            block(jnp.zeros((x4.shape[0], 8, 8, block.in_ch), x4.dtype))
        return out


class DisentangledDiscriminator(nn.Module):
    """Shared trunk + camera-param / z-regression / adversarial heads
    (``net.py:507-599``; declared in the reference but unused by the shipped
    configs)."""

    ch: int = 512
    enable_blur: bool = False
    sn: bool = False
    res: bool = False
    num_z: int = 2

    def setup(self):
        shared = [
            (self.ch, self.ch),
            (self.ch, self.ch),
            (self.ch // 2, self.ch),
            (self.ch // 4, self.ch // 2),
            (self.ch // 8, self.ch // 4),
            (self.ch // 16, self.ch // 8),
            (self.ch // 32, self.ch // 16),
        ]
        self.shared_blocks = [
            DiscriminatorBlock(
                c_in, c_out, enable_blur=self.enable_blur, sn=self.sn, res=self.res,
                name=f"shared{i}",
            )
            for i, (c_in, c_out) in enumerate(shared)
        ]
        self.camera_block = DiscriminatorBlock(
            self.ch, self.ch, enable_blur=self.enable_blur, sn=self.sn, res=self.res,
            name="cam_block",
        )
        self.camera_head = DiscriminatorBlockBase(self.ch, out_dim=9, sn=self.sn, name="cam_head")
        self.z_block = DiscriminatorBlock(
            self.ch, self.ch, enable_blur=self.enable_blur, sn=self.sn, res=self.res,
            name="z_block",
        )
        self.z_head = DiscriminatorBlockBase(
            self.ch, out_dim=self.ch * self.num_z, sn=self.sn, name="z_head"
        )
        self.adv_block = DiscriminatorBlock(
            self.ch, self.ch, enable_blur=self.enable_blur, sn=self.sn, res=self.res,
            name="adv_block",
        )
        self.adv_head = DiscriminatorBlockBase(self.ch, out_dim=1, sn=self.sn, name="adv_head")
        ins_ch = [
            self.ch, self.ch, self.ch, self.ch,
            self.ch // 2, self.ch // 4, self.ch // 8, self.ch // 16, self.ch // 32,
        ]
        self.ins = [_conv(self.sn, c, 1, 1, 0, f"in{i}") for i, c in enumerate(ins_ch)]

    def __call__(self, x: jnp.ndarray, stage_floor: int, alpha: jnp.ndarray = 0.0):
        stage = min(int(stage_floor), MAX_STAGE - 1)
        h = x
        if stage % 2 == 0:
            k = (stage - 2) // 2
            h = leaky_relu(self.ins[k + 1](h))
            for i in reversed(range(0, k)):
                h = self.shared_blocks[i](h)
        else:
            k = (stage - 1) // 2
            h_0 = leaky_relu(self.ins[k](downscale2x(x)))
            h_1 = self.shared_blocks[k - 1](leaky_relu(self.ins[k + 1](x)))
            h = (1.0 - alpha) * h_0 + alpha * h_1
            for i in reversed(range(0, k - 1)):
                h = self.shared_blocks[i](h)
        est_camera = self.camera_head(self.camera_block(h))
        est_z = self.z_head(self.z_block(h))
        out = self.adv_head(self.adv_block(h))
        return out, est_camera, est_z
