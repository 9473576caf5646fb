"""Auxiliary model heads: encoder/BiGAN parts, occupancy net, camera-param
nets, generic MLP — ports of ``net.py:776-973`` (declared in the reference;
the BiGAN path is runtime-blocked there, ``updater.py:330-331``, and is kept
for API/inventory parity)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (
    EqualizedConv2D,
    EqualizedLinear,
    SNLinear,
    downscale2x,
    leaky_relu,
)
from .discriminator import MAX_STAGE, Discriminator, DiscriminatorBlock


class EncoderBlockBase(nn.Module):
    """Final encoder head with batch norm (``net.py:777-792``)."""

    ch: int
    dim_z: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = EqualizedConv2D(self.ch, 3, 1, 1, name="c0")(x)
        h = leaky_relu(nn.BatchNorm(use_running_average=not train, name="bn0")(h))
        h = EqualizedConv2D(self.ch, 4, 1, 0, name="c1")(h)
        h = leaky_relu(nn.BatchNorm(use_running_average=not train, name="bn1")(h))
        return EqualizedLinear(self.dim_z, gain=1.0, name="l2")(h)


class Encoder(nn.Module):
    """Progressive encoder: PGGAN-down trunk + camera-param head
    (``net.py:831-890``). Returns (z_estimate, normalised camera params)."""

    ch: int = 512
    dim_z: int = 256
    enable_blur: bool = False
    res: bool = True

    def setup(self):
        chans = [
            (self.ch, self.ch),
            (self.ch, self.ch),
            (self.ch, self.ch),
            (self.ch // 2, self.ch),
            (self.ch // 4, self.ch // 2),
        ]
        self.block0 = EncoderBlockBase(self.ch, self.dim_z + 9, name="block0")
        self.blocks = [
            DiscriminatorBlock(
                c_in, c_out, enable_blur=self.enable_blur, sn=False, res=self.res, bn=True,
                name=f"block{i + 1}",
            )
            for i, (c_in, c_out) in enumerate(chans)
        ]
        ins_ch = [self.ch, self.ch, self.ch, self.ch, self.ch // 2, self.ch // 4]
        self.ins = [
            EqualizedConv2D(c, 1, 1, 0, name=f"in{i}") for i, c in enumerate(ins_ch)
        ]

    def _run_block(self, i: int, h: jnp.ndarray, train: bool) -> jnp.ndarray:
        if i == 0:
            return self.block0(h, train=train)
        return self.blocks[i - 1](h, train=train)

    def __call__(self, x: jnp.ndarray, stage_floor: int, alpha: jnp.ndarray = 0.0, train=True):
        stage = min(int(stage_floor), MAX_STAGE - 1)
        h = x
        if stage % 2 == 0:
            k = (stage - 2) // 2
            h = leaky_relu(self.ins[k + 1](h))
            for i in reversed(range(0, (k + 1) + 1)):
                h = self._run_block(i, h, train)
        else:
            k = (stage - 1) // 2
            h_0 = leaky_relu(self.ins[k](downscale2x(x)))
            h_1 = self._run_block(k + 1, leaky_relu(self.ins[k + 1](x)), train)
            h = (1.0 - alpha) * h_0 + alpha * h_1
            for i in reversed(range(0, k + 1)):
                h = self._run_block(i, h, train)
        # normalise the rotation part to cos^2 + sin^2 = 1 (net.py:888-890)
        cos_part = h[:, -9:-6]
        sin_part = h[:, -6:-3]
        inv = 1.0 / jnp.sqrt(jnp.square(cos_part) + jnp.square(sin_part) + 1e-8)
        camera_param = jnp.concatenate([cos_part * inv, sin_part * inv, h[:, -3:]], axis=1)
        return h[:, :-9], camera_param


class MLP(nn.Module):
    """3-layer MLP, equalized or spectrally normalised (``net.py:893-917``)."""

    ch: int
    out_ch: int
    sn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        lin = (lambda f, n: SNLinear(f, name=n)) if self.sn else (
            lambda f, n: EqualizedLinear(f, name=n)
        )
        h = leaky_relu(lin(self.ch, "l0")(x))
        h = leaky_relu(lin(self.ch, "l1")(h))
        return lin(self.out_ch, "l2")(h)


class CameraParamGenerator(nn.Module):
    """z -> 9-dim camera params with normalised rotation (``net.py:795-813``)."""

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = leaky_relu(EqualizedLinear(64, name="l0")(z))
        h = leaky_relu(EqualizedLinear(64, name="l1")(h))
        h = EqualizedLinear(9, name="l2")(h)
        inv = 1.0 / jnp.sqrt(jnp.square(h[:, :3]) + jnp.square(h[:, 3:6]) + 1e-8)
        return jnp.concatenate([h[:, :3] * inv, h[:, 3:6] * inv, h[:, 6:]], axis=1)


class CameraParamDiscriminator(nn.Module):
    """9-dim camera params -> realness logit (``net.py:816-828``)."""

    @nn.compact
    def __call__(self, camera_param: jnp.ndarray) -> jnp.ndarray:
        h = leaky_relu(EqualizedLinear(64, name="l0")(camera_param))
        h = leaky_relu(EqualizedLinear(64, name="l1")(h))
        return EqualizedLinear(1, name="l2")(h)


class BigBiGANDiscriminator(nn.Module):
    """Joint (x, z, camera) discriminator (``net.py:920-948``)."""

    ch: int
    dim_z: int
    enable_blur: bool = False
    sn: bool = False
    res: bool = False

    def setup(self):
        self.f = Discriminator(
            self.ch, out_dim=self.ch, enable_blur=self.enable_blur, sn=self.sn, res=self.res,
            name="f",
        )
        self.h_z = MLP(self.ch, self.ch, sn=self.sn, name="h_z")
        self.h_cp = MLP(9, self.ch, sn=self.sn, name="h_cp")
        self.j = MLP(self.ch * 3, 1, sn=self.sn, name="j")
        lin = (lambda n: SNLinear(1, name=n)) if self.sn else (
            lambda n: EqualizedLinear(1, name=n)
        )
        self.s_x = lin("s_x")
        self.s_z = lin("s_z")
        self.s_cp = lin("s_cp")

    def __call__(self, x, z, cp, stage_floor: int, alpha=0.0):
        f = self.f(x, stage_floor, alpha)
        h_z = self.h_z(z)
        h_cp = self.h_cp(cp)
        s_xzcp = self.j(jnp.concatenate([f, h_z, h_cp], axis=1))
        return s_xzcp, self.s_x(f), self.s_z(h_z), self.s_cp(h_cp)


class OccupancyNet(nn.Module):
    """Occupancy MLP on [tiled z, scaled world coords] (``net.py:951-973``)."""

    in_ch: int
    hidden_ch: int = 32

    @nn.compact
    def __call__(self, z: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        """:param z: (B, z_dim) latent; :param coords: (B, 3, HW) world xyz."""
        z_dim = z.shape[1]
        hw = coords.shape[2]
        tiled = jnp.tile(z[:, :, None], (1, 1, hw))
        h = jnp.concatenate([tiled, coords * (z_dim**0.5)], axis=1)  # (B, z_dim+3, HW)
        h = h.transpose(0, 2, 1).reshape(-1, z_dim + 3)
        h = leaky_relu(EqualizedLinear(self.hidden_ch, name="l0")(h))
        h = leaky_relu(EqualizedLinear(self.hidden_ch, name="l1")(h))
        return EqualizedLinear(1, name="l2")(h)
