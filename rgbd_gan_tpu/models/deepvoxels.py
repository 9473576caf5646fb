"""DeepVoxels generator family (flax, NDHWC/NHWC) — TPU-first redesign.

Port of ``deepvoxels_generator.py`` + ``deepvoxel/`` from nogu-atsu/RGBD-GAN.
The pipeline: mapping -> 3D StyleGAN voxel generator (4^3 -> 32^3, 32 feats)
-> perspective resampling of the voxel grid into a per-camera view frustum
-> occlusion network collapsing the frustum depth axis into visibility
weights + expected depth -> 2D style refiner to RGB -> concat depth.

**TPU-first rewrite of the projection** (reference
``deepvoxel/projection.py:48-105`` + ``deepvoxel/deepvoxel.py:388-428``):
the reference loops over batch items on the host, builds *variable-length*
in-bounds index lists, and ``scatter_add``-s trilinear gathers into a dense
frustum. Each frustum cell maps to exactly one voxel neighbourhood, so the
whole operation is a *fixed-shape dense gather*: compute the (4, D*H*W)
frustum lattice once as a constant, transform it by the batch of cam2world
matrices (one batched matmul), trilinearly gather from the voxel grid with
clamped indices, and zero out-of-bounds cells with a mask. No host loop, no
scatter, fully vmappable/jittable.

Quirks preserved (flags noted):
- frustum y-coordinate uses float division ``tmp / W`` (not ``//``), adding
  a +x/W skew to y (``projection.py:67``) — ``exact_lifting=True`` default
- the trilinear corner set and clamping exactly follow
  ``deepvoxel.py:398-423`` (x1/y1/z1 clamped, x0/y0/z0 not — safe here
  because out-of-bounds cells are masked)
- depth decode ``(d + 0.5) * ceil(sqrt(3)*32) * voxel_size + near``
  (``deepvoxel.py:903-904``)
- the 2D refiner's output conv uses gain=0.5 (``deepvoxels_generator.py:200``)
- ``AccumulativeOcclusionNet`` threshold defaults to 4
  (``deepvoxel.py:556``)
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import (
    AdaINBlock,
    EqualizedConv2D,
    EqualizedConv3D,
    EqualizedLinear,
    NoiseBlock,
    l2_normalize_channels,
    leaky_relu,
    upscale2x,
    upscale2x_3d,
)
from .extras import CameraParamGenerator
from .generators import MappingNetwork, SynthesisBlock

# ---------------------------------------------------------------------------
# geometry constants (deepvoxels_generator.py:230-253)
# ---------------------------------------------------------------------------

GRID_DIM = 32
PROJ_DIM = 64
SCALE = 0.5
NEAR_PLANE = math.sqrt(3) / 4
VOXEL_SIZE = (1.0 / GRID_DIM) * 1.1 * SCALE
FRUSTUM_DEPTH = int(np.ceil(np.sqrt(3) * GRID_DIM))  # 56
NUM_GRID_FEATS = 32
FOCAL = PROJ_DIM * 2.0  # 128
CENTER = float(GRID_DIM)  # 32 (principal point of the 64px lift intrinsic)
# d1-window width for the 'pallas_win' lift modes; must be a multiple of the
# 8-sublane tile. The correctness precondition (every point tile's grid-dim1
# reach fits one window) is DERIVED from the live geometry constants by
# :func:`lift_window_span_bound` and enforced in :func:`_resolve_lift_mode`.
LIFT_WINDOW = 16


def lift_window_span_bound() -> float:
    """Worst-case per-tile grid-dim1 FLOAT span of the windowed lift, derived
    from the live geometry constants (so editing FOCAL/VOXEL_SIZE/GRID_DIM/
    FRUSTUM_DEPTH/NEAR_PLANE — or the kernel tile size — moves the gate).

    A point tile is ``TILE_N`` consecutive frustum cells in depth-major
    linear order; when ``PROJ_DIM**2 % TILE_N == 0`` a tile never straddles
    depth planes, so its camera-space z is constant and it covers frustum-v
    values spanning ``dy = (TILE_N - 1) / PROJ_DIM`` (float-division y quirk
    included, ``projection.py:67``). With ``z_rotate == 0`` the cam2world
    row-1 Jacobian has no frustum-u component (row 1 of
    Rz(0)@Ry@Rx@diag(1,1,-1) is [0, cos x, sin x]) and z/translations are
    constant per tile, so the tile's grid-dim1 float span is exactly
    ``|cos x_rot| * dy * zc / (FOCAL * VOXEL_SIZE)`` — maximised at
    ``|cos| = 1`` (the prior's U(-r, r) range always contains 0) and at the
    farthest depth plane. Returns ``inf`` when the tile-alignment
    precondition itself fails.

    The integer-index reach per tile is at most ``floor(span) + 2`` planes
    (floor straddle + the trilinear +1 corner), so ``pallas_win`` is exact
    iff ``floor(span) + 2 <= LIFT_WINDOW - 1``; the resolver enforces the
    slightly stronger ``span + 3 <= LIFT_WINDOW`` (one extra plane of
    margin). Checked empirically over the production prior by
    ``tests/test_trilinear_pallas.py::test_span_invariant_over_production_prior``.
    """
    from ..ops.trilinear_pallas import TILE_N

    if (PROJ_DIM * PROJ_DIM) % TILE_N != 0:
        return float("inf")  # a tile straddles depth planes: z varies in-tile
    dy = (TILE_N - 1) / PROJ_DIM
    zc_max = NEAR_PLANE + (FRUSTUM_DEPTH - 1) * VOXEL_SIZE
    return dy * zc_max / (FOCAL * VOXEL_SIZE)

PROJECTION_INTRINSIC = np.array(
    [
        [FOCAL, 0.0, CENTER, 0.0],
        [0.0, FOCAL, CENTER, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype="float32",
)


def frustum_camera_coords(exact_lifting: bool = True) -> np.ndarray:
    """Homogeneous camera-space coords of every frustum cell: (4, D*H*W).

    Dense twin of ``projection.py:56-80``. Cell layout is depth-major then
    row-major, matching the reference's linear index.
    """
    n = PROJ_DIM * PROJ_DIM * FRUSTUM_DEPTH
    lin = np.arange(n)
    zi = lin // (PROJ_DIM * PROJ_DIM)
    tmp = lin - zi * PROJ_DIM * PROJ_DIM
    if exact_lifting:
        y = tmp / PROJ_DIM  # reference quirk: float division (projection.py:67)
    else:
        y = tmp // PROJ_DIM
    x = tmp % PROJ_DIM
    zc = zi * VOXEL_SIZE + NEAR_PLANE
    xc = (x - CENTER) / FOCAL * zc
    yc = (y - CENTER) / FOCAL * zc
    return np.stack([xc, yc, zc, np.ones_like(zc)]).astype("float32")


def frustum_voxel_coords(cam2world: jnp.ndarray, coords_const: jnp.ndarray):
    """Voxel-space frustum coordinates + validity mask per camera.

    Dense twin of the reference's index-list build (``projection.py:81-99``):
    lift the frustum lattice to world space and rescale into grid units.
    Returns ``vox`` (B, 3, N) and ``in_bounds`` (B, N).
    """
    g = GRID_DIM
    grid_coords = jnp.einsum("bij,jn->bin", cam2world, coords_const)  # (B, 4, N)
    vox = grid_coords[:, :3] / VOXEL_SIZE + g / 2  # (B, 3, N)
    in_bounds = jnp.all(vox >= 0, axis=1) & jnp.all(vox < g, axis=1)  # (B, N)
    return vox, in_bounds


def lift_frustum(
    voxel: jnp.ndarray, cam2world: jnp.ndarray, coords_const: jnp.ndarray,
    lift_mode: str = "gather",
) -> jnp.ndarray:
    """Resample the voxel grid into each camera's view frustum (dense).

    :param voxel: (B, G, G, G, C) NDHWC feature grid, spatial order matching
        the reference's conv output dims
    :param cam2world: (B, 4, 4)
    :param coords_const: (4, N) from :func:`frustum_camera_coords`
    :param lift_mode: 'gather' (pure-XLA flat gather), 'pallas'
        (:mod:`..ops.trilinear_pallas` — VMEM-resident one-hot MXU kernel
        with a scatter-free custom VJP; bf16 operands / f32 accumulation —
        at the production channel count the f32 working set exceeds the
        16 MB scoped-VMEM budget), 'pallas_f32' (exact operands; fits only
        for small C), or 'pallas_win' / 'pallas_win_f32' (the windowed
        kernel: each point tile contracts only LIFT_WINDOW consecutive
        grid-dim1 planes — half the MXU MACs; valid ONLY when the cameras
        guarantee the per-tile dim1 span invariant, i.e. ``z_rotate == 0``
        — see :func:`_resolve_lift_mode` for the bound)
    :returns: (B, FRUSTUM_DEPTH, H, W, C) canonical view volumes
    """
    b = voxel.shape[0]
    c = voxel.shape[-1]
    g = GRID_DIM

    vox, in_bounds = frustum_voxel_coords(cam2world, coords_const)

    if lift_mode.startswith("pallas"):
        from ..ops.trilinear_pallas import trilinear_lift

        dt = jnp.float32 if lift_mode.endswith("_f32") else jnp.bfloat16
        win = LIFT_WINDOW if lift_mode.startswith("pallas_win") else None
        out = trilinear_lift(voxel, vox, in_bounds, False, dt, win)
        return out.reshape(b, FRUSTUM_DEPTH, PROJ_DIM, PROJ_DIM, c)

    # axis roles follow interpolate_trilinear (deepvoxel.py:394-396):
    # grid spatial dim0 <- vox row 2, dim1 <- row 1, dim2 <- row 0
    xi = vox[:, 2]
    yi = vox[:, 1]
    zi = vox[:, 0]

    x0 = jnp.clip(xi.astype(jnp.int32), 0, g - 1)
    y0 = jnp.clip(yi.astype(jnp.int32), 0, g - 1)
    z0 = jnp.clip(zi.astype(jnp.int32), 0, g - 1)
    x1 = jnp.clip(x0 + 1, 0, g - 1)
    y1 = jnp.clip(y0 + 1, 0, g - 1)
    z1 = jnp.clip(z0 + 1, 0, g - 1)

    fx = xi - x0.astype(xi.dtype)
    fy = yi - y0.astype(yi.dtype)
    fz = zi - z0.astype(zi.dtype)

    # flat single-table gather: batched take_along_axis lowers to a slow
    # per-row gather on TPU, while one flat jnp.take over the concatenated
    # batch is bandwidth-bound (measured ~100x faster at these shapes)
    vflat = voxel.reshape(b * g * g * g, c)
    n_cells = coords_const.shape[1]
    base = (jnp.arange(b, dtype=jnp.int32) * (g * g * g))[:, None]

    def gather(ix, iy, iz):
        lin = base + (ix * g + iy) * g + iz  # (B, N)
        return jnp.take(vflat, lin.reshape(-1), axis=0).reshape(b, n_cells, c)

    fx_ = fx[..., None]
    fy_ = fy[..., None]
    fz_ = fz[..., None]
    out = (
        gather(x0, y0, z0) * (1 - fx_) * (1 - fy_) * (1 - fz_)
        + gather(x1, y0, z0) * fx_ * (1 - fy_) * (1 - fz_)
        + gather(x0, y1, z0) * (1 - fx_) * fy_ * (1 - fz_)
        + gather(x0, y0, z1) * (1 - fx_) * (1 - fy_) * fz_
        + gather(x1, y0, z1) * fx_ * (1 - fy_) * fz_
        + gather(x0, y1, z1) * (1 - fx_) * fy_ * fz_
        + gather(x1, y1, z0) * fx_ * fy_ * (1 - fz_)
        + gather(x1, y1, z1) * fx_ * fy_ * fz_
    )
    out = out * in_bounds[..., None].astype(out.dtype)
    return out.reshape(b, FRUSTUM_DEPTH, PROJ_DIM, PROJ_DIM, c)


def _depth_coords() -> np.ndarray:
    """Normalised per-slice depth coordinates (1, D, 1, 1, 1) in [-0.5, 0.5)
    (``deepvoxel.py:479-482``)."""
    d = np.arange(-FRUSTUM_DEPTH // 2, FRUSTUM_DEPTH // 2) / FRUSTUM_DEPTH
    return d.reshape(1, FRUSTUM_DEPTH, 1, 1, 1).astype("float32")


def decode_depth(depth_map: jnp.ndarray) -> jnp.ndarray:
    """Normalised [-0.5, 0.5] expected depth -> metric (``deepvoxel.py:903-904``)."""
    return (depth_map + 0.5) * FRUSTUM_DEPTH * VOXEL_SIZE + NEAR_PLANE


# ---------------------------------------------------------------------------
# reflect-pad convs (Conv2dSame / Conv3dSame, deepvoxel.py:35-60,149-176)
# ---------------------------------------------------------------------------


class Conv3dSame(nn.Module):
    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ka = self.kernel_size // 2
        kb = ka - 1 if self.kernel_size % 2 == 0 else ka
        if ka or kb:
            x = jnp.pad(
                x, ((0, 0), (ka, kb), (ka, kb), (ka, kb), (0, 0)), mode="reflect"
            )
        return EqualizedConv3D(
            self.features, self.kernel_size, 1, 0, use_bias=self.use_bias, name="conv"
        )(x)


class Conv2dSame(nn.Module):
    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ka = self.kernel_size // 2
        kb = ka - 1 if self.kernel_size % 2 == 0 else ka
        if ka or kb:
            x = jnp.pad(x, ((0, 0), (ka, kb), (ka, kb), (0, 0)), mode="reflect")
        return EqualizedConv2D(
            self.features, self.kernel_size, 1, 0, use_bias=self.use_bias, name="conv"
        )(x)


# ---------------------------------------------------------------------------
# U-Net library (2D/3D) — deepvoxel.py:63-146,179-385,621-794
# ---------------------------------------------------------------------------


class DownBlock3D(nn.Module):
    features: int
    norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = EqualizedConv3D(self.features, 4, 2, 0, use_bias=not self.norm, name="conv")(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return leaky_relu(x)


class UpBlock3D(nn.Module):
    features: int
    norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.ConvTranspose(
            self.features, (4, 4, 4), strides=(2, 2, 2), padding=[(1, 1)] * 3,
            use_bias=not self.norm, name="deconv",
        )(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class UnetSkipConnectionBlock3d(nn.Module):
    outer_nc: int
    inner_nc: int
    norm: bool = True
    depth: int = 0  # remaining recursion below this block

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = DownBlock3D(self.inner_nc, norm=self.norm, name="down")(x, train)
        if self.depth > 0:
            h = UnetSkipConnectionBlock3d(
                self.inner_nc,
                min(2 * self.inner_nc, 4 * self.inner_nc),
                norm=self.norm,
                depth=self.depth - 1,
                name="sub",
            )(h, train)
            h = UpBlock3D(self.outer_nc, norm=self.norm, name="up")(h, train)
        else:
            h = UpBlock3D(self.outer_nc, norm=self.norm, name="up")(h, train)
        return jnp.concatenate([x, h], axis=-1)


class Unet3d(nn.Module):
    """3D U-Net (``deepvoxel.py:322-385``); used by the full OcclusionNet."""

    out_channels: int
    nf0: int
    num_down: int
    max_channels: int
    outermost_linear: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv3dSame(self.nf0, 3, use_bias=False, name="in_conv")(x)
        h = nn.BatchNorm(use_running_average=not train, name="in_bn")(h)
        h = leaky_relu(h)
        h = UnetSkipConnectionBlock3d(
            self.nf0,
            min(2 * self.nf0, self.max_channels),
            depth=self.num_down - 1,
            name="unet",
        )(h, train)
        h = Conv3dSame(self.out_channels, 3, use_bias=self.outermost_linear, name="out_conv")(h)
        if not self.outermost_linear:
            h = nn.BatchNorm(use_running_average=not train, name="out_bn")(h)
            h = nn.relu(h)
        return h


class DownBlock2D(nn.Module):
    features: int
    middle_channels: Optional[int] = None
    norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.middle_channels or x.shape[-1]
        h = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = EqualizedConv2D(mid, 3, 1, 0, use_bias=not self.norm, name="prep")(h)
        if self.norm:
            h = nn.BatchNorm(use_running_average=not train, name="bn0")(h)
        h = leaky_relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = EqualizedConv2D(self.features, 4, 2, 0, use_bias=not self.norm, name="down")(h)
        if self.norm:
            h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        return leaky_relu(h)


class UpBlock2D(nn.Module):
    features: int
    norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding=[(1, 1)] * 2,
            use_bias=not self.norm, name="deconv",
        )(x)
        if self.norm:
            h = nn.BatchNorm(use_running_average=not train, name="bn0")(h)
        h = nn.relu(h)
        h = Conv2dSame(self.features, 3, use_bias=not self.norm, name="post")(h)
        if self.norm:
            h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        return nn.relu(h)


class UnetSkipConnectionBlock(nn.Module):
    outer_nc: int
    inner_nc: int
    norm: bool = True
    depth: int = 0

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = DownBlock2D(self.inner_nc, norm=self.norm, name="down")(x, train)
        if self.depth > 0:
            h = UnetSkipConnectionBlock(
                self.inner_nc, 2 * self.inner_nc, norm=self.norm, depth=self.depth - 1,
                name="sub",
            )(h, train)
        h = UpBlock2D(self.outer_nc, norm=self.norm, name="up")(h, train)
        return jnp.concatenate([x, h], axis=-1)


class Unet(nn.Module):
    """2D U-Net (``deepvoxel.py:652-734``); capability parity."""

    out_channels: int
    nf0: int
    num_down: int
    max_channels: int
    outermost_linear: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv2dSame(self.nf0, 3, use_bias=False, name="in_conv")(x)
        h = nn.BatchNorm(use_running_average=not train, name="in_bn")(h)
        h = leaky_relu(h)
        h = UnetSkipConnectionBlock(
            self.nf0, min(2 * self.nf0, self.max_channels), depth=self.num_down - 1,
            name="unet",
        )(h, train)
        h = Conv2dSame(self.out_channels, 3, use_bias=self.outermost_linear, name="out_conv")(h)
        if not self.outermost_linear:
            h = nn.BatchNorm(use_running_average=not train, name="out_bn")(h)
            h = nn.relu(h)
        return h


# ---------------------------------------------------------------------------
# occlusion networks (deepvoxel.py:445-618)
# ---------------------------------------------------------------------------


class OcclusionNetLight(nn.Module):
    """Softmax visibility over the frustum depth axis (``deepvoxel.py:497-541``)."""

    occnet_nf: int = 4

    @nn.compact
    def __call__(self, frustum, train: bool = True):
        dc = jnp.broadcast_to(
            jnp.asarray(_depth_coords()), frustum.shape[:-1] + (1,)
        ).astype(frustum.dtype)
        h = jnp.concatenate([dc, frustum], axis=-1)
        prep = Conv3dSame(self.occnet_nf, 3, use_bias=False, name="prep")(h)
        prep = nn.BatchNorm(use_running_average=not train, name="prep_bn")(prep)
        prep = leaky_relu(prep)
        feats = Conv3dSame(self.occnet_nf, 3, use_bias=False, name="net")(prep)
        feats = nn.BatchNorm(use_running_average=not train, name="net_bn")(feats)
        feats = leaky_relu(feats)
        logits = Conv3dSame(1, 3, use_bias=True, name="softmax_conv")(
            jnp.concatenate([prep, feats, dc], axis=-1)
        )
        weights = jax.nn.softmax(logits, axis=1)  # over the depth axis
        depth_map = jnp.sum(dc[..., :1] * weights, axis=1)  # (B, H, W, 1), -0.5..0.5
        return weights, depth_map


class OcclusionNet(nn.Module):
    """Full U-Net occlusion module (``deepvoxel.py:445-494``); kept for
    capability parity (never selected by the shipped driver mapping)."""

    occnet_nf: int = 4

    @nn.compact
    def __call__(self, frustum, train: bool = True):
        dc = jnp.broadcast_to(
            jnp.asarray(_depth_coords()), frustum.shape[:-1] + (1,)
        ).astype(frustum.dtype)
        h = jnp.concatenate([dc, frustum], axis=-1)
        prep = Conv3dSame(self.occnet_nf, 3, use_bias=False, name="prep")(h)
        prep = nn.BatchNorm(use_running_average=not train, name="prep_bn")(prep)
        prep = nn.relu(prep)
        num_down = 3  # min(divisibility-by-2 of 56 and 64)
        feats = Unet3d(
            self.occnet_nf, self.occnet_nf, num_down, 4 * self.occnet_nf, name="unet"
        )(prep, train)
        logits = Conv3dSame(1, 3, use_bias=True, name="softmax_conv")(
            jnp.concatenate([prep, feats, dc], axis=-1)
        )
        weights = jax.nn.softmax(logits, axis=1)
        depth_map = jnp.sum(dc[..., :1] * weights, axis=1)
        return weights, depth_map


class AccumulativeOcclusionNet(nn.Module):
    """Per-voxel density -> clipped cumulative transmittance differences
    (alpha compositing; ``deepvoxel.py:544-587``)."""

    occnet_nf: int = 4
    accumulative_threshold: float = 4.0

    @nn.compact
    def __call__(self, frustum, train: bool = True):
        dc = jnp.broadcast_to(
            jnp.asarray(_depth_coords()), frustum.shape[:-1] + (1,)
        ).astype(frustum.dtype)
        h = jnp.concatenate([dc, frustum], axis=-1)
        h = Conv3dSame(self.occnet_nf, 1, use_bias=True, name="c0")(h)
        h = leaky_relu(h)
        h = Conv3dSame(1, 1, use_bias=True, name="c1")(h)
        density = jax.nn.sigmoid(h - self.accumulative_threshold)
        # prefix sum over the depth axis as a lower-triangular matmul: the
        # reduce_window cumsum wants a depth-in-sublanes layout and XLA
        # brackets it with relayout copies of the full frustum (profiled
        # ~13 ms of reduce_window fusions + ~5 ms of copies per deepvoxels
        # step); a (D, D) triangular contraction is ~0.1 GFLOP on the MXU in
        # the natural layout. Precision.HIGHEST keeps the f32 density operand
        # out of the TPU's default bf16 multiplication passes, so this stays
        # "same math as cumsum up to f32 summation order" on device too (the
        # 0/1 tri matrix is exact in any dtype; the cost at (D, D) ~0.1 GFLOP
        # is negligible).
        d_ax = density.shape[1]
        tri = jnp.tril(jnp.ones((d_ax, d_ax), density.dtype))
        prefix = jnp.einsum(
            "ij,bjhwc->bihwc", tri, density, precision=jax.lax.Precision.HIGHEST
        )
        cumsum = jnp.clip(prefix, 0.0, 1.0)
        cumsum = jnp.concatenate(
            [jnp.zeros_like(cumsum[:, :1]), cumsum], axis=1
        )
        weights = cumsum[:, 1:] - cumsum[:, :-1]
        depth_map = jnp.sum(dc[..., :1] * weights, axis=1)
        return weights, depth_map


class RenderNetProjection(nn.Module):
    """Flatten the depth axis into channels, 1x1 convs (``deepvoxel.py:590-618``)."""

    occnet_nf: int = 32

    @nn.compact
    def __call__(self, frustum, train: bool = True):
        b, d, h, w, c = frustum.shape
        x = frustum.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
        x = EqualizedConv2D(self.occnet_nf, 1, 1, 0, name="c0")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn0")(x)
        x = leaky_relu(x)
        x = EqualizedConv2D(self.occnet_nf, 1, 1, 0, name="c1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        return leaky_relu(x)


# ---------------------------------------------------------------------------
# 3D StyleGAN voxel generator (deepvoxels_generator.py:112-188)
# ---------------------------------------------------------------------------


class SynthesisBlock3D(nn.Module):
    """3D twin of SynthesisBlock (``deepvoxels_generator.py:112-168``)."""

    ch: int
    ch_in: int
    upsample: bool = True

    @nn.compact
    def __call__(self, w, x=None, add_noise: bool = False):
        batch_size = w.shape[0]
        if self.upsample:
            assert x is not None
            h = upscale2x_3d(x)
            h = EqualizedConv3D(self.ch, 3, 1, 1, use_bias=False, name="c0")(h)
        else:
            const = self.param(
                "const", nn.initializers.ones_init(), (4, 4, 4, self.ch_in), jnp.float32
            )
            h = jnp.broadcast_to(const[None], (batch_size, 4, 4, 4, self.ch_in)).astype(w.dtype)
        if add_noise:
            h = NoiseBlock(name="n0")(h)
        b0 = self.param("b0", nn.initializers.zeros_init(), (self.ch,), jnp.float32)
        h = leaky_relu(h + b0.astype(h.dtype))
        h = AdaINBlock(self.ch, name="s0")(w, h)
        h = EqualizedConv3D(self.ch, 3, 1, 1, use_bias=False, name="c1")(h)
        if add_noise:
            h = NoiseBlock(name="n1")(h)
        b1 = self.param("b1", nn.initializers.zeros_init(), (self.ch,), jnp.float32)
        h = leaky_relu(h + b1.astype(h.dtype))
        h = AdaINBlock(self.ch, name="s1")(w, h)
        return h


class VoxelGenerator(nn.Module):
    """4^3 const -> 32^3 feature grid (``deepvoxels_generator.py:171-188``)."""

    ch: int
    ch_out: int

    @nn.compact
    def __call__(self, w):
        chans = [
            (self.ch // 4, self.ch // 4, False),
            (self.ch // 4, self.ch // 4, True),
            (self.ch // 8, self.ch // 4, True),
            (self.ch // 8, self.ch // 8, True),
        ]
        h = None
        for i, (c_out, c_in, up) in enumerate(chans):
            h = SynthesisBlock3D(c_out, c_in, upsample=up, name=f"block{i}")(w, h)
        return EqualizedConv3D(self.ch_out, 1, 1, 0, name="out")(h)


# ---------------------------------------------------------------------------
# 2D style refiner (deepvoxels_generator.py:191-222)
# ---------------------------------------------------------------------------


class RefinerStyleGenerator(nn.Module):
    """U-shaped style refiner: 64 -> 16 -> 64, skip concats, RGB out."""

    hidden_ch: int = 256

    @nn.compact
    def __call__(self, h, w):
        hc = self.hidden_ch
        h1 = leaky_relu(EqualizedConv2D(hc * 2, 4, 2, 1, name="c0")(h))
        h1 = AdaINBlock(hc * 2, name="s0")(w, h1)
        h2 = leaky_relu(EqualizedConv2D(hc * 4, 4, 2, 1, name="c1")(h1))
        h2 = AdaINBlock(hc * 4, name="s1")(w, h2)
        h3 = leaky_relu(EqualizedConv2D(hc * 4, 3, 1, 1, name="c4")(h2))
        h3 = AdaINBlock(hc * 4, name="s4")(w, h3)
        h3 = upscale2x(h3)
        h3 = leaky_relu(EqualizedConv2D(hc * 2, 3, 1, 1, name="c5")(h3))
        h3 = jnp.concatenate([AdaINBlock(hc * 2, name="s5")(w, h3), h1], axis=-1)
        h3 = upscale2x(h3)
        h3 = leaky_relu(EqualizedConv2D(hc, 3, 1, 1, name="c6")(h3))
        h3 = jnp.concatenate([AdaINBlock(hc, name="s6")(w, h3), h], axis=-1)
        return EqualizedConv2D(3, 3, 1, 1, gain=0.5, name="c7")(h3)


class BackgroundFeatureGenerator(nn.Module):
    """Camera-conditioned background features with a fixed spherical depth
    map at virtual distance 4 (``deepvoxels_generator.py:433-492``)."""

    ch: int = 512
    out_ch: int = NUM_GRID_FEATS
    enable_blur: bool = False

    IMG_SIZE = 64
    BACKGROUND_DEPTH = 4.0

    def setup(self):
        chans = [
            (self.ch, self.ch, False),
            (self.ch, self.ch, True),
            (self.ch, self.ch, True),
            (self.ch, self.ch, True),
            (self.ch // 2, self.ch, True),
        ]
        self.blocks = [
            SynthesisBlock(c, c_in, upsample=up, enable_blur=self.enable_blur, name=f"block{i}")
            for i, (c, c_in, up) in enumerate(chans)
        ]
        self.conv = EqualizedConv2D(self.out_ch, 1, 1, 0, gain=1.0, name="conv")
        self.l1 = EqualizedLinear(self.ch, name="l1")
        self.l2 = EqualizedLinear(self.ch, name="l2")

    def rotate_w(self, w, theta):
        h = jnp.concatenate([w, theta * 16], axis=1)
        h = leaky_relu(self.l1(h))
        return leaky_relu(self.l2(h))

    def __call__(self, w, w2, theta):
        h = None
        for i, block in enumerate(self.blocks):
            if i == 3:
                w = w2
            _w = self.rotate_w(w, theta) if i < 2 else w
            h = block(_w, x=h, add_noise=False)
        h = self.conv(h)
        s = self.IMG_SIZE
        xs, ys = np.meshgrid(np.arange(s) - s // 2, np.arange(s) - s // 2)
        depth_map = self.BACKGROUND_DEPTH * s * 2 / np.sqrt((s * 2) ** 2 + xs**2 + ys**2)
        depth = jnp.broadcast_to(
            jnp.asarray(depth_map, dtype=h.dtype)[None, :, :, None],
            (w.shape[0], s, s, 1),
        )
        return h, depth


# ---------------------------------------------------------------------------
# top-level generator (deepvoxels_generator.py:225-323)
# ---------------------------------------------------------------------------


def deepvoxels_make_hidden(key: jax.Array, batch_size: int, ch: int) -> jnp.ndarray:
    """Plain N(0,1) latent — the updater draws via ``gen.mapping.make_hidden``
    (``updater_deepvoxels.py:119-121``, unnormalised)."""
    return jax.random.normal(key, (batch_size, ch), dtype=jnp.float32)


class DeepVoxelsGenerator(nn.Module):
    """Voxel-volume renderer generator producing 64x64 RGBD.

    ``compute_dtype=jnp.bfloat16`` runs the 3D voxel stack and the 2D style
    refiner on bf16 MXU passes; the frustum lift, occlusion reasoning and
    depth decode stay f32 (geometry fidelity)."""

    ch: int
    occlusion_type: str = "deepvoxels"
    background_generator: bool = False
    accumulative_threshold: float = 4.0
    exact_lifting: bool = True
    lift_mode: str = "gather"  # 'pallas': VMEM trilinear kernel (TPU only)
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.mapping = MappingNetwork(self.ch)
        self.voxel_gen = VoxelGenerator(self.ch, NUM_GRID_FEATS)
        if self.occlusion_type == "deepvoxels":
            self.occlusion_net = OcclusionNetLight()
        elif self.occlusion_type == "accumulative":
            self.occlusion_net = AccumulativeOcclusionNet(
                accumulative_threshold=self.accumulative_threshold
            )
        elif self.occlusion_type == "rendernet":
            self.occlusion_net = RenderNetProjection()
        elif self.occlusion_type == "occlusion_unet":
            self.occlusion_net = OcclusionNet()
        else:
            raise ValueError(f"unknown occlusion_type {self.occlusion_type!r}")
        self.style_generator = RefinerStyleGenerator()
        self.camera_param_generator = CameraParamGenerator()
        if self.background_generator:
            self.background_gen = BackgroundFeatureGenerator(self.ch, NUM_GRID_FEATS)
        self.frustum_coords = jnp.asarray(frustum_camera_coords(self.exact_lifting))

    def __call__(
        self,
        z: jnp.ndarray,
        camera_matrices: jnp.ndarray,
        z2: jnp.ndarray,
        theta: Optional[jnp.ndarray] = None,
        z3: Optional[jnp.ndarray] = None,
        z4: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        z = z.reshape(z.shape[0], -1)
        z2 = z2.reshape(z2.shape[0], -1)
        w = self.mapping(z)
        if self.compute_dtype is not None:
            w = w.astype(self.compute_dtype)
        voxel = self.voxel_gen(w).astype(jnp.float32)  # (B, 32, 32, 32, feats)
        frustum = lift_frustum(
            voxel, camera_matrices, self.frustum_coords, lift_mode=self.lift_mode
        )

        if self.occlusion_type == "rendernet":
            novel_feats = self.occlusion_net(frustum, train=train)
            depth = jnp.ones(novel_feats.shape[:3] + (1,), novel_feats.dtype)
        else:
            weights, depth_norm = self.occlusion_net(frustum, train=train)
            novel_feats = jnp.sum(weights * frustum, axis=1)  # (B, H, W, C)
            depth = decode_depth(depth_norm)
            if self.background_generator:
                foreground_weight = jnp.sum(weights, axis=1)
                w3 = self.mapping(z3.reshape(z3.shape[0], -1))
                w4 = self.mapping(z4.reshape(z4.shape[0], -1))
                background, background_depth = self.background_gen(w3, w4, theta)
                novel_feats = l2_normalize_channels(novel_feats) + l2_normalize_channels(
                    background
                ) * (1.0 - foreground_weight)
                depth = depth + background_depth * (1.0 - foreground_weight)

        w2 = self.mapping(z2)
        if self.compute_dtype is not None:
            w2 = w2.astype(self.compute_dtype)
            novel_feats = novel_feats.astype(self.compute_dtype)
        novel_img = self.style_generator(novel_feats, w2).astype(jnp.float32)
        return jnp.concatenate([novel_img, depth.astype(jnp.float32)], axis=-1)

    def init_all(self, z, camera_matrices, z2, theta=None):
        out = self(z, camera_matrices, z2, theta, z3=z, z4=z2)
        # touch the auxiliary camera-param head for checkpoint parity
        self.camera_param_generator(jnp.zeros((z.shape[0], 8), z.dtype))
        return out


class DeepVoxelsDiscriminator(nn.Module):
    """Fixed 64px, non-progressive 5-block discriminator
    (``deepvoxels_generator.py:387-430``). NOTE: the shipped driver actually
    uses the progressive ``net.Discriminator`` for deepvoxels runs too
    (``train_rgbd.py:249-258``); this class mirrors the reference's declared
    alternative for capability parity."""

    ch: int = 512
    enable_blur: bool = False

    @nn.compact
    def __call__(self, x):
        from .discriminator import DiscriminatorBlock, DiscriminatorBlockBase

        h = leaky_relu(EqualizedConv2D(self.ch // 2, 1, 1, 0, name="in0")(x))
        chans = [(self.ch // 2, self.ch), (self.ch, self.ch), (self.ch, self.ch), (self.ch, self.ch)]
        for i, (c_in, c_out) in reversed(list(enumerate(chans))):
            h = DiscriminatorBlock(
                c_in, c_out, enable_blur=self.enable_blur, res=True, name=f"block{i + 1}"
            )(h)
        return DiscriminatorBlockBase(self.ch, 1, name="block0")(h)


def _resolve_lift_mode(requested, z_rotate: float = 0.0) -> str:
    """Default on TPU: the VMEM-resident Pallas lift (measured 4.1x on the
    whole production step: 999.8 -> 245.5 ms/step, batch 10 @ 64px ch=256
    on a v5e), windowed ('pallas_win', half the MXU MACs) when the camera
    prior proves the span invariant. 'pallas*' needs a real TPU (Mosaic);
    CPU runs and an explicit ``lift_mode: gather`` use the exact-arithmetic
    XLA gather.

    The windowed kernel drops contributions outside each tile's
    LIFT_WINDOW-plane grid-dim1 window, which is exact iff every valid
    point's dim1 indices fit the window per tile. Two live conditions gate
    it (both re-derived from the current constants, not hardcoded analysis):
    ``z_rotate == 0`` (a z-rotation couples the 64-col frustum-u reach into
    dim1, breaking the bound for EVERY camera draw — ``geometry/prior.py``
    scales U(-1,1) by the per-axis range), and
    :func:`lift_window_span_bound` + 3 planes (floor straddle, +1 corner,
    one margin) fitting ``LIFT_WINDOW`` — so editing the geometry constants
    or kernel tile size flips the gate instead of silently zeroing valid
    contributions. Failing either falls back to the full-width kernel."""
    from ..ops.bilinear_pallas import pallas_available

    windowable = (
        float(z_rotate or 0.0) == 0.0
        and lift_window_span_bound() + 3.0 <= LIFT_WINDOW
    )
    if requested and str(requested).startswith("pallas"):
        if not pallas_available():
            return "gather"
        req = str(requested)
        if req.startswith("pallas_win") and not windowable:
            raise ValueError(
                "lift_mode 'pallas_win*' requires z_rotate == 0 and a per-tile "
                "grid-dim1 span bound that fits LIFT_WINDOW "
                f"(span bound {lift_window_span_bound():.2f} + 3 margin vs "
                f"window {LIFT_WINDOW}); the windowed kernel would silently "
                "zero out-of-window contributions otherwise"
            )
        return req
    if not requested:
        if not pallas_available():
            return "gather"
        return "pallas_win" if windowable else "pallas"
    return str(requested)


def build_deepvoxels_generator(config):
    """Driver factory (``train_rgbd.py:233-243`` occlusion-type mapping)."""
    if config.rendernet_projection:
        occlusion_type = "rendernet"
    elif config.occlusion_type:
        occlusion_type = config.occlusion_type
    else:
        occlusion_type = "deepvoxels"
    gen = DeepVoxelsGenerator(
        config.ch,
        occlusion_type=occlusion_type,
        background_generator=bool(config.background_generator),
        accumulative_threshold=(
            config.accumulative_threshold if config.accumulative_threshold else 4.0
        ),
        lift_mode=_resolve_lift_mode(config.lift_mode, config.z_rotate),
        compute_dtype=jnp.bfloat16 if config.mixed16 else None,
    )
    make_hidden = lambda key, n: deepvoxels_make_hidden(key, n, config.ch)
    return gen, make_hidden
