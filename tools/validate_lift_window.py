#!/usr/bin/env python3
"""On-device validation of the windowed trilinear lift ('pallas_win').

Runs on the attached TPU (Mosaic compile, not interpret mode):

1. forward parity: pallas_win vs the exact XLA gather lift and vs the
   full-width pallas kernel, f32 and bf16 operands, over cameras drawn from
   the production deepvoxels prior (incl. the extreme corners of the ranges);
2. gradient parity: custom-VJP dV windowed vs full-width;
3. a quick per-application timing of full vs windowed (fwd and fwd+bwd).

Usage: python tools/validate_lift_window.py [n_cameras]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rgbd_gan_tpu.models.deepvoxels import (  # noqa: E402
    GRID_DIM,
    NUM_GRID_FEATS,
    frustum_camera_coords,
    frustum_voxel_coords,
    lift_frustum,
)
from rgbd_gan_tpu.geometry.camera import camera_matrices  # noqa: E402
from rgbd_gan_tpu.ops.trilinear_pallas import trilinear_lift  # noqa: E402


def main():
    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rng = np.random.RandomState(0)
    b, c = 2, NUM_GRID_FEATS
    coords = jnp.asarray(frustum_camera_coords())
    voxel = jnp.asarray(
        rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f") - 0.5
    )
    ranges = np.array([0.3054, 3.1415, 0, 0, 0, 0])
    thetas = [rng.uniform(-1, 1, (b, 6)) * ranges for _ in range(n_cams - 2)]
    thetas.append(np.tile(ranges, (b, 1)))        # corner +
    thetas.append(np.tile(-ranges, (b, 1)))       # corner -

    f_full = jax.jit(lambda v, m: lift_frustum(v, m, coords, lift_mode="pallas"))
    f_win = jax.jit(lambda v, m: lift_frustum(v, m, coords, lift_mode="pallas_win"))
    f_gather = jax.jit(lambda v, m: lift_frustum(v, m, coords, lift_mode="gather"))

    def loss(mode):
        def fn(v, m):
            return jnp.sum(lift_frustum(v, m, coords, lift_mode=mode) ** 2)
        return jax.jit(jax.grad(fn))

    g_full, g_win, g_gather = loss("pallas"), loss("pallas_win"), loss("gather")

    # The windowed kernel contracts d1-major where the full kernel is
    # d0-major: the 4 bilinear terms accumulate in a different order in f32
    # and the intermediate bf16 re-cast (t.astype(dtype) before the d2
    # collapse) then rounds differently — a 1-2 bf16-ulp (2^-10) fwd delta is
    # EXPECTED, not a defect. The production criterion is therefore: the
    # windowed kernel must sit inside the same bf16 envelope vs the *exact*
    # f32 gather route as the device-proven full kernel does.
    worst_full_e = worst_win_e = worst_gfull_e = worst_gwin_e = 0.0
    for i, th in enumerate(thetas):
        mats = camera_matrices(jnp.asarray(th, jnp.float32))
        a = np.asarray(jax.device_get(f_full(voxel, mats)))
        w = np.asarray(jax.device_get(f_win(voxel, mats)))
        e = np.asarray(jax.device_get(f_gather(voxel, mats)))
        full_e = float(np.abs(a - e).max())
        win_e = float(np.abs(w - e).max())
        worst_full_e = max(worst_full_e, full_e)
        worst_win_e = max(worst_win_e, win_e)
        da = np.asarray(jax.device_get(g_full(voxel, mats)))
        dw = np.asarray(jax.device_get(g_win(voxel, mats)))
        de = np.asarray(jax.device_get(g_gather(voxel, mats)))
        gfull_e = float(np.abs(da - de).max())
        gwin_e = float(np.abs(dw - de).max())
        worst_gfull_e = max(worst_gfull_e, gfull_e)
        worst_gwin_e = max(worst_gwin_e, gwin_e)
        print(f"cam {i}: fwd full-vs-exact={full_e:.3e} win-vs-exact={win_e:.3e} "
              f"grad full-vs-exact={gfull_e:.3e} win-vs-exact={gwin_e:.3e}",
              flush=True)

    assert worst_win_e <= 1.5 * worst_full_e + 2e-3, (worst_win_e, worst_full_e)
    assert worst_gwin_e <= 1.5 * worst_gfull_e + 2e-2, (worst_gwin_e, worst_gfull_e)
    print(f"PARITY OK  fwd-vs-exact full {worst_full_e:.2e} win {worst_win_e:.2e}; "
          f"grad-vs-exact full {worst_gfull_e:.2e} win {worst_gwin_e:.2e}")

    # timing: chain applications, fetch once (tunnel-safe)
    mats = camera_matrices(jnp.asarray(thetas[0], jnp.float32))
    for name, fn in [("fwd full", f_full), ("fwd win", f_win),
                     ("grad full", g_full), ("grad win", g_win)]:
        for _ in range(2):  # warmup incl. tunnel first-measure inflation
            float(jax.device_get(jnp.sum(fn(voxel, mats))))
        t0 = time.perf_counter()
        iters = 10
        acc = voxel
        out = None
        for _ in range(iters):
            out = fn(acc, mats)
            acc = acc + jnp.sum(out) * 0.0  # chain: step N depends on N-1
        s = float(jax.device_get(jnp.sum(out)))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name}: {dt:.2f} ms/app (batch {b}, c={c}) [{s:.3f}]", flush=True)


if __name__ == "__main__":
    main()
