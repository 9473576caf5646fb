"""VMEM-resident Pallas trilinear lift vs the XLA gather lift (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.geometry.camera import camera_matrices
from rgbd_gan_tpu.models.deepvoxels import (
    GRID_DIM,
    frustum_camera_coords,
    lift_frustum,
)
from rgbd_gan_tpu.ops.trilinear_pallas import trilinear_lift_pallas

VOXEL_SIZE_LOCAL = None  # constants come from the deepvoxels module


def _corner_inputs(cam2world, coords_const):
    from rgbd_gan_tpu.models.deepvoxels import VOXEL_SIZE

    grid_coords = jnp.einsum("bij,jn->bin", cam2world, coords_const)
    vox = grid_coords[:, :3] / VOXEL_SIZE + GRID_DIM / 2
    in_bounds = jnp.all(vox >= 0, axis=1) & jnp.all(vox < GRID_DIM, axis=1)
    return vox, in_bounds


class TestTrilinearPallas:
    @pytest.mark.parametrize("theta_y", [0.0, 0.9, 2.4])
    def test_matches_gather_lift(self, theta_y):
        rng = np.random.RandomState(0)
        b, c = 2, 4
        voxel = jnp.asarray(rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f"))
        mats = camera_matrices(jnp.zeros((b, 6)).at[:, 1].set(theta_y))
        coords = jnp.asarray(frustum_camera_coords())

        ref = lift_frustum(voxel, mats, coords)  # (B, D, H, W, C)
        n = coords.shape[1]
        vox, ib = _corner_inputs(mats, coords)
        # subsample a tile-aligned prefix to keep interpret mode fast
        n_sub = 128 * 16
        ours = trilinear_lift_pallas(
            voxel, vox[:, :, :n_sub], ib[:, :n_sub], interpret=True
        )
        ref_flat = ref.reshape(b, n, c)[:, :n_sub]
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref_flat), atol=2e-5)

    def test_out_of_bounds_zero(self):
        rng = np.random.RandomState(1)
        voxel = jnp.asarray(rng.rand(1, GRID_DIM, GRID_DIM, GRID_DIM, 2).astype("f"))
        # all points far outside the grid (one full point tile)
        from rgbd_gan_tpu.ops.trilinear_pallas import TILE_N

        vox = jnp.full((1, 3, TILE_N), -7.0)
        ib = jnp.zeros((1, TILE_N), bool)
        out = trilinear_lift_pallas(voxel, vox, ib, interpret=True)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_grad_all_masked_tile_is_zero(self):
        """A fully out-of-frustum point tile must produce an exactly-zero dV
        (the backward kernel SKIPS the MXU contraction for such tiles — and
        the first grid step's zero-init must still land)."""
        from rgbd_gan_tpu.ops.trilinear_pallas import TILE_N, trilinear_lift

        rng = np.random.RandomState(3)
        b, c = 1, 4
        voxel = jnp.asarray(rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f"))
        vox = jnp.full((b, 3, TILE_N), -7.0)
        ib = jnp.zeros((b, TILE_N), bool)
        cot = jnp.asarray(rng.rand(b, TILE_N, c).astype("f"))
        dv = jax.grad(lambda v: jnp.sum(trilinear_lift(v, vox, ib, True) * cot))(voxel)
        np.testing.assert_allclose(np.asarray(dv), 0.0)

    def test_grad_mixed_masked_and_valid_tiles(self):
        """Masked tile first, valid tile second: the skipped first tile must
        not clobber the second tile's accumulation (zero-init ordering)."""
        from rgbd_gan_tpu.ops.trilinear_pallas import TILE_N, trilinear_lift

        rng = np.random.RandomState(4)
        b, c = 1, 4
        voxel = jnp.asarray(rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f"))
        vox_valid = jnp.asarray(
            rng.uniform(0.5, GRID_DIM - 1.5, size=(b, 3, TILE_N)).astype("f")
        )
        vox = jnp.concatenate([jnp.full((b, 3, TILE_N), -7.0), vox_valid], axis=2)
        ib = jnp.concatenate(
            [jnp.zeros((b, TILE_N), bool), jnp.ones((b, TILE_N), bool)], axis=1
        )
        cot = jnp.asarray(rng.rand(b, 2 * TILE_N, c).astype("f"))

        dv = jax.grad(lambda v: jnp.sum(trilinear_lift(v, vox, ib, True) * cot))(voxel)
        # reference: only the valid tile contributes
        dv_ref = jax.grad(
            lambda v: jnp.sum(
                trilinear_lift(v, vox_valid, ib[:, TILE_N:], True) * cot[:, TILE_N:]
            )
        )(voxel)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=3e-5)

    def test_grad_matches_gather_lift(self):
        """Custom-VJP dV == autodiff of the dense gather lift (interpret)."""
        from rgbd_gan_tpu.ops.trilinear_pallas import TILE_N, trilinear_lift

        rng = np.random.RandomState(2)
        b, c = 2, 4
        voxel = jnp.asarray(rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f"))
        mats = camera_matrices(jnp.zeros((b, 6)).at[:, 1].set(0.7))
        coords = jnp.asarray(frustum_camera_coords())
        n_sub = TILE_N * 2
        vox, ib = _corner_inputs(mats, coords)
        vox, ib = vox[:, :, :n_sub], ib[:, :n_sub]
        cot = jnp.asarray(rng.rand(b, n_sub, c).astype("f"))

        def ours(v):
            return jnp.sum(trilinear_lift(v, vox, ib, True) * cot)

        def ref(v):
            n = coords.shape[1]
            full = lift_frustum(v, mats, coords).reshape(b, n, c)[:, :n_sub]
            return jnp.sum(full * cot)

        g_ours = jax.grad(ours)(voxel)
        g_ref = jax.grad(ref)(voxel)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=3e-5)

    def test_bf16_operand_mode_close(self):
        """bf16 operands / f32 accumulation (the production lift_mode='pallas'
        setting — the f32 working set exceeds scoped VMEM at c=32)."""
        import jax

        from rgbd_gan_tpu.ops.trilinear_pallas import TILE_N, trilinear_lift

        rng = np.random.RandomState(5)
        b, c = 1, 8
        voxel = jnp.asarray(rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f"))
        mats = camera_matrices(jnp.zeros((b, 6)).at[:, 1].set(0.4))
        coords = jnp.asarray(frustum_camera_coords())
        vox, ib = _corner_inputs(mats, coords)
        vox, ib = vox[:, :, :TILE_N], ib[:, :TILE_N]

        exact = trilinear_lift(voxel, vox, ib, True)
        bf16 = trilinear_lift(voxel, vox, ib, True, jnp.bfloat16)
        assert bf16.dtype == jnp.float32
        err = np.abs(np.asarray(bf16) - np.asarray(exact)).max()
        assert err < 0.03, err  # bf16 operand rounding only

        cot = jnp.asarray(rng.rand(b, TILE_N, c).astype("f"))
        g_ex = jax.grad(lambda v: jnp.sum(trilinear_lift(v, vox, ib, True) * cot))(voxel)
        g_bf = jax.grad(
            lambda v: jnp.sum(trilinear_lift(v, vox, ib, True, jnp.bfloat16) * cot)
        )(voxel)
        gerr = np.abs(np.asarray(g_bf) - np.asarray(g_ex)).max()
        assert gerr < 0.05, gerr

    def test_grad_chunked_columns_c32(self):
        """c=32 triggers the backward's (d2, c) column chunking (the unsplit
        working set overflows scoped VMEM on device) — parity vs autodiff of
        the gather lift at one point tile."""
        import jax

        from rgbd_gan_tpu.ops.trilinear_pallas import TILE_N, trilinear_lift

        rng = np.random.RandomState(9)
        b, c = 1, 32
        voxel = jnp.asarray(rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f"))
        mats = camera_matrices(jnp.zeros((b, 6)).at[:, 1].set(0.9))
        coords = jnp.asarray(frustum_camera_coords())
        vox, ib = _corner_inputs(mats, coords)
        vox, ib = vox[:, :, :TILE_N], ib[:, :TILE_N]
        cot = jnp.asarray(rng.rand(b, TILE_N, c).astype("f"))

        def ours(v):
            return jnp.sum(trilinear_lift(v, vox, ib, True) * cot)

        def ref(v):
            n = coords.shape[1]
            full = lift_frustum(v, mats, coords).reshape(b, n, c)[:, :TILE_N]
            return jnp.sum(full * cot)

        g_ours = jax.grad(ours)(voxel)
        g_ref = jax.grad(ref)(voxel)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=3e-5)


class TestWindowedLift:
    """The 'pallas_win' variants: per-tile dynamic d1 windows (half the MXU
    MACs). Windowing must be EXACT under the span invariant (z_rotate == 0),
    so f32 windowed vs the gather lift is a strict allclose."""

    # mid-frustum tile-aligned slice: depth planes that actually intersect
    # the grid (4 tiles per 64x64 plane; planes ~17-49 cross the cube, so
    # tiles 80+ sit at plane 20, zc ~0.78 — well inside)
    def _slice(self, vox, ib, k0=80, m=4):
        from rgbd_gan_tpu.ops.trilinear_pallas import TILE_N

        s = slice(k0 * TILE_N, (k0 + m) * TILE_N)
        return vox[:, :, s], ib[:, s], s

    @pytest.mark.parametrize(
        "theta",
        [
            (0.0, 0.0),          # identity
            (0.3054, 3.1415),    # production prior extremes (x, y rotate)
            (-0.3054, -3.1415),
            (0.3054, 1.5708),    # worst-case z-span orientation
        ],
    )
    def test_fwd_matches_gather_exact(self, theta):
        from rgbd_gan_tpu.ops.trilinear_pallas import trilinear_lift

        rng = np.random.RandomState(11)
        b, c = 1, 4
        voxel = jnp.asarray(rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f"))
        th = jnp.zeros((b, 6)).at[:, 0].set(theta[0]).at[:, 1].set(theta[1])
        mats = camera_matrices(th)
        coords = jnp.asarray(frustum_camera_coords())
        n = coords.shape[1]
        vox, ib = _corner_inputs(mats, coords)
        vox_s, ib_s, s = self._slice(vox, ib)
        assert bool(ib_s.any()), "slice must contain in-frustum points"

        ref = lift_frustum(voxel, mats, coords).reshape(b, n, c)[:, s]
        win = trilinear_lift(voxel, vox_s, ib_s, True, None, 16)
        np.testing.assert_allclose(np.asarray(win), np.asarray(ref), atol=2e-5)

    def test_grad_matches_gather_exact(self):
        from rgbd_gan_tpu.ops.trilinear_pallas import trilinear_lift

        rng = np.random.RandomState(12)
        b, c = 1, 4
        voxel = jnp.asarray(rng.rand(b, GRID_DIM, GRID_DIM, GRID_DIM, c).astype("f"))
        th = jnp.zeros((b, 6)).at[:, 0].set(0.3054).at[:, 1].set(2.2)
        mats = camera_matrices(th)
        coords = jnp.asarray(frustum_camera_coords())
        n = coords.shape[1]
        vox, ib = _corner_inputs(mats, coords)
        vox_s, ib_s, s = self._slice(vox, ib)
        assert bool(ib_s.any()), "slice must contain in-frustum points"
        cot = jnp.asarray(rng.rand(b, vox_s.shape[2], c).astype("f"))

        def ours(v):
            return jnp.sum(trilinear_lift(v, vox_s, ib_s, True, None, 16) * cot)

        def ref(v):
            full = lift_frustum(v, mats, coords).reshape(b, n, c)[:, s]
            return jnp.sum(full * cot)

        g_ours = jax.grad(ours)(voxel)
        g_ref = jax.grad(ref)(voxel)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=3e-5)

    def test_span_invariant_over_production_prior(self):
        """The windowed kernel's correctness precondition, checked over many
        random cameras from the deepvoxels production prior (z_rotate = 0):
        every 1024-point tile's valid grid-dim1 integer span (incl. the +1
        corner) must fit LIFT_WINDOW with margin."""
        from rgbd_gan_tpu.models.deepvoxels import LIFT_WINDOW, VOXEL_SIZE
        from rgbd_gan_tpu.ops.trilinear_pallas import TILE_N

        rng = np.random.RandomState(13)
        coords = np.asarray(frustum_camera_coords())
        n = coords.shape[1]
        worst = 0
        for _ in range(32):
            th = rng.uniform(-1, 1, 6) * np.array([0.3054, 3.1415, 0, 0, 0, 0])
            m = np.asarray(camera_matrices(jnp.asarray(th)[None]))[0]
            vox = (m @ coords)[:3] / VOXEL_SIZE + GRID_DIM / 2
            ib = np.all(vox >= 0, axis=0) & np.all(vox < GRID_DIM, axis=0)
            y0 = np.clip(vox[1].astype(np.int64), 0, GRID_DIM - 1)
            for t in range(n // TILE_N):
                s = slice(t * TILE_N, (t + 1) * TILE_N)
                v = ib[s]
                if not v.any():
                    continue
                span = int(y0[s][v].max() - y0[s][v].min()) + 2  # +1 corner
                worst = max(worst, span)
        assert worst <= LIFT_WINDOW - 2, worst  # >= 2 planes of margin

    def test_resolver_gates_on_z_rotate(self):
        from rgbd_gan_tpu.models.deepvoxels import _resolve_lift_mode
        from rgbd_gan_tpu.ops.bilinear_pallas import pallas_available

        if pallas_available():
            assert _resolve_lift_mode(None, 0.0) == "pallas_win"
            assert _resolve_lift_mode(None, 0.5) == "pallas"
            assert _resolve_lift_mode("pallas", 0.5) == "pallas"
            with pytest.raises(ValueError, match="z_rotate"):
                _resolve_lift_mode("pallas_win", 0.5)
        assert _resolve_lift_mode("gather", 0.5) == "gather"

    def test_span_bound_derived_from_live_constants(self, monkeypatch):
        """The pallas_win gate re-derives its span bound from the live
        geometry constants — editing them must FLIP the gate, never silently
        zero valid contributions (VERDICT r4 #4)."""
        import rgbd_gan_tpu.models.deepvoxels as dv
        import rgbd_gan_tpu.ops.bilinear_pallas as bp
        import rgbd_gan_tpu.ops.trilinear_pallas as tp

        # as shipped: bound ~10.0, fits the 16-plane window with 3 of margin
        base = dv.lift_window_span_bound()
        assert base + 3.0 <= dv.LIFT_WINDOW
        # the bound matches the brute-force worst case measured by
        # test_span_invariant_over_production_prior (float span >= int span-2)
        assert base == (tp.TILE_N - 1) / dv.PROJ_DIM * (
            dv.NEAR_PLANE + (dv.FRUSTUM_DEPTH - 1) * dv.VOXEL_SIZE
        ) / (dv.FOCAL * dv.VOXEL_SIZE)

        # pretend the kernel is available so the resolver reaches the gate
        monkeypatch.setattr(bp, "pallas_available", lambda: True)

        # a shorter focal (wider FoV) stretches the per-tile grid reach:
        # the default must fall back to the full-width kernel and an
        # explicit pallas_win request must refuse
        monkeypatch.setattr(dv, "FOCAL", dv.FOCAL / 4.0)
        assert dv.lift_window_span_bound() > base
        assert dv._resolve_lift_mode(None, 0.0) == "pallas"
        with pytest.raises(ValueError, match="span bound"):
            dv._resolve_lift_mode("pallas_win", 0.0)
        monkeypatch.undo()
        monkeypatch.setattr(bp, "pallas_available", lambda: True)

        # a tile size that straddles depth planes voids the analysis entirely
        monkeypatch.setattr(tp, "TILE_N", 1000)
        assert dv.lift_window_span_bound() == float("inf")
        assert dv._resolve_lift_mode(None, 0.0) == "pallas"
        monkeypatch.undo()

        # the shipped constants still pass after the perturbations
        assert dv.lift_window_span_bound() == base
