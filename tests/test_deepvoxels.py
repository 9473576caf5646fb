import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.geometry.camera import camera_matrices
from rgbd_gan_tpu.models.deepvoxels import (
    FRUSTUM_DEPTH,
    GRID_DIM,
    NEAR_PLANE,
    PROJ_DIM,
    VOXEL_SIZE,
    AccumulativeOcclusionNet,
    DeepVoxelsGenerator,
    OcclusionNetLight,
    RenderNetProjection,
    VoxelGenerator,
    decode_depth,
    deepvoxels_make_hidden,
    frustum_camera_coords,
    lift_frustum,
)

CH = 32
B = 2


class TestFrustumGeometry:
    def test_constants(self):
        assert GRID_DIM == 32
        assert PROJ_DIM == 64
        assert FRUSTUM_DEPTH == 56  # ceil(sqrt(3) * 32)
        assert VOXEL_SIZE == pytest.approx((1 / 32) * 1.1 * 0.5)

    def test_coords_shape_and_layout(self):
        c = frustum_camera_coords()
        assert c.shape == (4, PROJ_DIM * PROJ_DIM * FRUSTUM_DEPTH)
        np.testing.assert_allclose(c[3], 1.0)
        # first cell: pixel (0,0), depth plane 0 -> z = near_plane
        assert c[2, 0] == pytest.approx(NEAR_PLANE)
        # depth-major layout: one full image per z plane
        assert c[2, PROJ_DIM * PROJ_DIM] == pytest.approx(NEAR_PLANE + VOXEL_SIZE)

    def test_exact_lifting_quirk(self):
        exact = frustum_camera_coords(exact_lifting=True)
        fixed = frustum_camera_coords(exact_lifting=False)
        # the float-division quirk skews y by +x/64
        assert not np.allclose(exact[1], fixed[1])
        np.testing.assert_allclose(exact[0], fixed[0])

    def test_lift_identity_camera_center_ray(self):
        # a constant voxel grid lifts to a frustum that is constant inside
        # the grid and zero outside
        voxel = jnp.ones((1, GRID_DIM, GRID_DIM, GRID_DIM, 2))
        mats = camera_matrices(jnp.zeros((1, 6)))
        coords = jnp.asarray(frustum_camera_coords())
        frustum = lift_frustum(voxel, mats, coords)
        assert frustum.shape == (1, FRUSTUM_DEPTH, PROJ_DIM, PROJ_DIM, 2)
        vals = np.asarray(frustum)
        assert set(np.round(np.unique(vals), 4)).issubset({0.0, 1.0})
        assert 0.05 < (vals > 0.5).mean() < 0.9  # frustum intersects the grid

    def test_lift_is_differentiable_wrt_voxel(self):
        voxel = jnp.ones((1, GRID_DIM, GRID_DIM, GRID_DIM, 1))
        mats = camera_matrices(jnp.zeros((1, 6)))
        coords = jnp.asarray(frustum_camera_coords())
        g = jax.grad(lambda v: jnp.sum(lift_frustum(v, mats, coords)))(voxel)
        assert np.any(np.asarray(g) != 0)

    def test_rotated_camera_changes_frustum(self):
        rng = np.random.RandomState(0)
        voxel = jnp.asarray(rng.rand(1, GRID_DIM, GRID_DIM, GRID_DIM, 1).astype("f"))
        coords = jnp.asarray(frustum_camera_coords())
        m0 = camera_matrices(jnp.zeros((1, 6)))
        m1 = camera_matrices(jnp.zeros((1, 6)).at[:, 1].set(1.0))
        f0 = lift_frustum(voxel, m0, coords)
        f1 = lift_frustum(voxel, m1, coords)
        assert float(jnp.abs(f0 - f1).max()) > 1e-3

    def test_decode_depth_range(self):
        lo = decode_depth(jnp.float32(-0.5))
        hi = decode_depth(jnp.float32(0.5))
        assert float(lo) == pytest.approx(NEAR_PLANE)
        assert float(hi) == pytest.approx(NEAR_PLANE + FRUSTUM_DEPTH * VOXEL_SIZE)


class TestOcclusionNets:
    def _frustum(self, c=8):
        return jax.random.uniform(
            jax.random.PRNGKey(0), (B, FRUSTUM_DEPTH, 8, 8, c)
        )

    def test_light_weights_sum_to_one(self):
        net = OcclusionNetLight()
        f = self._frustum()
        variables = net.init(jax.random.PRNGKey(1), f)
        (w, d), _ = net.apply(variables, f, mutable=["batch_stats"])
        assert w.shape == (B, FRUSTUM_DEPTH, 8, 8, 1)
        np.testing.assert_allclose(np.asarray(w.sum(axis=1)), 1.0, rtol=1e-4)
        assert d.shape == (B, 8, 8, 1)
        assert np.all(np.abs(np.asarray(d)) <= 0.5)

    def test_accumulative_weights_bounded(self):
        net = AccumulativeOcclusionNet()
        f = self._frustum()
        variables = net.init(jax.random.PRNGKey(1), f)
        w, d = net.apply(variables, f)
        wsum = np.asarray(w.sum(axis=1))
        assert np.all(wsum <= 1.0 + 1e-5)  # clipped transmittance
        assert np.all(np.asarray(w) >= -1e-6)

    def test_rendernet_projection(self):
        net = RenderNetProjection()
        f = self._frustum()
        variables = net.init(jax.random.PRNGKey(1), f)
        out, _ = net.apply(variables, f, mutable=["batch_stats"])
        assert out.shape == (B, 8, 8, 32)


class TestVoxelGenerator:
    def test_grid_shape(self):
        gen = VoxelGenerator(CH, 16)
        w = jnp.ones((B, CH))
        params = gen.init(jax.random.PRNGKey(0), w)
        voxel = gen.apply(params, w)
        assert voxel.shape == (B, 32, 32, 32, 16)


class TestDeepVoxelsGenerator:
    @pytest.mark.parametrize("occlusion_type", ["deepvoxels", "accumulative"])
    def test_full_forward(self, occlusion_type):
        gen = DeepVoxelsGenerator(CH, occlusion_type=occlusion_type)
        z = deepvoxels_make_hidden(jax.random.PRNGKey(0), B, CH)
        z2 = deepvoxels_make_hidden(jax.random.PRNGKey(1), B, CH)
        mats = camera_matrices(jnp.zeros((B, 6)))
        variables = gen.init(jax.random.PRNGKey(2), z, mats, z2, method=gen.init_all)
        out, _ = gen.apply(variables, z, mats, z2, mutable=["batch_stats"])
        assert out.shape == (B, 64, 64, 4)
        assert np.all(np.isfinite(np.asarray(out)))
        depth = np.asarray(out[..., -1])
        # decoded depth stays in the frustum's metric range
        assert depth.min() >= NEAR_PLANE - 1e-4
        assert depth.max() <= NEAR_PLANE + FRUSTUM_DEPTH * VOXEL_SIZE + 1e-4

    def test_background_generator_path(self):
        gen = DeepVoxelsGenerator(CH, background_generator=True)
        z = deepvoxels_make_hidden(jax.random.PRNGKey(0), B, CH)
        z2 = deepvoxels_make_hidden(jax.random.PRNGKey(1), B, CH)
        theta9 = jnp.zeros((B, 9))
        mats = camera_matrices(jnp.zeros((B, 6)))
        variables = gen.init(
            jax.random.PRNGKey(2), z, mats, z2, theta9, method=gen.init_all
        )
        out, _ = gen.apply(
            variables, z, mats, z2, theta9, z, z2, mutable=["batch_stats"]
        )
        assert out.shape == (B, 64, 64, 4)
        assert np.all(np.isfinite(np.asarray(out)))
