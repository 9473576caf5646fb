"""The pose-consistent sphere renderer behind the 3D-validation runs.

The scripted structure gates (tools/validate_3d_structure.py) are only
meaningful if the dataset itself has the physics they test for — pin the
renderer's geometry here (pure numpy, no accelerator)."""

import importlib.util
import os

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "make_structured_dataset",
    os.path.join(os.path.dirname(__file__), "..", "tools", "make_structured_dataset.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
render_sphere = _mod.render_sphere
make_dataset = _mod.make_dataset


class TestRenderSphere:
    def test_depth_has_sphere_geometry(self):
        img, depth = render_sphere(64, 0.0, 0.0, np.ones(3), np.zeros(3))
        hit = depth < depth.max()
        assert 0.05 < hit.mean() < 0.9  # sphere visible, not frame-filling
        # convexity: rim farther than center (the validate_3d_structure gate)
        yy, xx = np.mgrid[0:64, 0:64]
        cy, cx = yy[hit].mean(), xx[hit].mean()
        r = np.sqrt((yy[hit] - cy) ** 2 + (xx[hit] - cx) ** 2)
        corr = np.corrcoef(r, depth[hit])[0, 1]
        assert corr > 0.5, f"rim must read farther than center, corr={corr}"
        # foreground brighter than the near-black background
        assert img[hit].mean() > img[~hit].mean() + 0.1

    def test_pose_consistency(self):
        a1, _ = render_sphere(32, 0.3, 0.1, np.ones(3), np.zeros(3))
        a2, _ = render_sphere(32, 0.3, 0.1, np.ones(3), np.zeros(3))
        b, _ = render_sphere(32, 1.3, 0.1, np.ones(3), np.zeros(3))
        np.testing.assert_array_equal(a1, a2)  # deterministic in pose
        assert np.abs(a1 - b).mean() > 0.01  # texture moves with yaw

    def test_dataset_cache_layout(self):
        data = make_dataset(4, 32, seed=0)
        assert data.shape == (4, 3, 32, 32) and data.dtype == np.uint8
        # per-image random colours: images differ
        assert not np.array_equal(data[0], data[1])
