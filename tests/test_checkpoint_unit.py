"""Unit tests for the flat-key npz checkpoint serialisation."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_gan_tpu.train.checkpoint import load_tree, save_tree, scan_auto_resume


class TestTreeRoundTrip:
    def _tree(self):
        return {
            "a": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
            "b": [jnp.ones((4,), jnp.int32), jnp.float32(3.5)],
            "scalar": jnp.int32(7),
        }

    def test_roundtrip(self, tmp_path):
        t = self._tree()
        p = str(tmp_path / "t.npz")
        save_tree(p, t)
        out = load_tree(p, t)
        for a, b in zip(
            __import__("jax").tree_util.tree_leaves(t),
            __import__("jax").tree_util.tree_leaves(out),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_non_strict_tolerates_missing(self, tmp_path):
        t = self._tree()
        p = str(tmp_path / "t.npz")
        save_tree(p, {"a": t["a"]})  # partial save
        out = load_tree(p, t)  # non-strict default, like load_npz(strict=False)
        np.testing.assert_allclose(np.asarray(out["a"]["w"]), np.asarray(t["a"]["w"]))
        np.testing.assert_allclose(np.asarray(out["scalar"]), 7)  # template kept

    def test_strict_raises_on_missing(self, tmp_path):
        t = self._tree()
        p = str(tmp_path / "t.npz")
        save_tree(p, {"a": t["a"]})
        with pytest.raises(KeyError):
            load_tree(p, t, strict=True)

    def test_extra_keys_ignored(self, tmp_path):
        t = self._tree()
        p = str(tmp_path / "t.npz")
        save_tree(p, {**t, "extra": {"junk": jnp.zeros(3)}})
        out = load_tree(p, t)
        assert "extra" not in out

    def test_dtype_preserved(self, tmp_path):
        t = {"w": jnp.ones((2,), jnp.bfloat16).astype(jnp.float32), "i": jnp.int32(1)}
        p = str(tmp_path / "t.npz")
        save_tree(p, t)
        out = load_tree(p, t)
        assert np.asarray(out["i"]).dtype == np.int32


class TestAutoResumeScan:
    def test_picks_max_complete(self, tmp_path):
        names = ["Generator", "Discriminator"]
        for it in ("100", "200"):
            for n in names:
                (tmp_path / f"{n}_{it}.npz").write_bytes(b"x")
            (tmp_path / f"snapshot_iter_{it}.npz").write_bytes(b"x")
        # incomplete 300 (missing Discriminator)
        (tmp_path / "Generator_300.npz").write_bytes(b"x")
        (tmp_path / "snapshot_iter_300.npz").write_bytes(b"x")
        assert scan_auto_resume(str(tmp_path), names) == "200"

    def test_latest_tag_not_confused_with_iteration(self, tmp_path):
        names = ["Generator", "Discriminator"]
        for n in names:
            (tmp_path / f"{n}_latest.npz").write_bytes(b"x")
        (tmp_path / "snapshot_iter_latest.npz").write_bytes(b"x")
        # only 'latest' artifacts exist -> no numeric candidate
        assert scan_auto_resume(str(tmp_path), names) is None

    def test_empty_dir(self, tmp_path):
        assert scan_auto_resume(str(tmp_path), ["Generator"]) is None
        assert scan_auto_resume(str(tmp_path / "nope"), ["Generator"]) is None
