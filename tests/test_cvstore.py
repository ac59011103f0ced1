# tests/test_cvstore.py
"""CVCollection: labeled storage, frame indexing, HDF5 round-trip
(the xarray-bridge analog of the reference's ``tests/test_xarray.py``)."""

import numpy as np
import pytest

from encodermap_tpu.data.cvstore import CVCollection


class TestCVCollection:
    def test_add_and_access(self, rng):
        c = CVCollection()
        data = rng.standard_normal((10, 4)).astype(np.float32)
        c.add("dihedrals", data, labels=[f"d{i}" for i in range(4)])
        np.testing.assert_array_equal(c["dihedrals"], data)
        assert c.entry("dihedrals").labels == ["d0", "d1", "d2", "d3"]
        assert "dihedrals" in c
        assert len(c) == 1

    def test_frame_indexing(self, rng):
        c = CVCollection()
        c.add("a", rng.standard_normal((10, 3)))
        c.add("b", rng.standard_normal((10, 2, 3)))
        sub = c.index_frames(slice(2, 7))
        assert sub["a"].shape == (5, 3)
        assert sub["b"].shape == (5, 2, 3)
        np.testing.assert_array_equal(sub["a"], c["a"][2:7])

    def test_hdf5_roundtrip(self, rng, tmp_path):
        c = CVCollection()
        data = rng.standard_normal((8, 5)).astype(np.float32)
        idx = np.arange(20).reshape(5, 4)
        c.add("dih", data, labels=["x"] * 5, indices=idx)
        c.add("plain", rng.standard_normal((8, 2)))
        path = tmp_path / "cvs.h5"
        c.to_hdf5(path)

        back = CVCollection.from_hdf5(path)
        np.testing.assert_array_equal(back["dih"], data)
        assert back.entry("dih").labels == ["x"] * 5
        np.testing.assert_array_equal(back.entry("dih").indices, idx)
        assert "plain" in back

    def test_overwrite_group(self, rng, tmp_path):
        c = CVCollection()
        c.add("a", rng.standard_normal((4, 2)))
        path = tmp_path / "cvs.h5"
        c.to_hdf5(path)
        c2 = CVCollection()
        c2.add("b", rng.standard_normal((4, 2)))
        c2.to_hdf5(path)  # replaces the group
        back = CVCollection.from_hdf5(path)
        assert "b" in back and "a" not in back
