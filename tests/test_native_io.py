import os

import numpy as np
import pytest

from vic_tpu.io import native


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native vicio unavailable")


class TestNetCDF:
    def test_roundtrip(self, have_native, tmp_path):
        path = str(tmp_path / "t.nc")
        data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        with native.NetCDFFile(path, "w") as f:
            f.def_dim("time", None)
            f.def_dim("lat", 3)
            f.def_dim("lon", 4)
            f.def_var("pr", np.float32, ("time", "lat", "lon"), deflate=1,
                      attrs={"units": "mm", "scale_factor": 1.0})
            f.put_att("title", "vic-tpu test")
            f.put("pr", data)
        with native.NetCDFFile(path) as f:
            assert f.dim_len("lat") == 3
            assert "pr" in f.var_names()
            back = f.get("pr", (0, 0, 0), (2, 3, 4), np.float32)
            np.testing.assert_array_equal(back, data)
            assert f.get_att("pr", "scale_factor") == 1.0

    def test_partial_write(self, have_native, tmp_path):
        path = str(tmp_path / "p.nc")
        with native.NetCDFFile(path, "w") as f:
            f.def_dim("time", None)
            f.def_dim("cell", 5)
            f.def_var("q", np.float64, ("time", "cell"))
            for t in range(3):
                f.put("q", np.full((1, 5), float(t)), start=(t, 0))
        with native.NetCDFFile(path) as f:
            assert f.dim_len("time") == 3
            got = f.get("q", (2, 0), (1, 5))
            np.testing.assert_array_equal(got, np.full((1, 5), 2.0))


class TestAsciiTable:
    def test_parse(self, tmp_path):
        p = tmp_path / "f.txt"
        p.write_text("# comment\n1.5 2 3\n4 5e-1 6\n\n7 8 9\n")
        out = native.read_ascii_table(str(p), 3)
        np.testing.assert_allclose(
            out, [[1.5, 2, 3], [4, 0.5, 6], [7, 8, 9]])

    def test_skip_and_pad(self, tmp_path):
        p = tmp_path / "g.txt"
        p.write_text("1 2 3\n4 5\n")
        out = native.read_ascii_table(str(p), 3, skip_rows=1)
        np.testing.assert_allclose(out, [[4, 5, 0]])


class TestVicBinary:
    def test_roundtrip(self, tmp_path):
        # 3 fields: prec unsigned x100, temp signed x100, wind signed x100
        recs = np.array([[123, -456, 789], [1000, 250, -30]], np.int16)
        p = tmp_path / "forc.bin"
        recs.astype("<i2").tofile(p)
        out = native.read_vic_binary(
            str(p), signed_flags=[False, True, True],
            multipliers=[100.0, 100.0, 100.0], max_recs=10)
        assert out.shape == (3, 2)
        np.testing.assert_allclose(out[1], [-4.56, 2.5])
        np.testing.assert_allclose(out[0], [1.23, 10.0])
