import numpy as np
import pytest

from vic_tpu.io import native
from vic_tpu.output import (AGG_AVG, AGG_END, AGG_SUM, AsciiOutputWriter,
                            NetCDFOutputWriter, OUTVAR_META, aggregate_outputs)
from vic_tpu.timeaxis import make_time_axis


def fake_outs(n_rec, n_cell, nl=3):
    rng = np.random.default_rng(1)
    return {
        "OUT_PREC": rng.random((n_rec, n_cell)),
        "OUT_SWE": rng.random((n_rec, n_cell)),
        "OUT_AIR_TEMP": rng.random((n_rec, n_cell)),
        "OUT_SOIL_MOIST": rng.random((n_rec, n_cell, nl)),
    }


class TestAggregation:
    def test_agg_methods(self):
        outs = fake_outs(6, 2)
        agg = aggregate_outputs(outs, 3)
        assert agg["OUT_PREC"].shape == (2, 2)
        np.testing.assert_allclose(agg["OUT_PREC"][0],
                                   outs["OUT_PREC"][:3].sum(0))  # SUM
        np.testing.assert_allclose(agg["OUT_SWE"][1],
                                   outs["OUT_SWE"][5])           # END
        np.testing.assert_allclose(agg["OUT_AIR_TEMP"][0],
                                   outs["OUT_AIR_TEMP"][:3].mean(0))  # AVG

    def test_noop(self):
        outs = fake_outs(4, 2)
        agg = aggregate_outputs(outs, 1)
        np.testing.assert_array_equal(agg["OUT_PREC"], outs["OUT_PREC"])


@pytest.mark.skipif(not native.available(), reason="no native netcdf")
class TestNetCDFWriter:
    def test_write_and_readback(self, tmp_path):
        n_rec, n_cell = 4, 6
        lats = np.array([50.0, 50.0, 50.25, 50.25, 50.5, 50.5])
        lons = np.array([-116.0, -115.75, -116.0, -115.75, -116.0, -115.75])
        outs = fake_outs(n_rec, n_cell)
        path = str(tmp_path / "results.nc")
        w = NetCDFOutputWriter(path, lats, lons,
                               ["OUT_PREC", "OUT_SWE", "OUT_SOIL_MOIST"],
                               global_attrs={"institution": "vic-tpu test"})
        w.write_all(outs, np.arange(n_rec, dtype=float))
        w.close()

        with native.NetCDFFile(path) as f:
            assert f.dim_len("time") == n_rec
            assert f.dim_len("lat") == 3 and f.dim_len("lon") == 2
            pr = f.get("PREC", (0, 0, 0), (n_rec, 3, 2), np.float32)
            # cell 0 at (lat0, lon0)
            np.testing.assert_allclose(pr[:, 0, 0], outs["OUT_PREC"][:, 0],
                                       rtol=1e-6)
            sm = f.get("SOIL_MOIST", (0, 0, 0, 0), (n_rec, 3, 3, 2), np.float32)
            np.testing.assert_allclose(sm[:, :, 0, 0],
                                       outs["OUT_SOIL_MOIST"][:, 0, :],
                                       rtol=1e-6)

    def test_missing_cells_filled(self, tmp_path):
        lats = np.array([50.0, 50.25])       # 2x2 grid, only diagonal present
        lons = np.array([-116.0, -115.75])
        outs = {"OUT_PREC": np.ones((1, 2))}
        path = str(tmp_path / "gap.nc")
        w = NetCDFOutputWriter(path, lats, lons, ["OUT_PREC"])
        w.write_all(outs, np.array([0.0]))
        w.close()
        with native.NetCDFFile(path) as f:
            pr = f.get("PREC", (0, 0, 0), (1, 2, 2), np.float32)
            assert pr[0, 0, 0] == 1.0 and pr[0, 1, 1] == 1.0
            assert pr[0, 0, 1] > 1e19 and pr[0, 1, 0] > 1e19


class TestAsciiWriter:
    def test_write(self, tmp_path):
        n_rec, n_cell = 3, 2
        outs = fake_outs(n_rec, n_cell)
        ax = make_time_axis(1995, 1, 1, 0, n_rec, 24)
        w = AsciiOutputWriter(str(tmp_path), "fluxes",
                              [50.0, 50.25], [-116.0, -116.0],
                              ["OUT_PREC", "OUT_SOIL_MOIST"])
        w.write_all(outs, ax)
        w.close()
        lines = open(w.paths[0]).read().strip().split("\n")
        assert len(lines) == n_rec
        toks = lines[0].split()
        assert toks[0] == "1995" and toks[1] == "01"
        assert len(toks) == 4 + 1 + 3  # date + prec + 3 soil layers

    def test_write_compressed(self, tmp_path):
        # COMPRESS analog of compress_files.c:24 (gzip of ASCII fluxes)
        import gzip
        n_rec = 3
        outs = fake_outs(n_rec, 2)
        ax = make_time_axis(1995, 1, 1, 0, n_rec, 24)
        w = AsciiOutputWriter(str(tmp_path), "fluxes",
                              [50.0, 50.25], [-116.0, -116.0],
                              ["OUT_PREC", "OUT_SOIL_MOIST"], compress=True)
        w.write_all(outs, ax)
        w.close()
        assert w.paths[0].endswith(".gz")
        lines = gzip.open(w.paths[0], "rt").read().strip().split("\n")
        assert len(lines) == n_rec and lines[0].split()[0] == "1995"


class TestBinaryWriter:
    def test_roundtrip(self, tmp_path):
        from vic_tpu.output import BinaryOutputWriter
        n_rec, n_cell = 3, 2
        outs = fake_outs(n_rec, n_cell)
        ax = make_time_axis(1995, 1, 1, 0, n_rec, 24)
        w = BinaryOutputWriter(str(tmp_path), "fluxes",
                               [50.0, 50.25], [-116.0, -116.0],
                               ["OUT_PREC", "OUT_SOIL_MOIST"],
                               nrecs=n_rec, out_dt=24,
                               start_date=(1995, 1, 1, 0))
        w.write_all(outs, ax)
        from vic_tpu.output import read_binary_output
        meta, dates, cols = read_binary_output(w.paths[0])
        assert meta["nrecs"] == n_rec and meta["out_dt"] == 24
        assert dates[0].tolist() == [1995, 1, 1]
        assert len(cols) == 1 + 3          # PREC + SOIL_MOIST x3
        np.testing.assert_allclose(cols[0], outs["OUT_PREC"][:, 0],
                                   rtol=1e-6)
