"""Per-host sharded NetCDF output + offline merge (parallel/io_shards.py)."""
import os

import numpy as np
import pytest

from vic_tpu.io import native
from vic_tpu.parallel.io_shards import (find_shards, merge_shards,
                                        shard_ranges, write_sharded_netcdf)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libnetcdf unavailable")


def test_shard_ranges_cover():
    rs = shard_ranges(10, 3)
    assert rs == [(0, 4), (4, 7), (7, 10)]
    assert shard_ranges(8, 8) == [(i, i + 1) for i in range(8)]


def _fake_agg(n_t, n_cell, nl=3):
    rng = np.random.default_rng(0)
    return {
        "OUT_EVAP": rng.uniform(0, 5, (n_t, n_cell)),
        "OUT_RUNOFF": rng.uniform(0, 8, (n_t, n_cell)),
        "OUT_SOIL_MOIST": rng.uniform(10, 300, (n_t, n_cell, nl)),
    }


def test_write_and_merge_roundtrip(tmp_path):
    n_t, n_cell = 6, 7
    lats = 45.0 + 0.25 * np.arange(n_cell)
    lons = -120.0 + 0.25 * (np.arange(n_cell) % 3)
    agg = _fake_agg(n_t, n_cell)
    tvals = np.arange(n_t, dtype=float)
    base = str(tmp_path / "results.nc")

    paths = write_sharded_netcdf(base, lats, lons, agg, tvals, n_shards=3)
    assert len(paths) == 3
    assert find_shards(base) == paths

    merged = merge_shards(base)
    assert os.path.exists(merged)

    # merged file equals the single-writer result cell-for-cell
    from vic_tpu.output import NetCDFOutputWriter
    ref = str(tmp_path / "ref.nc")
    w = NetCDFOutputWriter(ref, lats, lons, list(agg.keys()))
    w.write_all(agg, tvals)
    w.close()

    with native.NetCDFFile(merged) as fm, native.NetCDFFile(ref) as fr:
        for v in ("EVAP", "RUNOFF", "SOIL_MOIST"):
            dm = [fm.dim_len(d) for d in (("time", "lat", "lon")
                                          if v != "SOIL_MOIST" else
                                          ("time", "depth", "lat", "lon"))]
            dr = [fr.dim_len(d) for d in (("time", "lat", "lon")
                                          if v != "SOIL_MOIST" else
                                          ("time", "depth", "lat", "lon"))]
            assert dm == dr
            am = fm.get(v, [0] * len(dm), dm, np.float64)
            ar = fr.get(v, [0] * len(dr), dr, np.float64)
            np.testing.assert_allclose(am, ar, rtol=1e-6)
