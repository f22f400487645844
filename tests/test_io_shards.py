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


def test_slice_cell_tree_selects_only_cell_axes():
    """slice_cell_tree applies [start:stop) exactly to leaves whose `axis`
    dim equals n_cell (the same leaf rule as pad/unpad), leaving
    non-cell-shaped leaves untouched — the driver's cell-chunking relies
    on this to slice params/state/forcing pytrees wholesale."""
    import numpy as np
    from vic_tpu.parallel import slice_cell_tree

    n_cell = 7
    tree = {
        "per_cell": np.arange(n_cell * 3).reshape(n_cell, 3),
        "per_cell_deep": np.arange(n_cell * 2 * 4).reshape(n_cell, 2, 4),
        "not_cell": np.arange(5),             # axis-0 != n_cell: untouched
        "scalar": np.float32(3.0),
        "rec_major": np.arange(6 * n_cell).reshape(6, n_cell),
    }
    out = slice_cell_tree(tree, 2, 5, n_cell)
    assert out["per_cell"].shape == (3, 3)
    np.testing.assert_array_equal(out["per_cell"], tree["per_cell"][2:5])
    assert out["per_cell_deep"].shape == (3, 2, 4)
    assert out["not_cell"].shape == (5,)
    assert out["scalar"] == tree["scalar"]
    # axis=1 slicing for [rec, cell] forcing arrays
    out2 = slice_cell_tree({"f": tree["rec_major"]}, 2, 5, n_cell, axis=1)
    np.testing.assert_array_equal(out2["f"], tree["rec_major"][:, 2:5])
