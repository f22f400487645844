"""End-to-end driver test: reference-format parameter/forcing files on disk ->
CLI-style run -> NetCDF/ASCII outputs."""
import os

import numpy as np
import pytest

from vic_tpu.config import parse_global_param_file
from vic_tpu.driver import load_domain, run_simulation
from vic_tpu.io import native


def write_fixture(tmp_path, n_cell=2, n_day=40, fmt="NETCDF"):
    # ---- soil file: legacy format (no glacier columns) ----
    lats = [51.65625, 51.71875]
    lons = [-116.53125, -116.53125]
    soil_lines = []
    for i in range(n_cell):
        cols = [1, i + 1, lats[i], lons[i], 0.2, 0.05, 15.0, 0.9, 2.0]
        cols += [10.0, 10.0, 12.0]           # expt
        cols += [500.0, 400.0, 300.0]        # ksat
        cols += [-999, -999, -999]           # phi_s
        cols += [150.0, 250.0, 300.0]        # init_moist
        cols += [1500.0 + 200 * i]           # elevation
        cols += [0.1, 0.5, 1.0]              # depth
        cols += [2.0, 4.0]                   # avg_temp, dp
        cols += [20.0, 20.0, 20.0]           # bubble
        cols += [0.5, 0.5, 0.5]              # quartz
        cols += [1400.0, 1400.0, 1400.0]     # bulk_dens_min
        cols += [2685.0, 2685.0, 2685.0]     # soil_dens_min
        cols += [-8.0]                       # off_gmt
        cols += [0.42, 0.42, 0.42]           # Wcr_FRACT
        cols += [0.25, 0.25, 0.25]           # Wpwp_FRACT
        cols += [0.01, 0.0005, 800.0]        # rough, snow_rough, annual_prec
        cols += [0.02, 0.02, 0.02]           # resid_moist
        cols += [1]                          # FS_ACTIVE
        soil_lines.append(" ".join(str(c) for c in cols))
    (tmp_path / "soil.txt").write_text("\n".join(soil_lines) + "\n")

    # ---- veg library: 1 class ----
    veglib = ("1 0 25.0 150.0 "
              + " ".join(["1.5"] * 12) + " "   # LAI
              + " ".join(["0.2"] * 12) + " "   # albedo
              + " ".join(["0.05"] * 12) + " "  # roughness
              + " ".join(["0.3"] * 12) + " "   # displacement
              + "2.0 100.0 0.0 0.0 0.0\n")
    (tmp_path / "veglib.txt").write_text(veglib)

    # ---- veg param: each cell 1 tile covering 60% ----
    vp = []
    for i in range(n_cell):
        vp.append(f"{i + 1} 1")
        vp.append("1 0.6 0.3 0.6 0.7 0.4")
    (tmp_path / "vegparam.txt").write_text("\n".join(vp) + "\n")

    # ---- daily ASCII forcing per cell: PREC TMAX TMIN WIND ----
    rng = np.random.default_rng(7)
    for i in range(n_cell):
        t = np.arange(n_day)
        tmax = 12 + 6 * np.sin(t / 20) + rng.normal(0, 2, n_day)
        tmin = tmax - 9
        prec = np.where(rng.random(n_day) < 0.4, rng.gamma(2, 3, n_day), 0)
        wind = rng.uniform(0.5, 4.0, n_day)
        rows = np.stack([prec, tmax, tmin, wind], 1)
        path = tmp_path / f"forc_{lats[i]:.4f}_{lons[i]:.4f}"
        np.savetxt(path, rows, fmt="%.4f")

    # ---- global parameter file (reference grammar) ----
    gtxt = f"""
# vic-tpu end-to-end fixture
TIME_STEP 24
SNOW_STEP 24
STARTYEAR 1995
STARTMONTH 6
STARTDAY 01
ENDYEAR 1995
ENDMONTH 7
ENDDAY 10
FULL_ENERGY TRUE
FROZEN_SOIL FALSE
QUICK_FLUX TRUE
NLAYER 3
NODES 3
GRID_DECIMAL 4
SOIL {tmp_path}/soil.txt
VEGLIB {tmp_path}/veglib.txt
VEGPARAM {tmp_path}/vegparam.txt
ROOT_ZONES 2
SNOW_BAND 1
FORCING1 {tmp_path}/forc_
FORCE_FORMAT ASCII
FORCE_DT 24
N_TYPES 4
FORCE_TYPE PREC
FORCE_TYPE TMAX
FORCE_TYPE TMIN
FORCE_TYPE WIND
FORCEYEAR 1995
RESULT_DIR {tmp_path}
OUTPUT_FORMAT {fmt}
NETCDF_OUTPUT_FILENAME results.nc
OUT_STEP 24
"""
    gfile = tmp_path / "global.txt"
    gfile.write_text(gtxt)
    return gfile


@pytest.mark.skipif(not native.available(), reason="no native netcdf")
def test_end_to_end_netcdf(tmp_path):
    gfile = write_fixture(tmp_path)
    gp = parse_global_param_file(str(gfile))
    assert gp.soil_file.endswith("soil.txt")
    res = run_simulation(gp, progress=False)
    assert res.timeaxis.nrecs == 40
    # outputs written
    out = tmp_path / "results.nc"
    assert out.exists()
    with native.NetCDFFile(str(out)) as f:
        assert f.dim_len("time") == 40
        evap = f.get("EVAP", (0, 0, 0), (40, f.dim_len("lat"),
                                         f.dim_len("lon")), np.float32)
        valid = evap[evap < 1e19]
        assert np.isfinite(valid).all()
        assert valid.size == 40 * 2      # 2 cells
    # water balance closes
    err = res.outputs["OUT_WATER_ERROR"]
    assert np.abs(err).max() < 0.01


def test_end_to_end_ascii(tmp_path):
    gfile = write_fixture(tmp_path, fmt="ASCII")
    gp = parse_global_param_file(str(gfile))
    res = run_simulation(gp, progress=False)
    files = [p for p in os.listdir(tmp_path) if p.startswith("fluxes_")]
    assert len(files) == 2
    lines = open(tmp_path / files[0]).read().strip().split("\n")
    assert len(lines) == 40


def test_domain_loading(tmp_path):
    gfile = write_fixture(tmp_path)
    gp = parse_global_param_file(str(gfile))
    dom = load_domain(gp)
    assert dom.n_cell == 2
    np.testing.assert_allclose(dom.soil.depth[0], [0.1, 0.5, 1.0])
    # derived: max_moist = depth * porosity * 1000
    porosity = 1 - 1400.0 / 2685.0
    np.testing.assert_allclose(dom.soil.max_moist[0, 0], 0.1 * porosity * 1000,
                               rtol=1e-6)
    # HRU mosaic: 1 veg tile + artificial bare soil
    assert dom.hru.mask[0].sum() == 2
    np.testing.assert_allclose(dom.hru.cv[0, :2].sum(), 1.0)
