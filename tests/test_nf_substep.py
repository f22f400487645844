"""NF sub-stepping (SNOW_STEP < TIME_STEP): the driver re-times the whole
column to SNOW_STEP (documented superset of the reference's snow-only
sub-loop, surface_fluxes.c:332-339) and aggregates back to OUT_STEP.
Covers BOTH forcing paths:
- MTCLIM daily TMAX/TMIN -> native disaggregation straight to SNOW_STEP;
- supplied pattern-A forcing at FORCE_DT != model step -> re-timed by
  ingest.resample_forcing_series (repeat intensive / split accumulations).
"""
import numpy as np
import pytest

from vic_tpu.config import parse_global_param_file
from vic_tpu.driver import run_simulation
from vic_tpu.forcing.ingest import resample_forcing_series

N_DAY = 20
LATS = [51.65625, 51.71875]
LONS = [-116.53125, -116.53125]


def _write_params(tmp_path, n_cell=2):
    soil_lines = []
    for i in range(n_cell):
        cols = [1, i + 1, LATS[i], LONS[i], 0.2, 0.05, 15.0, 0.9, 2.0]
        cols += [10.0, 10.0, 12.0, 500.0, 400.0, 300.0, -999, -999, -999,
                 150.0, 250.0, 300.0, 1500.0 + 200 * i, 0.1, 0.5, 1.0,
                 2.0, 4.0, 20.0, 20.0, 20.0, 0.5, 0.5, 0.5,
                 1400.0, 1400.0, 1400.0, 2685.0, 2685.0, 2685.0, -8.0,
                 0.42, 0.42, 0.42, 0.25, 0.25, 0.25,
                 0.01, 0.0005, 800.0, 0.02, 0.02, 0.02, 1]
        soil_lines.append(" ".join(str(c) for c in cols))
    (tmp_path / "soil.txt").write_text("\n".join(soil_lines) + "\n")
    veglib = ("1 0 25.0 150.0 " + " ".join(["1.5"] * 12) + " "
              + " ".join(["0.2"] * 12) + " " + " ".join(["0.05"] * 12) + " "
              + " ".join(["0.3"] * 12) + " " + "2.0 100.0 0.0 0.0 0.0\n")
    (tmp_path / "veglib.txt").write_text(veglib)
    vp = []
    for i in range(n_cell):
        vp.append(f"{i + 1} 1")
        vp.append("1 0.6 0.3 0.6 0.7 0.4")
    (tmp_path / "vegparam.txt").write_text("\n".join(vp) + "\n")


def _global(tmp_path, force_block, snow_step=3, month=1):
    return f"""
TIME_STEP 24
SNOW_STEP {snow_step}
STARTYEAR 1995
STARTMONTH {month}
STARTDAY 01
ENDYEAR 1995
ENDMONTH {month}
ENDDAY {N_DAY}
FULL_ENERGY TRUE
QUICK_FLUX TRUE
NLAYER 3
NODES 3
GRID_DECIMAL 4
SOIL {tmp_path}/soil.txt
VEGLIB {tmp_path}/veglib.txt
VEGPARAM {tmp_path}/vegparam.txt
ROOT_ZONES 2
SNOW_BAND 1
{force_block}
FORCEYEAR 1995
RESULT_DIR {tmp_path}
OUTPUT_FORMAT ASCII
OUT_STEP 24
"""


def _run(tmp_path, gtxt):
    g = tmp_path / "global.txt"
    g.write_text(gtxt)
    gp = parse_global_param_file(str(g))
    return gp, run_simulation(gp, write_output=False, progress=False)


def _daily_prec(seed=7, n_cell=2):
    rng = np.random.default_rng(seed)
    return np.where(rng.random((N_DAY, n_cell)) < 0.5,
                    rng.gamma(2, 3, (N_DAY, n_cell)), 0.0)


def test_mtclim_path_snowstep3(tmp_path):
    """TIME_STEP 24 / SNOW_STEP 3 on daily TMAX/TMIN forcing: MTCLIM
    disaggregates to 3-hourly; outputs re-aggregate to daily; closure and
    precipitation conservation hold."""
    _write_params(tmp_path)
    prec = _daily_prec()
    rng = np.random.default_rng(3)
    for i in range(2):
        t = np.arange(N_DAY)
        tmax = 2 + 6 * np.sin(t / 10) + rng.normal(0, 2, N_DAY)
        rows = np.stack([prec[:, i], tmax, tmax - 9,
                         rng.uniform(0.5, 4.0, N_DAY)], 1)
        np.savetxt(tmp_path / f"forc_{LATS[i]:.4f}_{LONS[i]:.4f}", rows,
                   fmt="%.4f")
    fb = (f"FORCING1 {tmp_path}/forc_\nFORCE_FORMAT ASCII\nFORCE_DT 24\n"
          "N_TYPES 4\nFORCE_TYPE PREC\nFORCE_TYPE TMAX\nFORCE_TYPE TMIN\n"
          "FORCE_TYPE WIND")
    gp, res = _run(tmp_path, _global(tmp_path, fb))
    out_prec = np.asarray(res.outputs["OUT_PREC"])
    assert out_prec.shape == (N_DAY, 2)    # daily OUT_STEP aggregation
    np.testing.assert_allclose(out_prec, prec, rtol=1e-4, atol=1e-4)
    assert np.abs(np.asarray(res.outputs["OUT_WATER_ERROR"])).max() <= 1e-2


def _write_subdaily(tmp_path, file_dt, seed=11):
    """Pattern-A forcing files (PREC AIR_TEMP WIND SHORTWAVE LONGWAVE
    PRESSURE VP) at file_dt hours; returns daily precip totals."""
    rng = np.random.default_rng(seed)
    n = N_DAY * 24 // file_dt
    daily = np.zeros((N_DAY, 2))
    for i in range(2):
        hr = np.arange(n) * file_dt
        air = -2 + 8 * np.sin(2 * np.pi * (hr - 9) / 24.0) \
            + rng.normal(0, 1, n)
        prec = np.where(rng.random(n) < 0.2, rng.gamma(2, 1.0, n), 0.0)
        daily[:, i] = prec.reshape(N_DAY, -1).sum(1)
        sw = np.clip(400 * np.sin(2 * np.pi * (hr - 6) / 24.0), 0, None)
        svp = 0.6108 * np.exp(17.27 * air / (237.3 + air))
        vp = svp * 0.7                         # kPa
        lw = 0.8 * 5.67e-8 * (air + 273.15) ** 4
        press = np.full(n, 85.0)               # kPa
        rows = np.stack([prec, air, rng.uniform(0.5, 4.0, n), sw, lw,
                         press, vp], 1)
        np.savetxt(tmp_path / f"forc_{LATS[i]:.4f}_{LONS[i]:.4f}", rows,
                   fmt="%.5f")
    return daily


def _pattern_a_block(tmp_path, file_dt):
    return (f"FORCING1 {tmp_path}/forc_\nFORCE_FORMAT ASCII\n"
            f"FORCE_DT {file_dt}\nN_TYPES 7\nFORCE_TYPE PREC\n"
            "FORCE_TYPE AIR_TEMP\nFORCE_TYPE WIND\nFORCE_TYPE SHORTWAVE\n"
            "FORCE_TYPE LONGWAVE\nFORCE_TYPE PRESSURE\nFORCE_TYPE VP")


def test_supplied_subdaily_path_snowstep3(tmp_path):
    """Supplied 3-hourly forcing with TIME_STEP 24 / SNOW_STEP 3: the model
    re-times to 3h and must read the file on ITS OWN 3-hourly axis (the
    round-1 bug read it on the 24-h axis)."""
    _write_params(tmp_path)
    daily = _write_subdaily(tmp_path, file_dt=3)
    gp, res = _run(tmp_path, _global(tmp_path,
                                     _pattern_a_block(tmp_path, 3)))
    out_prec = np.asarray(res.outputs["OUT_PREC"])
    assert out_prec.shape == (N_DAY, 2)
    np.testing.assert_allclose(out_prec, daily, rtol=1e-4, atol=1e-3)
    assert np.abs(np.asarray(res.outputs["OUT_WATER_ERROR"])).max() <= 1e-2


def test_supplied_daily_pattern_a_snowstep3(tmp_path):
    """Supplied DAILY pattern-A forcing with SNOW_STEP 3: coarse->fine
    re-timing (repeat intensive, split precip) conserves water."""
    _write_params(tmp_path)
    daily = _write_subdaily(tmp_path, file_dt=24)
    gp, res = _run(tmp_path, _global(tmp_path,
                                     _pattern_a_block(tmp_path, 24)))
    out_prec = np.asarray(res.outputs["OUT_PREC"])
    np.testing.assert_allclose(out_prec, daily, rtol=1e-4, atol=1e-3)
    assert np.abs(np.asarray(res.outputs["OUT_WATER_ERROR"])).max() <= 1e-2


def test_resample_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.random((8, 3))
    fine = resample_forcing_series(v, "PREC", 24, 3)
    assert fine.shape == (64, 3)
    np.testing.assert_allclose(fine.reshape(8, 8, 3).sum(1), v)
    back = resample_forcing_series(fine, "PREC", 3, 24)
    np.testing.assert_allclose(back, v)
    w = rng.random((8, 3))
    fine_t = resample_forcing_series(w, "AIR_TEMP", 24, 3)
    np.testing.assert_allclose(fine_t.reshape(8, 8, 3).mean(1), w)
