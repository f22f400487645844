#!/usr/bin/env python
"""Generate a production-scale synthetic domain in the REFERENCE grammar:
soil/veglib/vegparam text files, a single all-cells NetCDF forcing file
(variable_mapping.c names), and a global parameter file — then run it with
`python -m vic_tpu -g <workdir>/global.txt --chunk N`.

Validates the large-domain path end-to-end (vicNl.c:514-517 cell loop /
README.md:5-7 large-domain claims): file ingest at scale, the memory
governor, record chunking, NetCDF output and state save on real hardware.

Usage:
  python tools/make_production_domain.py --cells 51200 --days 365 \
      --workdir /tmp/prod
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

NL = 3
FORCE_TYPES = ["PREC", "AIR_TEMP", "WIND", "SHORTWAVE", "LONGWAVE",
               "PRESSURE", "VP"]
NC_NAMES = {"PREC": "pr", "AIR_TEMP": "tas", "WIND": "wind",
            "SHORTWAVE": "rsds", "LONGWAVE": "rlds", "PRESSURE": "ps",
            "VP": "VP"}


def make_grid(n_cell):
    """Factor n_cell into an nlat x nlon grid with distinct axes."""
    nlat = int(np.sqrt(n_cell))
    while n_cell % nlat:
        nlat -= 1
    nlon = n_cell // nlat
    lats = 44.0 + 0.02 * np.arange(nlat)
    lons = -122.0 + 0.02 * np.arange(nlon)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    return lats, lons, glat.ravel(), glon.ravel()


def write_domain(workdir, n_cell, n_days, seed=0):
    os.makedirs(os.path.join(workdir, "results"), exist_ok=True)
    lat_ax, lon_ax, lat, lon = make_grid(n_cell)
    rng = np.random.default_rng(seed)
    elev = 300.0 + 1200.0 * rng.random(n_cell)

    glacier_defaults = "0.85 0.94 0.58 0.82 0.46 -0.5 0.5 1 1 -6.5 0 200 " \
        "200 0.01 0.05 2 0.3 0.002"
    with open(os.path.join(workdir, "soil.txt"), "w") as f:
        for ci in range(n_cell):
            f.write(
                f"1 {ci + 1} {lat[ci]:.4f} {lon[ci]:.4f} 0.2 0.01 12 0.8 2 "
                f"8 8 8 300 300 300 -99 -99 -99 40 120 280 "
                f"{elev[ci]:.1f} 0.1 0.3 1.0 8 4 30 30 30 0.4 0.4 0.4 "
                f"1400 1400 1400 2650 2650 2650 0 0.6 0.6 0.6 0.3 0.3 0.3 "
                f"0.01 0.0012 800 0.05 0.05 0.05 0 15 "
                + glacier_defaults + "\n")

    lai = [1.5 + 1.0 * np.sin(2 * np.pi * (m - 3) / 12.0) for m in range(12)]
    with open(os.path.join(workdir, "veglib.txt"), "w") as f:
        row = ["1", "0", "25.0", "100.0"] + [f"{v:.3f}" for v in lai] \
            + ["0.2"] * 12 + ["0.05"] * 12 + ["0.3"] * 12 \
            + ["10.0", "100.0", "0.5", "0.5", "0.2"]
        f.write(" ".join(row) + "\n")
    with open(os.path.join(workdir, "vegparam.txt"), "w") as f:
        for ci in range(n_cell):
            f.write(f"{ci + 1} 1\n1 0.70 0.30 0.60 0.70 0.40 0\n")

    # ---- one all-cells NetCDF forcing file (daily) ----
    from vic_tpu.io import native
    n_rec = n_days
    doy = np.arange(n_rec) % 365
    season = np.sin(2.0 * np.pi * (doy - 80) / 365.0).astype(np.float32)
    shape = (n_rec, len(lat_ax), len(lon_ax))
    path = os.path.join(workdir, "forcing.nc")
    with native.NetCDFFile(path, "w") as f:
        f.def_dim("time", n_rec)
        f.def_dim("lat", len(lat_ax))
        f.def_dim("lon", len(lon_ax))
        f.def_var("time", np.float64, ("time",))
        f.def_var("lat", np.float64, ("lat",))
        f.def_var("lon", np.float64, ("lon",))
        for t in FORCE_TYPES:
            f.def_var(NC_NAMES[t], np.float32, ("time", "lat", "lon"))
        f.enddef()
        f.put("time", np.arange(n_rec, dtype=np.float64))
        f.put("lat", lat_ax)
        f.put("lon", lon_ax)
        base = season[:, None, None]
        air = (8.0 + 12.0 * base
               + rng.normal(0, 1.5, shape)).astype(np.float32)
        wet = rng.random(shape) < 0.25
        prec = np.where(wet, rng.gamma(2.0, 4.0, shape), 0.0) \
            .astype(np.float32)
        wind = np.clip(rng.gamma(2.0, 1.2, shape), 0.2, None) \
            .astype(np.float32)
        sw = np.clip((180 + 140 * base) + rng.normal(0, 15, shape),
                     0.0, None).astype(np.float32)
        svp = 0.6108 * np.exp(17.27 * air / (237.3 + air))
        vp = np.clip(svp * rng.uniform(0.4, 0.95, shape), 0.05,
                     None).astype(np.float32)
        lw = (1.24 * (10.0 * vp / (air + 273.15)) ** (1.0 / 7.0)
              * 5.67e-8 * (air + 273.15) ** 4).astype(np.float32)
        ps = np.full(shape, 95.5, np.float32)
        for t, arr in [("PREC", prec), ("AIR_TEMP", air), ("WIND", wind),
                       ("SHORTWAVE", sw), ("LONGWAVE", lw),
                       ("PRESSURE", ps), ("VP", vp)]:
            f.put(NC_NAMES[t], arr)

    y0, end_y = 1995, 1995
    import datetime
    end = datetime.date(y0, 1, 1) + datetime.timedelta(days=n_days - 1)
    g = f"""
NLAYER 3
NODES 3
TIME_STEP 24
SNOW_STEP 24
STARTYEAR {y0}
STARTMONTH 01
STARTDAY 01
STARTHOUR 00
ENDYEAR {end.year}
ENDMONTH {end.month:02d}
ENDDAY {end.day:02d}
FULL_ENERGY TRUE
FROZEN_SOIL FALSE
QUICK_FLUX TRUE
DIST_PRCP FALSE
TFALLBACK TRUE
COMPUTE_TREELINE FALSE
JULY_TAVG_SUPPLIED TRUE
GRID_DECIMAL 4
RESOLUTION 0.02
FORCING1 {workdir}/forcing.nc
FORCE_FORMAT NETCDF
FORCE_DT 24
N_TYPES 7
""" + "".join(f"FORCE_TYPE {t}\n" for t in FORCE_TYPES) + f"""
FORCEYEAR {y0}
FORCEMONTH 01
FORCEDAY 01
FORCEHOUR 00
WIND_H 10.0
MEASURE_H 2.0
SOIL {workdir}/soil.txt
VEGPARAM {workdir}/vegparam.txt
VEGLIB {workdir}/veglib.txt
ROOT_ZONES 2
SNOW_BAND 1
GLACIER_ID -1
RESULT_DIR {workdir}/results
OUT_STEP 0
COMPRESS FALSE
OUTPUT_FORMAT NETCDF
NETCDF_OUTPUT_FILENAME fluxes.nc
STATENAME {workdir}/results/state
STATEYEAR {end.year}
STATEMONTH {end.month:02d}
STATEDAY {end.day:02d}
N_OUTFILES 1
OUTFILE fluxes 8
OUTVAR OUT_PREC
OUTVAR OUT_EVAP
OUTVAR OUT_RUNOFF
OUTVAR OUT_BASEFLOW
OUTVAR OUT_SWE
OUTVAR OUT_SOIL_MOIST
OUTVAR OUT_SURF_TEMP
OUTVAR OUT_WATER_ERROR
"""
    with open(os.path.join(workdir, "global.txt"), "w") as f:
        f.write(g)
    print(f"domain ready: {n_cell} cells x {n_days} days at {workdir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=51200)
    ap.add_argument("--days", type=int, default=365)
    ap.add_argument("--workdir", default="/tmp/prod")
    args = ap.parse_args()
    write_domain(args.workdir, args.cells, args.days)


if __name__ == "__main__":
    main()
