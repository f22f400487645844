#!/usr/bin/env python
"""Reference-binary oracle harness: generate identical inputs for the C
reference (pacificclimate/VIC built at /tmp/vicbuild/vicNl, see
tools/build_reference.sh) and for vic-tpu, run both, and compare:

- wall-clock throughput (cell-steps/s) -> the measured BASELINE
- final prognostic state (layer moisture, SWE, node temperatures, Wdew)
  via the reference's ASCII state file, read back with vic-tpu's own
  StateIO-legacy reader -> numerical parity

Usage:
  python tools/oracle.py --cells 64 --days 365 --threads 8 \
      --binary /tmp/vicbuild/vicNl --workdir /tmp/oracle

The generated files use the reference grammar end-to-end (soil/veg/veglib
per read_soilparam.c / read_vegparam.c / read_veglib.c; ASCII forcings per
read_atmos_data.c), so vic-tpu ingests them through its own file readers —
the comparison covers the full input pipeline, not just the physics.
"""
import argparse
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

NL = 3
FORCE_TYPES = ["PREC", "AIR_TEMP", "WIND", "SHORTWAVE", "LONGWAVE",
               "PRESSURE", "VP"]
MTCLIM_TYPES = ["TMAX", "TMIN", "PREC", "WIND"]


DT_HOURS = 3
STEPS_PER_DAY = 24 // DT_HOURS


def synth_forcing(n_rec, n_cell, seed=0):
    """Sub-daily (3-hourly) forcing series with seasonal + diurnal cycles
    (PRESSURE/VP in kPa per the VIC ASCII forcing convention,
    initialize_atmos.c:287-299). The reference requires sub-daily AIR_TEMP
    when TMAX/TMIN are not supplied (initialize_atmos.c temperature check)."""
    rng = np.random.default_rng(seed)
    step = np.arange(n_rec)
    doy = (step // STEPS_PER_DAY) % 365
    hour = (step % STEPS_PER_DAY) * DT_HOURS
    season = np.sin(2.0 * np.pi * (doy - 80) / 365.0)
    diurnal = np.sin(2.0 * np.pi * (hour - 9) / 24.0)
    air = (8.0 + 12.0 * season + 5.0 * diurnal)[:, None] \
        + rng.normal(0, 1.5, (n_rec, n_cell))
    wet = rng.random((n_rec, n_cell)) < 0.12
    prec = np.where(wet, rng.gamma(2.0, 1.5, (n_rec, n_cell)), 0.0)
    wind = np.clip(rng.gamma(2.0, 1.2, (n_rec, n_cell)), 0.2, None)
    sw_day = np.clip(np.sin(2.0 * np.pi * (hour - 6) / 24.0), 0.0, None)
    sw = np.clip(((250 + 200 * season) * 2.0 * sw_day)[:, None]
                 + rng.normal(0, 15, (n_rec, n_cell)), 0.0, None)
    svp = 0.6108 * np.exp(17.27 * air / (237.3 + air))  # kPa
    vp = np.clip(svp * rng.uniform(0.4, 0.95, (n_rec, n_cell)), 0.05, None)
    lw = 1.24 * (10.0 * vp / (air + 273.15)) ** (1.0 / 7.0) \
        * 5.67e-8 * (air + 273.15) ** 4
    pressure = np.full((n_rec, n_cell), 95.5)            # kPa
    return dict(PREC=prec, AIR_TEMP=air, WIND=wind, SHORTWAVE=sw,
                LONGWAVE=lw, PRESSURE=pressure, VP=vp)


def write_inputs(workdir, n_cell, n_days, start=(1990, 1, 1), seed=0,
                 config="base"):
    """config selects the parity scenario (VERDICT round-1 item 3):
    base          FULL_ENERGY + QUICK_FLUX, supplied 3-hourly forcing
    frozen        FROZEN_SOIL + IMPLICIT finite-difference nodes
    bands         3 snow bands + a glacier HRU (surface_fluxes_glac path)
    dist          DIST_PRCP wet/dry columns
    mtclim        daily TMAX/TMIN/PREC -> MTCLIM + disaggregation on BOTH
                  sides, with non-zero longitudes and time_zone_lng=-120
                  (exercises the local-solar-time shift,
                  initialize_atmos.c:125-225)
    close         base + CLOSE_ENERGY: iterated canopy/atmosphere energy
                  balance. Compile-time in the reference (user_def.h:36) —
                  requires the CLOSE_ENERGY=TRUE oracle build
                  (tools/build_reference.sh -> /tmp/vicbuild_close/vicNl);
                  the CLOSE_ENERGY keyword in global.txt configures vic-tpu
                  and is warn-ignored by the C side
                  (get_global_param.c:931).
    lakes         base + LAKES: a lake/wetland tile per cell
                  (read_lakeparam.c grammar; lakes.eb.c energy/water budget)
    blowing       base + BLOWING snow sublimation (CalcBlowingSnow.c);
                  vegparam carries the sigma_slope/lag_one/fetch columns
    heavy         every expensive path at once, matching bench.py's heavy
                  variant: FROZEN_SOIL + IMPLICIT FD nodes + CLOSE_ENERGY +
                  DIST_PRCP + BLOWING + LAKES at 3-hourly steps.  Used with
                  --bench-only to measure the honest same-config C baseline
                  (requires the CLOSE_ENERGY=TRUE build).
    """
    n_rec = n_days * STEPS_PER_DAY
    os.makedirs(workdir, exist_ok=True)
    os.makedirs(os.path.join(workdir, "forcing"), exist_ok=True)
    # wipe stale results: the reference APPENDS to existing flux files
    # (make_in_and_outfiles.c "just open for appending"), so leftovers from
    # a previous run corrupt the comparison
    import shutil
    shutil.rmtree(os.path.join(workdir, "results"), ignore_errors=True)
    os.makedirs(os.path.join(workdir, "results"), exist_ok=True)

    lats = 48.0 + 0.25 * np.arange(n_cell)
    if config == "mtclim":
        # non-zero longitudes spanning +-4 h of local-solar offset around
        # the -120 deg time-zone center (removes the historical lng=0 dodge)
        lons = -120.0 + 60.0 * ((np.arange(n_cell) % 5) - 2) / 2.0
        off_gmt_h = -8.0   # HOURS in the soil file (read_soilparam.c:564,
        #                    1121: time_zone_lng = off_gmt*360/24 = -120 deg)
    else:
        # lng 0 with off_gmt 0 h => hour_offset 0 (initialize_atmos.c:125)
        lons = np.full(n_cell, 0.0)
        off_gmt_h = 0.0
    avg_temp = 2.0 if config in ("frozen", "bands", "heavy", "blowing") else 8.0
    fs_active = 1 if config in ("frozen", "heavy") else 0

    # ---- soil file (read_soilparam.c column order, glacier format) ----
    glacier_defaults = [0.85, 0.94, 0.58, 0.82, 0.46,   # albedo decay
                        -0.5, 0.5, 1.0, 1.0,            # rain/snow, PADJ
                        -6.5, 0.0, 200.0, 200.0,        # T_LAPSE PGRAD GLAC
                        0.01, 0.05, 2.0, 0.3, 0.002]    # KMIN DK A ALB ROUGH
    with open(os.path.join(workdir, "soil.txt"), "w") as f:
        for ci in range(n_cell):
            row = [1, ci + 1, lats[ci], lons[ci],
                   0.2, 0.01, 12.0, 0.8, 2.0]
            row += [8.0] * NL                       # expt
            row += [300.0] * NL                     # ksat
            row += [-99.0] * NL                     # phi_s
            row += [40.0, 120.0, 280.0]             # init_moist
            row += [500.0 + 10.0 * ci]              # elevation
            row += [0.1, 0.3, 1.0]                  # depth
            row += [avg_temp, 4.0]                  # avg_temp, dp
            row += [30.0] * NL                      # bubble
            row += [0.4] * NL                       # quartz
            row += [1400.0] * NL                    # bulk density (mineral)
            row += [2650.0] * NL                    # soil density
            row += [off_gmt_h]                      # off_gmt (HOURS)
            row += [0.6] * NL                       # Wcr fract
            row += [0.3] * NL                       # Wpwp fract
            row += [0.01, 0.0012, 800.0]            # rough snow_rough annprec
            row += [0.05] * NL                      # resid moist (fract)
            row += [fs_active]                      # FS_ACTIVE
            row += [15.0]                           # avgJulyAirTemp
            row += glacier_defaults
            f.write(" ".join(f"{v:g}" for v in row) + "\n")

    # ---- veg library (read_veglib.c: class overstory rarc rmin LAIx12
    # ALBx12 ROUGHx12 DISPx12 wind_h RGL rad_atten wind_atten trunk) ----
    with open(os.path.join(workdir, "veglib.txt"), "w") as f:
        lai = [1.5 + 1.0 * np.sin(2 * np.pi * (m - 3) / 12.0)
               for m in range(12)]
        row = [1, 0, 25.0, 100.0] + [f"{v:.3f}" for v in lai] \
            + [0.2] * 12 + [0.05] * 12 + [0.3] * 12 \
            + [10.0, 100.0, 0.5, 0.5, 0.2]
        f.write(" ".join(str(v) for v in row) + "\n")
        if config == "bands":
            # glacier class (vegClass == GLACIER_ID=2): bare-ice params
            row = [2, 0, 2.0, 0.0] + ["0.000"] * 12 \
                + [0.3] * 12 + [0.002] * 12 + [0.0] * 12 \
                + [10.0, 100.0, 0.5, 0.5, 0.0]
            f.write(" ".join(str(v) for v in row) + "\n")
        if config in ("close", "heavy"):
            # overstory conifer class — CLOSE_ENERGY's Tcanopy iteration
            # only engages for overstory tiles holding canopy snow
            # (surface_fluxes.c:598-604 'iter_snow.snow && overstory')
            lai_ev = [4.0] * 12
            row = [4, 1, 60.0, 250.0] + [f"{v:.3f}" for v in lai_ev] \
                + [0.12] * 12 + [1.2] * 12 + [8.0] * 12 \
                + [15.0, 30.0, 0.5, 0.6, 0.2]
            f.write(" ".join(str(v) for v in row) + "\n")
        if config in ("lakes", "heavy"):
            # a second grass-like class so the wetland tile (class 1 =
            # lake_idx) can be small: the reference's put_data lake
            # weighting (Cv*Clake over mm-per-lake-area fluxes) is only
            # self-consistent when the wetland Cv equals Cl[0]
            row = [3, 0, 30.0, 110.0] + [f"{v:.3f}" for v in lai] \
                + [0.22] * 12 + [0.06] * 12 + [0.35] * 12 \
                + [10.0, 100.0, 0.5, 0.5, 0.2]
            f.write(" ".join(str(v) for v in row) + "\n")

    # ---- veg param: one grass tile per cell, Cv=0.7, 2 root zones ----
    with open(os.path.join(workdir, "vegparam.txt"), "w") as f:
        for ci in range(n_cell):
            if config == "bands":
                # fully-specified PCIC mosaic: explicit bandIndex per tile
                # (read_vegparam.c:186), grass in every band + a glacier HRU
                # in the top band; Cv sums to 1 (no artificial bare soil)
                f.write(f"{ci + 1} 4\n")
                f.write("1 0.30 0.30 0.60 0.70 0.40 0\n")
                f.write("1 0.25 0.30 0.60 0.70 0.40 1\n")
                f.write("1 0.20 0.30 0.60 0.70 0.40 2\n")
                f.write("2 0.25 0.50 0.50 0.50 0.50 2\n")
            elif config == "close":
                # grass + overstory conifer (canopy snow -> atmos EB loop)
                f.write(f"{ci + 1} 2\n")
                f.write("1 0.40 0.30 0.60 0.70 0.40 0\n")
                f.write("4 0.40 0.50 0.50 0.50 0.50 0\n")
            elif config == "lakes":
                # wetland tile (class 1 == lake_idx) FIRST with Cv == Cl[0]
                # so the reference's Cv*Clake lake weighting is consistent
                # (and vic-tpu's leading-tile wetland stand-in matches)
                f.write(f"{ci + 1} 2\n")
                f.write("1 0.10 0.30 0.60 0.70 0.40 0\n")
                f.write("3 0.60 0.30 0.60 0.70 0.40 0\n")
            elif config == "heavy":
                # wetland tile + overstory conifer (canopy-snow Tcanopy
                # iteration) + grass; BLOWING adds sigma_slope/lag_one/fetch
                # columns before bandIndex (read_vegparam.c:172-186)
                f.write(f"{ci + 1} 3\n")
                f.write("1 0.10 0.30 0.60 0.70 0.40 1.0 0.9 2000.0 0\n")
                f.write("4 0.40 0.50 0.50 0.50 0.50 1.0 0.9 2000.0 0\n")
                f.write("3 0.30 0.30 0.60 0.70 0.40 1.0 0.9 2000.0 0\n")
            elif config == "blowing":
                # BLOWING adds sigma_slope/lag_one/fetch before bandIndex
                # (read_vegparam.c:172-186)
                f.write(f"{ci + 1} 1\n")
                f.write("1 0.70 0.30 0.60 0.70 0.40 1.0 0.9 2000.0 0\n")
            else:
                f.write(f"{ci + 1} 1\n")
                # PCIC tile line: class Cv (depth fract)*RZ bandIndex
                # (read_vegparam.c:185-186)
                f.write("1 0.70 0.30 0.60 0.70 0.40 0\n")

    # ---- lake parameter file (read_lakeparam.c:89-176): per cell one
    # header line  "gridcel lake_idx numnod mindepth wfrac depth_in
    # rpercent"  then (LAKE_PROFILE FALSE) one line "maxdepth Cl[0]" from
    # which the parabolic depth-area curve is computed ----
    if config in ("lakes", "heavy"):
        with open(os.path.join(workdir, "lakeparam.txt"), "w") as f:
            for ci in range(n_cell):
                f.write(f"{ci + 1} 1 5 0.25 0.02 2.0 0.10\n")
                f.write("5.0 0.10\n")

    # ---- snow band file (read_snowband.c): 3 bands for "bands" ----
    if config == "bands":
        with open(os.path.join(workdir, "snowband.txt"), "w") as f:
            for ci in range(n_cell):
                elev = 500.0 + 10.0 * ci
                # cell areafract*3 elev*3 (read_snowband.c fscanf stream:
                # no trailing columns — extra numbers would bleed into the
                # next cell's id)
                f.write(f"{ci + 1} 0.45 0.35 0.20 "
                        f"{elev - 200:.1f} {elev + 100:.1f} "
                        f"{elev + 500:.1f}\n")

    # ---- forcing files ----
    forc = synth_forcing(n_rec, n_cell, seed)
    if config == "mtclim":
        # daily TMAX/TMIN/PREC/WIND -> both sides run MTCLIM + disagg
        air = forc["AIR_TEMP"].reshape(n_days, STEPS_PER_DAY, n_cell)
        daily = dict(
            TMAX=air.max(1), TMIN=air.min(1),
            PREC=forc["PREC"].reshape(n_days, STEPS_PER_DAY, n_cell).sum(1),
            WIND=forc["WIND"].reshape(n_days, STEPS_PER_DAY, n_cell).mean(1))
        for ci in range(n_cell):
            path = os.path.join(workdir, "forcing",
                                f"full_data_{lats[ci]:.4f}_{lons[ci]:.4f}")
            cols = np.stack([daily[k][:, ci] for k in MTCLIM_TYPES], 1)
            np.savetxt(path, cols, fmt="%.4f")
        forc = daily
    else:
        for ci in range(n_cell):
            path = os.path.join(workdir, "forcing",
                                f"full_data_{lats[ci]:.4f}_{lons[ci]:.4f}")
            cols = np.stack([forc[k][:, ci] for k in FORCE_TYPES], 1)
            np.savetxt(path, cols, fmt="%.4f")

    # ---- global parameter file ----
    y0, m0, d0 = start
    end = _add_days(y0, m0, d0, n_days - 1)
    frozen = config in ("frozen", "heavy")
    g = f"""
NLAYER 3
NODES {5 if frozen else 3}
TIME_STEP 3
SNOW_STEP 3
STARTYEAR {y0}
STARTMONTH {m0:02d}
STARTDAY {d0:02d}
STARTHOUR 00
ENDYEAR {end[0]}
ENDMONTH {end[1]:02d}
ENDDAY {end[2]:02d}
FULL_ENERGY TRUE
FROZEN_SOIL {"TRUE" if frozen else "FALSE"}
QUICK_FLUX {"FALSE" if frozen else "TRUE"}
IMPLICIT {"TRUE" if frozen else "FALSE"}
DIST_PRCP {"TRUE" if config in ("dist", "heavy") else "FALSE"}
CORRPREC FALSE
BLOWING {"TRUE" if config in ("blowing", "heavy") else "FALSE"}
MIN_WIND_SPEED 0.1
MAX_SNOW_TEMP 0.5
MIN_RAIN_TEMP -0.5
CONTINUEONERROR FALSE
TFALLBACK TRUE
COMPUTE_TREELINE FALSE
JULY_TAVG_SUPPLIED TRUE
EQUAL_AREA FALSE
GRID_DECIMAL 4
RESOLUTION 0.25
GRND_FLUX_TYPE GF_410
PLAPSE TRUE
SNOW_ALBEDO USACE
SNOW_DENSITY DENS_BRAS
FORCING1 {workdir}/forcing/full_data_
FORCE_FORMAT ASCII
FORCE_DT {24 if config == "mtclim" else 3}
N_TYPES {len(MTCLIM_TYPES) if config == "mtclim" else 7}
""" + "".join(f"FORCE_TYPE {t}\n" for t in
              (MTCLIM_TYPES if config == "mtclim" else FORCE_TYPES)) + f"""
FORCEYEAR {y0}
FORCEMONTH {m0:02d}
FORCEDAY {d0:02d}
FORCEHOUR 00
WIND_H 10.0
MEASURE_H 2.0
ALMA_INPUT FALSE
SOIL {workdir}/soil.txt
VEGPARAM {workdir}/vegparam.txt
VEGPARAM_LAI FALSE
VEGLIB {workdir}/veglib.txt
ROOT_ZONES 2
SNOW_BAND {3 if config == "bands" else 1}{f" {workdir}/snowband.txt" if config == "bands" else ""}
GLACIER_ID {2 if config == "bands" else -1}{f"""
LAKES {workdir}/lakeparam.txt
LAKE_PROFILE FALSE""" if config in ("lakes", "heavy") else ""}{"""
CLOSE_ENERGY TRUE""" if config in ("close", "heavy") else ""}
RESULT_DIR {workdir}/results
OUT_STEP 0
SKIPYEAR 0
COMPRESS FALSE
OUTPUT_FORMAT ASCII
PARALLEL_THREADS 1
STATENAME {workdir}/results/state
STATEYEAR {end[0]}
STATEMONTH {end[1]:02d}
STATEDAY {end[2]:02d}
BINARY_STATE_FILE FALSE
"""
# NOTE: the reference's N_OUTFILES custom-output path is unusable here:
# parse_output_info() reallocates out_data_files through a BY-VALUE pointer
# (parse_output_info.c:63-67), so vicNl.c:139's pointer dangles — a genuine
# upstream use-after-free. We rely on the default output composition
# (set_output_defaults.c:108-165) instead.
    with open(os.path.join(workdir, "global.txt"), "w") as f:
        f.write(g)
    return forc, lats, lons


def _add_days(y, m, d, n):
    import datetime
    t = datetime.date(y, m, d) + datetime.timedelta(days=n)
    return t.year, t.month, t.day


def run_reference(workdir, binary, threads):
    gp_path = os.path.join(workdir, "global.txt")
    txt = re.sub(r"PARALLEL_THREADS \d+", f"PARALLEL_THREADS {threads}",
                 open(gp_path).read())
    run_path = os.path.join(workdir, f"global_t{threads}.txt")
    open(run_path, "w").write(txt)
    t0 = time.perf_counter()
    proc = subprocess.run([binary, "-g", run_path], capture_output=True,
                          text=True, timeout=3600)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        print(proc.stdout[-3000:])
        print(proc.stderr[-3000:])
        raise RuntimeError(f"reference binary failed rc={proc.returncode}")
    m = re.search(r"Model execution time \((serial|parallel)\): ([0-9.]+)",
                  proc.stderr + proc.stdout)
    model_time = float(m.group(2)) if m else wall
    return model_time, wall, proc.stderr


def run_vic_tpu(workdir, platform="cpu"):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    # persistent compile cache: the CPU compile of the full heavy program is
    # minutes-long; re-runs of the same scenario shape hit the cache
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "tests", ".jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from vic_tpu.config import parse_global_param_file
    from vic_tpu.driver import run_simulation, load_domain

    gp = parse_global_param_file(os.path.join(workdir, "global.txt"))
    gp.save_state = False   # final state compared in-memory (compare_state)
    domain = load_domain(gp)
    res = run_simulation(gp, domain=domain, write_output=False,
                         progress=False)
    return gp, res, domain


# prognostic ModelState fields compared against the reference's saved state
# (write_model_state.c:120-260 per-HRU sequence)
STATE_FIELDS = ["moist", "ice", "wdew", "snow_canopy", "swq", "surf_temp",
                "pack_temp", "surf_water", "pack_water", "density",
                "cold_content", "node_temp", "glac_water_storage"]


def compare_state(workdir, gp, res, domain, end_date):
    """Final-state interchange parity: the C binary's ASCII state file
    (write_model_state.c, saved after the last record) read back through
    vic-tpu's own legacy reader (io/state_legacy.py) and diffed against
    vic-tpu's in-memory final state. Proves the two sides' prognostic
    states are interchangeable, not merely that fluxes correlate."""
    from vic_tpu.io.state_legacy import load_state_legacy
    path = os.path.join(workdir, "results",
                        f"state_{end_date[0]:04d}-{end_date[1]:02d}-"
                        f"{end_date[2]:02d}")
    if not os.path.exists(path):
        print(f"state parity: reference state file missing ({path})")
        return None
    st_ref = load_state_legacy(path, gp, domain, res.final_state,
                               fmt="ASCII")
    rows = []
    for name in STATE_FIELDS:
        a = np.asarray(getattr(st_ref, name), float)
        b = np.asarray(getattr(res.final_state, name), float)
        if a.shape != b.shape:
            rows.append((name, float("nan"), float("nan"), float("nan")))
            continue
        d = np.abs(a - b)
        denom = np.maximum(np.abs(a).max(), 1e-10)
        rows.append((name, float(d.max()), float(d.max() / denom),
                     float(np.abs(a).mean())))
    return rows


# default full-energy fluxes file composition (set_output_defaults.c:108-140)
FLUX_COLS = ["OUT_PREC", "OUT_EVAP", "OUT_RUNOFF", "OUT_BASEFLOW",
             "OUT_WDEW"] + ["OUT_SOIL_LIQ"] * NL + [
    "OUT_RAD_TEMP", "OUT_NET_SHORT", "OUT_R_NET", "OUT_LATENT",
    "OUT_EVAP_CANOP", "OUT_TRANSP_VEG", "OUT_EVAP_BARE", "OUT_SUB_CANOP",
    "OUT_SUB_SNOW", "OUT_SENSIBLE", "OUT_GRND_FLUX", "OUT_DELTAH",
    "OUT_FUSION", "OUT_AERO_RESIST", "OUT_SURF_TEMP", "OUT_ALBEDO",
    "OUT_REL_HUMID", "OUT_IN_LONG", "OUT_AIR_TEMP", "OUT_WIND"]
# snow file composition (set_output_defaults.c:147-165)
SNOW_COLS = ["OUT_SWE", "OUT_SNOW_DEPTH", "OUT_SNOW_CANOPY",
             "OUT_SNOW_COVER", "OUT_ADVECTION", "OUT_DELTACC",
             "OUT_SNOW_FLUX", "OUT_RFRZ_ENERGY", "OUT_MELT_ENERGY",
             "OUT_ADV_SENS", "OUT_LATENT_SUB", "OUT_SNOW_SURF_TEMP",
             "OUT_SNOW_PACK_TEMP", "OUT_SNOW_MELT"]
# lake file composition (set_output_defaults.c:200-213)
LAKE_COLS = ["OUT_LAKE_ICE_TEMP", "OUT_LAKE_ICE_HEIGHT",
             "OUT_LAKE_ICE_FRACT", "OUT_LAKE_DEPTH", "OUT_LAKE_SURF_AREA",
             "OUT_LAKE_VOLUME", "OUT_LAKE_SURF_TEMP", "OUT_LAKE_EVAP"]
# variables compared (exist on both sides)
COMPARE = ["OUT_PREC", "OUT_EVAP", "OUT_RUNOFF", "OUT_BASEFLOW", "OUT_WDEW",
           "OUT_SOIL_LIQ", "OUT_NET_SHORT", "OUT_LATENT", "OUT_SENSIBLE",
           "OUT_GRND_FLUX", "OUT_SURF_TEMP", "OUT_ALBEDO", "OUT_AIR_TEMP",
           "OUT_SWE", "OUT_SNOW_DEPTH", "OUT_SNOW_MELT"]

# Upstream bug (verified by bisection on this host): when a glacier HRU
# exists (vegClass == GLACIER_ID), the reference's surface_fluxes_glac.c
# never writes hru.energy.Tsurf (grep: no assignment anywhere in the glacier
# call tree; the only writers are calc_surf_energy_bal.c:580 and the lake
# code), and energy_bal_struct has no constructor / no Tsurf init in
# initialize_model_state.c — so put_data.c:1019-1039 aggregates
# uninitialized heap memory into OUT_SURF_TEMP (a constant ~1e180 garbage
# value on this host) and OUT_RAD_TEMP = (Tsurf+273.15)^4 overflows to inf.
# Those two columns are meaningless for any run with a glacier HRU and are
# excluded from the bands comparison.
CONFIG_EXCLUDE = {
    "bands": {"OUT_SURF_TEMP", "OUT_RAD_TEMP"},
}
# extra variables compared per config (beyond COMPARE)
_LAKE_EXTRA = ["OUT_LAKE_DEPTH", "OUT_LAKE_VOLUME", "OUT_LAKE_SURF_AREA",
               "OUT_LAKE_ICE_FRACT", "OUT_LAKE_ICE_HEIGHT",
               "OUT_LAKE_SURF_TEMP", "OUT_LAKE_EVAP"]
CONFIG_EXTRA = {
    "lakes": _LAKE_EXTRA,
    # heavy = all features at once: the lake file is written too, and the
    # snow file gains the three BLOWING columns (set_output_defaults.c:165)
    "heavy": _LAKE_EXTRA + ["OUT_SUB_BLOWING", "OUT_SUB_SURFACE"],
    "blowing": ["OUT_SUB_BLOWING", "OUT_SUB_SURFACE", "OUT_SUB_SNOW"],
}


def compare_fluxes(workdir, gp, res, lats, lons, config="base"):
    """Time-series parity: reference per-cell ASCII fluxes vs vic-tpu
    aggregated outputs (the comparison role of
    tools/test script/vic_output_compare_netcdf_universal.py)."""
    ref = {}
    snow_cols = SNOW_COLS + (["OUT_SUB_BLOWING", "OUT_SUB_SURFACE",
                              "OUT_SUB_SNOW_B"]
                             if config in ("blowing", "heavy") else [])
    prefixes = [("fluxes", FLUX_COLS), ("snow", snow_cols)]
    if config in ("lakes", "heavy"):
        prefixes.append(("lake", LAKE_COLS))
    for ci, (la, lo) in enumerate(zip(lats, lons)):
        for prefix, cols in prefixes:
            path = os.path.join(workdir, "results",
                                f"{prefix}_{la:.4f}_{lo:.4f}")
            table = np.loadtxt(path)
            names = []
            for name in cols:   # expand repeated names into indexed lists
                ref.setdefault(name, {}).setdefault(ci, [])
            k = 4   # year month day hour
            for name in cols:
                ref[name][ci].append(table[:, k])
                k += 1
    # Layout sanity gate: OUT_PREC is an exact input echo on both sides, so
    # per-cell totals must agree to printed precision BEFORE any correlation
    # is trusted — catches fluxes-file column drift across configurations
    # (set_output_defaults.c composition changing under option flags).
    for ci in range(len(lats)):
        ref_tot = float(np.sum(ref["OUT_PREC"][ci]))
        tpu = np.asarray(res.outputs["OUT_PREC"], float)
        n = min(len(ref["OUT_PREC"][ci][0]), len(tpu))
        tpu_tot = float(np.sum(tpu[:n, ci]))
        if not np.isclose(ref_tot, tpu_tot, rtol=1e-3, atol=0.5):
            raise RuntimeError(
                f"layout sanity check failed: cell {ci} PREC totals "
                f"ref={ref_tot:.3f} vic-tpu={tpu_tot:.3f} — fluxes-file "
                f"column layout likely drifted for this configuration")
    rows = []
    excluded = CONFIG_EXCLUDE.get(config, set())
    for name in COMPARE + CONFIG_EXTRA.get(config, []):
        if name in excluded:
            continue
        a = np.stack([np.stack(ref[name][ci], -1)
                      for ci in range(len(lats))], 1)   # [t, cell, width]
        b = np.asarray(res.outputs[name], float)
        if name == "OUT_SNOW_MELT":
            # reference put_data.c:919 multiplies snow.melt (already mm,
            # solve_snow.c 2007-Jul-03 note) by 1000 again — compare against
            # the corrected value
            a = a / 1000.0
        if b.ndim == 2:
            b = b[..., None]
        n = min(len(a), len(b))
        a, b = a[:n], b[:n]
        diff = np.abs(a - b)
        denom = np.maximum(np.abs(a), 1.0)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1] \
            if a.std() > 0 and b.std() > 0 else 1.0
        rows.append((name, float(diff.max()), float((diff / denom).max()),
                     float(np.abs(a).mean()), float(np.abs(b).mean()),
                     float(corr)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("--days", type=int, default=365)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--binary", default="/tmp/vicbuild/vicNl")
    ap.add_argument("--workdir", default="/tmp/oracle")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for the vic-tpu run (cpu|axon)")
    ap.add_argument("--config", default="base",
                    choices=["base", "frozen", "bands", "dist", "mtclim",
                             "close", "lakes", "blowing", "heavy"])
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--bench-only", action="store_true",
                    help="time the C binary only (no vic-tpu run/parity)")
    args = ap.parse_args()
    if args.config in ("close", "heavy") and args.binary == "/tmp/vicbuild/vicNl":
        # CLOSE_ENERGY is compile-time upstream; use the dedicated build
        # (CLOSE_ENERGY=TRUE tools/build_reference.sh /tmp/vicbuild_close)
        args.binary = "/tmp/vicbuild_close/vicNl"

    print(f"generating inputs: {args.cells} cells x {args.days} days "
          f"[{args.config}]")
    _, lats, lons = write_inputs(args.workdir, args.cells, args.days,
                                 config=args.config)

    cs = args.cells * args.days * STEPS_PER_DAY
    for threads in sorted({1, args.threads}):
        mt, wall, _ = run_reference(args.workdir, args.binary, threads)
        print(f"reference C binary (threads={threads}): model {mt:.2f}s "
              f"(wall {wall:.2f}s) -> {cs / mt:,.0f} cell-steps/s")

    if args.bench_only:
        return

    t0 = time.perf_counter()
    gp, res, domain = run_vic_tpu(args.workdir, args.platform)
    print(f"vic-tpu ({args.platform}): {res.elapsed_s:.2f}s scan "
          f"({time.perf_counter() - t0:.1f}s total with ingest/compile) -> "
          f"{cs / res.elapsed_s:,.0f} cell-steps/s")

    if not args.skip_parity:
        rows = compare_fluxes(args.workdir, gp, res, lats, lons,
                              config=args.config)
        print("\nflux time-series parity (reference vs vic-tpu):")
        print(f"{'var':16s} {'max abs diff':>13s} {'max rel diff':>13s} "
              f"{'|ref| mean':>11s} {'|tpu| mean':>11s} {'corr':>7s}")
        for name, mad, mrd, am, bm, corr in rows:
            print(f"{name:16s} {mad:13.4f} {mrd:13.4%} {am:11.3f} "
                  f"{bm:11.3f} {corr:7.4f}")

        end = _add_days(1990, 1, 1, args.days - 1)
        srows = compare_state(args.workdir, gp, res, domain, end)
        if srows:
            print("\nfinal-state interchange parity (C ASCII state file -> "
                  "io/state_legacy reader vs vic-tpu final state):")
            print(f"{'field':20s} {'max abs diff':>13s} "
                  f"{'rel to |max|':>13s} {'|ref| mean':>11s}")
            for name, mad, rel, am in srows:
                print(f"{name:20s} {mad:13.6f} {rel:13.4%} {am:11.3f}")


if __name__ == "__main__":
    main()
