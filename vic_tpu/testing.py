"""Synthetic domain/forcing builders for tests and benchmarks.

Constructs physically plausible `Domain` pytrees and forcing streams without any
input files — the shapes and parameter ranges match what the reference's sample
mountain domains contain (soil params from read_soilparam.c ranges; a conifer +
open + glacier HRU mix; multi-band elevation cells).
"""
from __future__ import annotations

import numpy as np

from . import constants as c
from .config import GlobalParams
from .io.snowband import derive_band_factors
from .io.veg import LAI_WATER_FACTOR, _append_ref_surfaces
from .params import BandParams, Domain, HruParams, SoilParams, VegLib


def synthetic_veglib() -> VegLib:
    """Two veg classes: 1=conifer overstory, 2=short grass."""
    lai = np.array([
        [3.4, 3.4, 3.5, 3.7, 4.0, 4.4, 4.4, 4.2, 4.0, 3.7, 3.5, 3.4],
        [0.5, 0.5, 0.8, 1.2, 2.0, 2.6, 2.6, 2.2, 1.5, 0.9, 0.6, 0.5],
    ])
    return _append_ref_surfaces(VegLib(
        veg_class=np.array([1, 2], np.int32),
        overstory=np.array([True, False]),
        rarc=np.array([60.0, 25.0]),
        rmin=np.array([250.0, 150.0]),
        lai=lai,
        wdmax=LAI_WATER_FACTOR * lai,
        albedo=np.full((2, 12), 0.12) + np.array([[0.0], [0.08]]),
        roughness=np.stack([np.full(12, 1.2), np.full(12, 0.03)]),
        displacement=np.stack([np.full(12, 8.0), np.full(12, 0.2)]),
        wind_h=np.array([12.0, 2.0]),
        rgl=np.array([30.0, 100.0]),
        rad_atten=np.array([0.5, 0.0]),
        wind_atten=np.array([0.5, 0.0]),
        trunk_ratio=np.array([0.2, 0.0]),
    ))


def synthetic_soil(n_cell: int, n_layer: int = 3, seed: int = 0) -> SoilParams:
    rng = np.random.default_rng(seed)
    U = lambda lo, hi, *s: rng.uniform(lo, hi, (n_cell,) + tuple(s))
    depth = np.stack([np.full(n_cell, 0.1), U(0.3, 0.8), U(0.5, 2.0)], 1)[:, :n_layer]
    bulk_density = U(1200.0, 1500.0, n_layer)
    soil_density = np.full((n_cell, n_layer), 2685.0)
    porosity = 1.0 - bulk_density / soil_density
    max_moist = depth * porosity * 1000.0
    resid = np.full((n_cell, n_layer), 0.02)
    init_moist = 0.7 * max_moist
    b_infilt = U(0.1, 0.4)
    wcr_fract = np.full((n_cell, n_layer), 0.7 * 0.6)
    wpwp_fract = np.full((n_cell, n_layer), 0.3)
    lat = 51.0 + 0.125 * (np.arange(n_cell) % 16)
    lng = -116.0 - 0.125 * (np.arange(n_cell) // 16)
    elevation = U(800.0, 2500.0)
    max_infil = ((1.0 + b_infilt) * (max_moist[:, 0] + max_moist[:, 1])
                 if n_layer >= 3 else (1.0 + b_infilt) * max_moist[:, 0])
    g = lambda v: np.full(n_cell, v)
    return SoilParams(
        lat=lat, lng=lng, gridcel=np.arange(n_cell, dtype=np.int32),
        b_infilt=b_infilt, ds=U(0.001, 0.3), dsmax=U(5.0, 30.0),
        ws=U(0.7, 0.95), c_expt=g(2.0),
        expt=U(8.0, 14.0, n_layer), ksat=U(100.0, 1000.0, n_layer),
        phi_s=np.full((n_cell, n_layer), -999.0),
        init_moist=init_moist, elevation=elevation, depth=depth,
        avg_temp=U(-2.0, 8.0), dp=g(4.0),
        bubble=U(4.0, 30.0, n_layer), quartz=U(0.2, 0.7, n_layer),
        organic=np.zeros((n_cell, n_layer)),
        bulk_density=bulk_density, soil_density=soil_density,
        # time_zone_lng in DEGREES (read_soilparam.c): -120 = UTC-8, so the
        # local-solar-time offset vs lng~-116 rounds to 0 hours
        off_gmt=g(-120.0), rough=g(0.001), snow_rough=g(0.0005),
        annual_prec=U(300.0, 2000.0), resid_moist=resid,
        fs_active=np.ones(n_cell, bool),
        avg_july_air_temp=U(10.0, 18.0),
        porosity=porosity, max_moist=max_moist, max_infil=max_infil,
        wcr=wcr_fract * max_moist, wpwp=wpwp_fract * max_moist,
        cell_area=g(1.2e8),
        new_snow_alb=g(c.SNOW_NEW_SNOW_ALB),
        snow_alb_accum_a=g(c.SNOW_ALB_ACCUM_A),
        snow_alb_accum_b=g(c.SNOW_ALB_ACCUM_B),
        snow_alb_thaw_a=g(c.SNOW_ALB_THAW_A),
        snow_alb_thaw_b=g(c.SNOW_ALB_THAW_B),
        min_rain_temp=g(-0.5), max_snow_temp=g(0.5),
        padj_r=g(1.0), padj_s=g(1.0), t_lapse=g(6.5), pgrad=g(0.0),
        glac_surf_thick=g(100.0), glac_surf_we=g(91.7),
        glac_kmin=g(0.01), glac_dk=g(0.24), glac_a=g(20.0),
        glac_albedo=g(0.3), glac_rough=g(0.002),
        depth_full_snow_cover=g(0.1),
    )


def synthetic_domain(n_cell: int = 8, n_layer: int = 3, n_band: int = 1,
                     with_glacier: bool = False, seed: int = 0) -> Domain:
    """Domain with 2-3 HRUs per band: conifer (Cv 0.5), grass (0.3), bare (0.2),
    plus an optional glacier HRU carved out of the bare fraction."""
    rng = np.random.default_rng(seed + 1)
    soil = synthetic_soil(n_cell, n_layer, seed)
    veglib = synthetic_veglib()

    if n_band > 1:
        spread = np.linspace(-400.0, 400.0, n_band)
        band_elev = soil.elevation[:, None] + spread[None, :]
        area = np.full((n_cell, n_band), 1.0 / n_band)
        bands = derive_band_factors(soil, area, band_elev)
    else:
        bands = derive_band_factors(
            soil, np.ones((n_cell, 1)), soil.elevation[:, None].copy())

    tiles = [  # (veg_idx, cv, is_bare, is_glacier)
        (0, 0.5, False, False),
        (1, 0.3, False, False),
    ]
    if with_glacier:
        tiles.append((0, 0.1, False, True))   # glacier HRU (veg idx unused)
        tiles.append((0, 0.1, True, False))
    else:
        tiles.append((0, 0.2, True, False))

    n_tile = len(tiles)
    max_hru = n_tile * n_band
    shape = (n_cell, max_hru)
    mask = np.ones(shape, bool)
    veg_idx = np.zeros(shape, np.int32)
    cv = np.zeros(shape)
    band = np.zeros(shape, np.int32)
    is_glacier = np.zeros(shape, bool)
    is_bare = np.zeros(shape, bool)
    root = np.zeros(shape + (n_layer,))
    lai_vp = np.zeros(shape + (12,))
    hi = 0
    for ti, (vi, tcv, bare, glac) in enumerate(tiles):
        for b in range(n_band):
            veg_idx[:, hi] = vi
            cv[:, hi] = tcv
            band[:, hi] = b
            is_bare[:, hi] = bare
            is_glacier[:, hi] = glac
            root[:, hi] = np.array([0.3, 0.5, 0.2])[:n_layer] / \
                np.array([0.3, 0.5, 0.2])[:n_layer].sum()
            lai_vp[:, hi] = 0.0 if (bare or glac) else veglib.lai[vi]
            hi += 1

    hru = HruParams(mask=mask, veg_idx=veg_idx, cv=cv, band=band,
                    is_glacier=is_glacier, is_bare=is_bare, root=root,
                    lai_vegparam=lai_vp, wdmax=LAI_WATER_FACTOR * lai_vp,
                    sigma_slope=np.full(shape, 0.005),
                    lag_one=np.full(shape, 0.95), fetch=np.full(shape, 2500.0))
    return Domain(soil=soil, veglib=veglib, hru=hru, bands=bands)


def synthetic_forcing(n_rec: int, n_cell: int, dt_hours: int = 24, seed: int = 3,
                      start_doy: int = 1):
    """Daily (or sub-daily) met forcing dict of [n_rec, n_cell] arrays:
    prec (mm/step), air_temp (C), wind (m/s), plus sub-daily-ready fields
    shortwave (W/m^2), longwave (W/m^2), pressure (Pa), vp (Pa), density (kg/m^3).
    A smooth seasonal cycle + noise; physically consistent ranges."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_rec)[:, None] * (dt_hours / 24.0)
    doy = (start_doy - 1 + t) % 365.25
    season = np.cos(2 * np.pi * (doy - 200.0) / 365.25)
    air_temp = (2.0 + 12.0 * season
                + rng.normal(0, 2.5, (n_rec, n_cell)))
    prec = np.where(rng.random((n_rec, n_cell)) < 0.35,
                    rng.gamma(1.5, 4.0, (n_rec, n_cell)), 0.0) * (dt_hours / 24.0)
    wind = np.clip(rng.gamma(2.0, 1.3, (n_rec, n_cell)), 0.2, None)
    shortwave = np.clip(180.0 + 160.0 * season
                        + rng.normal(0, 30.0, (n_rec, n_cell)), 0.0, None)
    # vp below saturation
    svp = 610.78 * np.exp(17.269 * air_temp / (237.3 + air_temp))
    vp = np.clip(svp * rng.uniform(0.4, 0.95, (n_rec, n_cell)), 10.0, None)
    pressure = np.full((n_rec, n_cell), 85000.0)
    density = pressure / (287.0 * (273.15 + air_temp))
    longwave = 0.85 * 5.6696e-8 * (air_temp + 273.15) ** 4
    return {
        "prec": prec, "air_temp": air_temp, "wind": wind,
        "shortwave": shortwave, "longwave": longwave,
        "pressure": pressure, "vp": vp, "density": density,
    }
