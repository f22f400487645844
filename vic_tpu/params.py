"""Frozen parameter pytrees for vic-tpu.

The reference threads `soil_con_struct` / `veg_lib_struct` / per-HRU `veg_con`
pointers through every call (/root/reference/vicNl_def.h:826-1030). Here all static
parameters are dense device arrays:

- `SoilParams` — per-cell `[n_cell]` / `[n_cell, n_layer]` arrays, including every
  derived quantity the reference computes at read time (read_soilparam.c:890-1245,
  SURVEY.md A.2).
- `VegLib` — per-veg-class `[n_class(, 12)]` arrays (read_veglib.c:46-135) with the
  four PET reference surfaces appended, as the reference appends them.
- `HruParams` — the HRU mosaic as padded `[n_cell, max_hru]` arrays with a validity
  mask: veg class gather index, area fraction Cv, band index, glacier/bare flags,
  per-layer root fractions (calc_root_fraction.c semantics).
- `BandParams` — `[n_cell, n_band]` elevation-band area/elevation/Tfactor/Pfactor
  (read_snowband.c:66-117).

Everything is plain numpy here (host-side); `jax.device_put` with a cell-sharded
NamedSharding moves them to the mesh.
"""
from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Optional

import numpy as np

from . import constants as c


def _pytreeify(cls):
    """Register a dataclass of arrays as a JAX pytree (arrays = leaves)."""
    import jax
    flds = [f.name for f in fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in flds), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytreeify
@dataclass
class SoilParams:
    """Per-cell soil/terrain parameters. Shapes: scalar fields [n_cell],
    layered fields [n_cell, n_layer]."""
    lat: np.ndarray
    lng: np.ndarray
    gridcel: np.ndarray
    b_infilt: np.ndarray
    ds: np.ndarray            # ARNO Ds
    dsmax: np.ndarray         # ARNO Dsmax (mm/day)
    ws: np.ndarray            # ARNO Ws
    c_expt: np.ndarray        # ARNO curve exponent
    expt: np.ndarray          # [n_cell, n_layer] Campbell exponent
    ksat: np.ndarray          # [n_cell, n_layer] mm/day
    phi_s: np.ndarray         # [n_cell, n_layer]
    init_moist: np.ndarray    # [n_cell, n_layer] mm
    elevation: np.ndarray     # m
    depth: np.ndarray         # [n_cell, n_layer] m
    avg_temp: np.ndarray      # C
    dp: np.ndarray            # damping depth m
    bubble: np.ndarray        # [n_cell, n_layer] cm
    quartz: np.ndarray        # [n_cell, n_layer]
    organic: np.ndarray       # [n_cell, n_layer]
    bulk_density: np.ndarray  # [n_cell, n_layer] combined (read_soilparam.c:896)
    soil_density: np.ndarray  # [n_cell, n_layer]
    off_gmt: np.ndarray       # time_zone_lng, DEGREES (read_soilparam.c:33)
    rough: np.ndarray         # m
    snow_rough: np.ndarray    # m
    annual_prec: np.ndarray   # mm
    resid_moist: np.ndarray   # [n_cell, n_layer] fraction
    fs_active: np.ndarray     # bool: frozen-soil active per cell
    avg_july_air_temp: np.ndarray
    # derived (read_soilparam.c:890-1245)
    porosity: np.ndarray      # [n_cell, n_layer]
    max_moist: np.ndarray     # [n_cell, n_layer] mm
    max_infil: np.ndarray
    wcr: np.ndarray           # [n_cell, n_layer] mm
    wpwp: np.ndarray          # [n_cell, n_layer] mm
    cell_area: np.ndarray     # m^2
    # PCIC glacier/snow-albedo per-cell params (read_soilparam.c:56-75)
    new_snow_alb: np.ndarray
    snow_alb_accum_a: np.ndarray
    snow_alb_accum_b: np.ndarray
    snow_alb_thaw_a: np.ndarray
    snow_alb_thaw_b: np.ndarray
    min_rain_temp: np.ndarray
    max_snow_temp: np.ndarray
    padj_r: np.ndarray
    padj_s: np.ndarray
    t_lapse: np.ndarray       # C/km
    pgrad: np.ndarray         # 1/km
    glac_surf_thick: np.ndarray
    glac_surf_we: np.ndarray
    glac_kmin: np.ndarray
    glac_dk: np.ndarray
    glac_a: np.ndarray
    glac_albedo: np.ndarray
    glac_rough: np.ndarray
    depth_full_snow_cover: np.ndarray  # m (SPATIAL_SNOW; read_soilparam.c:52)

    @property
    def n_cell(self) -> int:
        return self.lat.shape[0]

    @property
    def n_layer(self) -> int:
        return self.depth.shape[1]


@_pytreeify
@dataclass
class VegLib:
    """Vegetation library, one row per veg class (+4 appended PET reference
    surfaces, read_veglib.c:118-135). Shapes [n_class] or [n_class, 12]."""
    veg_class: np.ndarray     # library id
    overstory: np.ndarray     # bool
    rarc: np.ndarray          # s/m architectural resistance
    rmin: np.ndarray          # s/m minimum stomatal resistance
    lai: np.ndarray           # [n_class, 12]
    wdmax: np.ndarray         # [n_class, 12] = LAI_WATER_FACTOR * LAI
    albedo: np.ndarray        # [n_class, 12]
    roughness: np.ndarray     # [n_class, 12] m
    displacement: np.ndarray  # [n_class, 12] m
    wind_h: np.ndarray        # m
    rgl: np.ndarray           # W/m^2
    rad_atten: np.ndarray
    wind_atten: np.ndarray
    trunk_ratio: np.ndarray

    @property
    def n_class(self) -> int:
        return self.veg_class.shape[0]


@_pytreeify
@dataclass
class HruParams:
    """The HRU mosaic: padded [n_cell, max_hru] arrays + validity mask.

    An HRU is one (veg tile x elevation band) as constructed by read_vegparam.c
    (tiles replicated across SNOW_BAND bands, read_vegparam.c:220-260; artificial
    bare-soil HRUs appended so sum(Cv)=1, read_vegparam.c:313-339)."""
    mask: np.ndarray          # [n_cell, max_hru] bool — HRU exists
    veg_idx: np.ndarray       # [n_cell, max_hru] int32 gather index into VegLib rows
    cv: np.ndarray            # [n_cell, max_hru] area fraction of the veg tile
    band: np.ndarray          # [n_cell, max_hru] int32 elevation band index
    is_glacier: np.ndarray    # [n_cell, max_hru] bool
    is_bare: np.ndarray       # [n_cell, max_hru] bool (incl. artificial bare soil)
    root: np.ndarray          # [n_cell, max_hru, n_layer] root fraction per layer
    lai_vegparam: np.ndarray  # [n_cell, max_hru, 12] per-HRU LAI override (or veglib copy)
    wdmax: np.ndarray         # [n_cell, max_hru, 12]
    # blowing-snow params (read_vegparam.c:113-116)
    sigma_slope: np.ndarray   # [n_cell, max_hru]
    lag_one: np.ndarray
    fetch: np.ndarray
    # True where the HRU's band came from an explicit PCIC bandIndex column
    # (read_vegparam.c:233): its cv IS the cell-area fraction and put_data
    # weights it by Cv alone (put_data.c:789 — no AreaFract factor).  False
    # for classic 4.1.2-style tiles replicated across all bands, whose cell
    # share is cv * AreaFract[band].
    band_explicit: np.ndarray = None  # [n_cell, max_hru] bool

    @property
    def max_hru(self) -> int:
        return self.mask.shape[1]


@_pytreeify
@dataclass
class BandParams:
    """Elevation snow bands [n_cell, n_band] (read_snowband.c:60-117)."""
    area_fract: np.ndarray
    band_elev: np.ndarray
    tfactor: np.ndarray   # additive air-temp lapse per band (C)
    pfactor: np.ndarray   # precip gradient multiplier per band


def compute_root_fractions(zone_depth: np.ndarray, zone_fract: np.ndarray,
                           layer_depth: np.ndarray) -> np.ndarray:
    """Distribute root-zone fractions onto soil layers.

    Same contract as the reference (calc_root_fraction.c: roots linearly
    distributed within each zone), expressed as a piecewise-linear cumulative
    root distribution evaluated at layer boundaries:
      root[l] = CDF(bottom_l) - CDF(top_l); mass below the column goes to the
      bottom layer; fractions < 1e-4 zeroed; result normalized to sum 1.

    zone_depth, zone_fract: [n_zone]; layer_depth: [n_layer]. Returns [n_layer].
    """
    zone_depth = np.asarray(zone_depth, np.float64)
    zone_fract = np.asarray(zone_fract, np.float64)
    layer_depth = np.asarray(layer_depth, np.float64)
    zb = np.concatenate([[0.0], np.cumsum(zone_depth)])   # zone boundaries
    cf = np.concatenate([[0.0], np.cumsum(zone_fract)])   # cumulative fraction

    def cdf(z):
        return np.interp(z, zb, cf)

    lb = np.concatenate([[0.0], np.cumsum(layer_depth)])
    root = cdf(lb[1:]) - cdf(lb[:-1])
    # everything below the soil column accrues to the bottom layer
    root[-1] += cf[-1] - cdf(lb[-1])
    root[root < 1.0e-4] = 0.0
    s = root.sum()
    if s <= 0:
        raise ValueError("root fractions sum to zero")
    return root / s


@dataclass
class Domain:
    """Everything static about a run domain, host-side."""
    soil: SoilParams
    veglib: VegLib
    hru: HruParams
    bands: BandParams
    cell_valid: np.ndarray = None  # [n_cell] bool (CONTINUEONERROR mask)

    def __post_init__(self):
        if self.cell_valid is None:
            self.cell_valid = np.ones(self.soil.n_cell, bool)

    @property
    def n_cell(self) -> int:
        return self.soil.n_cell

    @property
    def max_hru(self) -> int:
        return self.hru.max_hru
