"""Prognostic model state as a single dense pytree.

The reference scatters state across per-cell `HRU` objects
(/root/reference/vicNl_def.h:1374-1399: `cell[2]` layers, `snow_data_struct`,
`energy_bal_struct`, `veg_var`, `glac_data_struct`). Here the whole domain's
prognostic state is one pytree of `[n_cell, max_hru, ...]` arrays — the scan
carry for `lax.scan` over time and the checkpoint unit for orbax.
"""
from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np


def _pytreeify(cls):
    flds = [f.name for f in fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in flds), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytreeify
@dataclass
class ModelState:
    """All prognostic variables. Shapes: [n_cell, max_hru] unless noted."""
    # soil water (layer_data_struct). With DIST_PRCP the reference keeps TWO
    # columns per HRU, cell[WET]/cell[DRY] (vicNl_def.h:1374-1388); here the
    # base fields are the WET lane and *_dry the DRY lane (inert, equal to
    # the wet lane, when DIST_PRCP is off and mu==1).
    moist: jnp.ndarray        # [c, h, n_layer] total layer moisture, mm (WET)
    ice: jnp.ndarray          # [c, h, n_layer] frozen layer moisture, mm (WET)
    moist_dry: jnp.ndarray    # [c, h, n_layer] DRY-fraction layer moisture, mm
    ice_dry: jnp.ndarray      # [c, h, n_layer] DRY-fraction frozen moisture, mm
    # canopy (veg_var_struct)
    wdew: jnp.ndarray         # canopy interception storage, mm (WET lane)
    wdew_dry: jnp.ndarray     # DRY-fraction canopy storage, mm
    snow_canopy: jnp.ndarray  # canopy-intercepted snow, m
    # snowpack (snow_data_struct; internal units m of water)
    swq: jnp.ndarray
    surf_temp: jnp.ndarray
    pack_temp: jnp.ndarray
    surf_water: jnp.ndarray
    pack_water: jnp.ndarray
    density: jnp.ndarray      # kg/m^3
    depth: jnp.ndarray        # m
    albedo: jnp.ndarray
    last_snow: jnp.ndarray    # int32 steps since last snowfall
    melting: jnp.ndarray      # bool
    coverage: jnp.ndarray
    cold_content: jnp.ndarray  # J/m^2 surface-layer cold content
    snow_flag: jnp.ndarray    # bool: snow present during step
    # SPATIAL_SNOW depletion-curve memory (calc_snow_coverage.c;
    # snow_data_struct fields vicNl_def.h:1232-1246)
    snow_store_snow: jnp.ndarray     # bool: new accumulation stored on top
    snow_store_swq: jnp.ndarray      # m: stored new snow over old distribution
    snow_max_swq: jnp.ndarray        # m: last max swq of current melt period
    snow_swq_slope: jnp.ndarray      # m/fract: uniform distribution slope
    snow_store_coverage: jnp.ndarray  # coverage buried under stored new snow
    # energy (energy_bal_struct)
    node_temp: jnp.ndarray    # [c, h, n_node] soil node temperatures, C
    tfoliage: jnp.ndarray
    # upward longwave from the understory surface (energy->LongUnderOut,
    # calc_surf_energy_bal.c:575): the canopy-snow EB's below-canopy LW
    # input for the NEXT evaluation (solve_snow.c:228). Initialized to
    # sigma*(T[0]+KELVIN)^4 (initialize_model_state.c:291-293) and NOT part
    # of the reference state file (re-derived on warm start).
    long_under_out: jnp.ndarray     # [c,h] W/m^2
    # glacier (glac_data_struct)
    glac_water_storage: jnp.ndarray
    glac_cum_mass_balance: jnp.ndarray
    glac_surf_temp: jnp.ndarray
    # fallback counters (FallBackStats)
    surf_temp_fbcount: jnp.ndarray  # int32
    snow_temp_fbcount: jnp.ndarray  # int32
    # distributed-precipitation storm tracking (dist_prec.c; HRU.mu)
    mu: jnp.ndarray                 # [c,h] wet fraction
    still_storm: jnp.ndarray        # [c,h] bool
    dry_time: jnp.ndarray           # [c,h] int32 hours since storm paused
    # CONTINUEONERROR cell validity (vicNl.c:521,545-558): cells whose
    # solution goes non-finite are frozen and skipped for the rest of the run
    cell_valid: jnp.ndarray         # [c] bool
    # lake (lake_var_struct + its snow_data_struct), per cell
    lake_volume: jnp.ndarray        # [c] m^3
    lake_temp: jnp.ndarray          # [c, MAX_LAKE_NODES] C
    lake_ice_we: jnp.ndarray        # [c] m^3 water equivalent
    lake_ice_area: jnp.ndarray      # [c] m^2 (areai)
    lake_ice_height: jnp.ndarray    # [c] m (hice)
    lake_swe: jnp.ndarray           # [c] m over lake area (snow.swq)
    lake_tempi: jnp.ndarray         # [c] C ice/snow surface temperature
    lake_snow_surf_temp: jnp.ndarray   # [c] C
    lake_snow_pack_temp: jnp.ndarray   # [c] C
    lake_snow_surf_water: jnp.ndarray  # [c] m over lake area
    lake_snow_pack_water: jnp.ndarray  # [c] m over lake area
    lake_salbedo: jnp.ndarray       # [c] snow albedo state
    lake_last_snow: jnp.ndarray     # [c] float steps since snowfall
    lake_melting: jnp.ndarray       # [c] bool


def initial_state(domain, gp, surf_temp_init=None, dtype=jnp.float32,
                  lake_params=None, geom=None) -> ModelState:
    """Cold-start state (initialize_model_state.c).

    surf_temp_init: initial surface temperature per cell. The reference uses
    the FIRST-STEP AIR TEMPERATURE clamped to >= -1 C
    (initialize_model_state.c:138-147), NOT the annual average — the deep
    node's thermal inertia makes this matter for months. Callers with
    forcing in hand (the driver) must pass it; the avg_temp default is a
    fallback for synthetic tests.

    Node temperatures: QUICK_FLUX -> [surf, surf, avg_temp]
    (initialize_model_state.c:520-524); finite-difference -> the reference's
    exponential profile T(z) = avg + (surf - avg)*exp(-Zsum) via `geom`
    (initialize_model_state.c:553-585 exp_interp — note the reference's
    exp_interp ignores dp, modify_Ksat.c:11-13)."""
    n_cell, max_hru = domain.hru.mask.shape
    nl = domain.soil.depth.shape[1]
    n_node = max(gp.nnode, 3)
    sh = (n_cell, max_hru)

    Z = lambda *s: jnp.zeros(sh + s, dtype)
    moist = jnp.broadcast_to(
        jnp.asarray(domain.soil.init_moist, dtype)[:, None, :],
        sh + (nl,)).copy()

    if surf_temp_init is None:
        surf_temp_init = jnp.asarray(domain.soil.avg_temp, dtype)
    else:
        # clamp like the reference (initialize_model_state.c:147)
        surf_temp_init = jnp.maximum(
            jnp.asarray(surf_temp_init, dtype), -1.0)
    t_surf = jnp.broadcast_to(surf_temp_init[:, None], sh)
    avg = jnp.asarray(domain.soil.avg_temp, dtype)
    t_bot = jnp.broadcast_to(avg[:, None], sh)
    fd_nodes = gp.frozen_soil and not gp.quick_flux and geom is not None
    if fd_nodes:
        # T(z) = avg + (surf-avg)*exp(-z); surface exact, bottom = avg
        zsum = jnp.asarray(geom.zsum, dtype)[:, None, :]     # [c,1,nn]
        prof = (avg[:, None, None]
                + (t_surf[..., None] - avg[:, None, None])
                * jnp.exp(-zsum))
        node_temp = prof.at[..., -1].set(t_bot)
    else:
        node_temp = jnp.concatenate(
            [t_surf[..., None], t_surf[..., None],
             jnp.repeat(t_bot[..., None], n_node - 2, axis=-1)], axis=-1)

    from .constants import MAX_LAKE_NODES
    if lake_params is not None:
        from .physics.lake import initial_lake_state
        ls = initial_lake_state(lake_params, domain.soil.avg_temp)
        lake = dict(lake_volume=ls.volume, lake_temp=ls.temp,
                    lake_ice_we=ls.ice_water_eq, lake_ice_area=ls.ice_area,
                    lake_ice_height=ls.ice_height, lake_swe=ls.swe,
                    lake_tempi=ls.tempi, lake_snow_surf_temp=ls.surf_temp,
                    lake_snow_pack_temp=ls.pack_temp,
                    lake_snow_surf_water=ls.surf_water,
                    lake_snow_pack_water=ls.pack_water,
                    lake_salbedo=ls.salbedo, lake_last_snow=ls.last_snow,
                    lake_melting=ls.melting)
    else:
        zc = jnp.zeros((n_cell,), dtype)
        lake = dict(lake_volume=zc,
                    lake_temp=jnp.zeros((n_cell, MAX_LAKE_NODES), dtype),
                    lake_ice_we=zc, lake_ice_area=zc, lake_ice_height=zc,
                    lake_swe=zc, lake_tempi=zc, lake_snow_surf_temp=zc,
                    lake_snow_pack_temp=zc, lake_snow_surf_water=zc,
                    lake_snow_pack_water=zc, lake_salbedo=zc,
                    lake_last_snow=zc,
                    lake_melting=jnp.zeros((n_cell,), bool))

    # initial layer ice from the cold-start node profile
    # (initialize_model_state.c:927 estimate_layer_ice_content with the
    # initial energy.T): a frozen cold start must begin with its layer
    # water already partitioned into ice, or the first winter's fusion /
    # thermal properties / transpiration stress are all wrong
    ice_init = Z(nl)
    if fd_nodes and gp.frozen_soil:
        from .physics.frozen_soil import estimate_layer_ice
        _, ice_init = estimate_layer_ice(
            node_temp, moist, geom, domain.soil, frozen=True,
            frost_subareas=(gp.frost_subareas if gp.spatial_frost else 1),
            frost_slope=gp.frost_slope)
        ice_init = ice_init.astype(dtype)

    return ModelState(
        moist=moist, ice=ice_init, moist_dry=moist, ice_dry=ice_init,
        wdew=Z(), wdew_dry=Z(), snow_canopy=Z(),
        swq=Z(), surf_temp=Z(), pack_temp=Z(), surf_water=Z(), pack_water=Z(),
        density=Z(), depth=Z(), albedo=Z(),
        last_snow=jnp.zeros(sh, jnp.int32),
        melting=jnp.zeros(sh, bool), coverage=Z(), cold_content=Z(),
        snow_flag=jnp.zeros(sh, bool),
        # initialize_snow.c:64-82: store_snow=FALSE, store_coverage=0
        snow_store_snow=jnp.zeros(sh, bool), snow_store_swq=Z(),
        snow_max_swq=Z(), snow_swq_slope=Z(),
        snow_store_coverage=Z(),
        node_temp=node_temp, tfoliage=Z(),
        # sigma*(T[0]+KELVIN)^4 (initialize_model_state.c:291-293)
        long_under_out=(5.6696e-8
                        * (node_temp[..., 0] + 273.15) ** 4).astype(dtype),
        glac_water_storage=Z(), glac_cum_mass_balance=Z(), glac_surf_temp=Z(),
        surf_temp_fbcount=jnp.zeros(sh, jnp.int32),
        snow_temp_fbcount=jnp.zeros(sh, jnp.int32),
        mu=jnp.ones(sh, dtype), still_storm=jnp.zeros(sh, bool),
        dry_time=jnp.full(sh, 24, jnp.int32),
        cell_valid=jnp.ones((n_cell,), bool),
        **lake,
    )
