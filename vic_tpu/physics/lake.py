"""Lake / wetland model: multi-layer lake temperature, ice, and water balance.

Batched re-expression of the reference lake component
(/root/reference/lakes.eb.c, initialize_lake.c, LAKE.h):
- lake basin geometry: piecewise-linear depth-area profile with trapezoidal
  volumes (initialize_lake.c get_depth/get_sarea/get_volume:335-470);
- water density / freezing point (calc_density:800, rhoinit:1323);
- wind-driven eddy diffusivity with Richardson damping (eddy:837, Hostetler
  formulation; molecular background DM);
- layer temperature update: surface energy balance on the top layer (SW/LW/
  sensible/latent) + implicit vertical diffusion via the batched Thomas solver
  (water_energy_balance:47 re-expressed implicitly), SW attenuation with depth;
- convective mixing: density-instability sweeps (tracer_mixer:296);
- ice formation when layers supercool (iceform:971) and surface melt of ice
  using the two-pass 0C pattern (lakeice:1153 / ice_melt.c);
- water balance: inflow from cell runoff/baseflow, evaporation cap, ARNO
  baseflow out of the lake bed, broad-crested-weir outflow above mindepth
  (water_balance:1870, outflow weir at :2100: Q = 1.6*wfrac*circumference*
  (depth-mindepth)^1.5 per second).

All state arrays are [n_cell] (one lake per cell, matching the reference) with
a fixed MAX_LAKE_NODES layer axis.
"""
from __future__ import annotations

from dataclasses import dataclass, fields
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from .evap import penman, svp

MAX_LAKE_NODES = c.MAX_LAKE_NODES
DM = 1.38889e-07    # molecular diffusivity of water (LAKE.h)
RHOICE = 917.0
COND_WATER = 0.6    # thermal conductivity of water W/m/K
COND_ICE = 2.1


def _pytreeify(cls):
    flds = [f.name for f in fields(cls)]
    jax.tree_util.register_pytree_node(
        cls, lambda o: (tuple(getattr(o, n) for n in flds), None),
        lambda _, ch: cls(*ch))
    return cls


@_pytreeify
@dataclass
class LakeParams:
    """Per-cell lake configuration (lake_con_struct, LAKE.h; read_lakeparam.c).
    z/basin: node depth (m above lake bottom) and area (m^2) profiles,
    index 0 = lake surface at max depth, padded to MAX_LAKE_NODES+1."""
    has_lake: np.ndarray      # [c] bool
    numnod: np.ndarray        # [c] int32 active profile nodes
    z: np.ndarray             # [c, NN+1]
    basin: np.ndarray         # [c, NN+1]
    mindepth: np.ndarray      # [c] outflow sill depth (m)
    minvolume: np.ndarray     # [c]
    maxvolume: np.ndarray     # [c]
    maxdepth: np.ndarray      # [c]
    wfrac: np.ndarray         # [c] weir width fraction of circumference
    depth_in: np.ndarray      # [c] initial depth
    rpercent: np.ndarray      # [c] fraction of cell runoff routed into lake
    cl0: np.ndarray           # [c] max lake area fraction of cell


@_pytreeify
@dataclass
class LakeState:
    """Prognostic lake state (lake_var_struct)."""
    volume: jnp.ndarray       # [c] m^3 total (incl. ice water equivalent)
    temp: jnp.ndarray         # [c, NN] layer temperatures
    ice_water_eq: jnp.ndarray  # [c] m^3
    ice_area: jnp.ndarray     # [c] m^2
    ice_height: jnp.ndarray   # [c] m
    swe: jnp.ndarray          # [c] m snow on ice (water equivalent over ice area)


def make_lake_params(soil, gp, depth_in=None, frac=0.1) -> LakeParams:
    """Synthetic parabolic-basin defaults when no lake param file is supplied
    (testing / sample domains). depth_in: initial depth (m)."""
    n_cell = soil.n_cell
    NN = MAX_LAKE_NODES
    maxdepth = np.full(n_cell, 10.0)
    area0 = np.asarray(soil.cell_area) * frac
    z = np.zeros((n_cell, NN + 1))
    basin = np.zeros((n_cell, NN + 1))
    nn = np.full(n_cell, NN, np.int32)
    for k in range(NN + 1):
        fracz = 1.0 - k / NN
        z[:, k] = maxdepth * fracz
        basin[:, k] = area0 * fracz  # linear area taper to a point
    basin[:, NN] = 0.0
    vol = np.zeros(n_cell)
    for k in range(NN):
        vol += (z[:, k] - z[:, k + 1]) * (basin[:, k] + basin[:, k + 1]) / 2.0
    return LakeParams(
        has_lake=np.ones(n_cell, bool), numnod=nn, z=z, basin=basin,
        mindepth=maxdepth * 0.5, minvolume=vol * 0.05, maxvolume=vol,
        maxdepth=maxdepth, wfrac=np.full(n_cell, 0.01),
        depth_in=(np.full(n_cell, depth_in) if depth_in is not None
                  else maxdepth * 0.7),
        rpercent=np.full(n_cell, 0.5), cl0=np.full(n_cell, frac))


def volume_from_depth(lp: LakeParams, depth):
    """Trapezoidal volume below `depth` (get_volume, initialize_lake.c:370)."""
    z = lp.z
    b = lp.basin
    # area at the free surface
    a_surf = area_from_depth(lp, depth)
    # full sub-layers below the surface
    z_top = z[..., :-1]
    z_bot = z[..., 1:]
    layer_vol = (z_top - z_bot) * (b[..., :-1] + b[..., 1:]) / 2.0
    # layer fully submerged when depth >= z_top
    full = depth[..., None] >= z_top
    vol_full = jnp.where(full, layer_vol, 0.0).sum(-1)
    # partial layer: surface inside (z_bot, z_top)
    partial = jnp.logical_and(depth[..., None] > z_bot,
                              depth[..., None] < z_top)
    h = jnp.clip(depth[..., None] - z_bot, 0.0, None)
    vol_part = jnp.where(partial, h * (a_surf[..., None] + b[..., 1:]) / 2.0,
                         0.0).sum(-1)
    return vol_full + vol_part


def area_from_depth(lp: LakeParams, depth):
    """Piecewise-linear surface area at water depth (get_sarea)."""
    z = lp.z
    b = lp.basin
    z_top = z[..., :-1]
    z_bot = z[..., 1:]
    inlayer = jnp.logical_and(depth[..., None] <= z_top,
                              depth[..., None] > z_bot)
    w = (depth[..., None] - z_bot) / jnp.maximum(z_top - z_bot, 1e-10)
    a = b[..., 1:] + w * (b[..., :-1] - b[..., 1:])
    area = jnp.where(inlayer, a, 0.0).sum(-1)
    area = jnp.where(depth[..., 0:1].squeeze(-1) * 0 + depth >= z[..., 0],
                     b[..., 0], area)
    return jnp.where(depth <= 0.0, 0.0, area)


def depth_from_volume(lp: LakeParams, volume, n_iter: int = 30):
    """Invert volume -> depth by bisection on the monotone volume curve
    (get_depth, initialize_lake.c:412)."""
    lo = jnp.zeros_like(volume)
    hi = lp.maxdepth * jnp.ones_like(volume)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        v = volume_from_depth(lp, mid)
        high = v > volume
        return jnp.where(high, lo, mid), jnp.where(high, mid, hi)

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    d = 0.5 * (lo + hi)
    return jnp.where(volume <= 0.0, 0.0, d)


def water_density(t):
    """Density anomaly vs 1000 kg/m^3 (calc_density:800)."""
    return (999.842594 + 6.793952e-2 * t - 9.095290e-3 * t ** 2
            + 1.001685e-4 * t ** 3 - 1.120083e-6 * t ** 4
            + 6.536332e-9 * t ** 5) - 1000.0


def freezing_point(depth_pressure_m=0.0):
    """Freezing point of (fresh) lake water (rhoinit:1323), ~0 C minus
    pressure correction."""
    return -7.53e-3 * depth_pressure_m / 100.0


def eddy_diffusivity(wind, temp, lat, dz, surfdz, freeze_flag):
    """Hostetler eddy diffusivity per layer interface (eddy:837).
    temp: [c, NN]; returns de [c, NN]."""
    rho = water_density(temp)
    nn = temp.shape[-1]
    wind = jnp.maximum(wind, 1.0)
    ks = 6.6 * jnp.sqrt(jnp.sin(jnp.abs(lat) * jnp.pi / 180.0)) \
        * jnp.power(wind, -1.84)
    ws = 0.0012 * wind
    k_idx = jnp.arange(nn - 1)
    zhalf = jnp.where(k_idx == 0, (surfdz[..., None] + dz[..., None]) * 0.5,
                      dz[..., None])
    dpdz = (rho[..., 1:] - rho[..., :-1]) / zhalf
    n2 = dpdz / (1.0e3 + rho[..., :-1]) * 9.8
    z = surfdz[..., None] + k_idx * dz[..., None]
    # reference guard (eddy:885): deep/strong-decay points pin to radmax
    ksz = jnp.minimum(ks[..., None] * z, 30.0)   # exp underflow guard (f32)
    deep = z * jnp.exp(ksz) / ws[..., None] > 1.0e8
    rad = 1.0 + 40.0 * n2 * (c.VON_K * z) ** 2 / (
        ws[..., None] ** 2 * jnp.exp(-2.0 * ksz))
    rad = jnp.where(deep, 4.0e4, rad)
    rad = jnp.clip(rad, 1.0, 4.0e4)
    ri = (-1.0 + jnp.sqrt(rad)) / 20.0
    de = DM + (c.VON_K * ws[..., None] * z / 1.0) * jnp.exp(
        -ks[..., None] * z) / (1.0 + 37.0 * ri * ri)
    de = jnp.where(freeze_flag[..., None], DM, de)
    de = jnp.concatenate([de, de[..., -1:]], -1)
    return de


class LakeStepResult(NamedTuple):
    state: LakeState
    evap_m3: jnp.ndarray
    runoff_out_m3: jnp.ndarray
    baseflow_out_m3: jnp.ndarray
    depth: jnp.ndarray
    sarea: jnp.ndarray
    ice_fract: jnp.ndarray
    surf_temp: jnp.ndarray
    # wetland recharge exchange (water_balance, lakes.eb.c:2016-2096)
    recharge_m3: jnp.ndarray = None      # water taken from the lake
    wetland_dmoist_mm: jnp.ndarray = None  # [c, nl] added to wetland soil


def lake_step(lp: LakeParams, st: LakeState, *, tair, wind, sw_in, lw_in,
              vp_air, pressure, prec_mm, snowfall_mm, runoff_in_m3,
              baseflow_in_m3, lat, elevation, ds, dsmax, ws_arno, c_arno,
              dt_sec, wetland_moist=None,
              wetland_max_moist=None) -> LakeStepResult:
    """One model step of the lake column + water balance for every cell lane.
    Inactive lanes (has_lake False or volume 0) pass through unchanged."""
    NN = st.temp.shape[-1]
    dt_h = dt_sec / 3600.0

    liquid = jnp.maximum(st.volume - st.ice_water_eq, 0.0)
    depth = depth_from_volume(lp, liquid)
    sarea = jnp.maximum(area_from_depth(lp, depth), 1.0)
    active = jnp.logical_and(jnp.asarray(lp.has_lake), depth > 0.01)

    dz = jnp.maximum(depth / NN, 1e-3)
    surfdz = dz
    ice_fract = jnp.clip(st.ice_area / sarea, 0.0, 1.0)

    # ---- surface energy balance on open water (water_energy_balance) ------
    t0 = st.temp[..., 0]
    tkelv = t0 + c.KELVIN
    net_long = lw_in - 0.97 * c.STEFAN_B * tkelv ** 4
    sw_net = sw_in * (1.0 - c.H2O_SURF_ALBEDO)
    ra = 1.0 / jnp.maximum(0.0013 * wind, 1e-5)   # bulk transfer
    sensible = 1.23 * c.CP * (tair - t0) / ra
    es0 = svp(t0)
    le = 2.501e6 - 2361.0 * t0
    # bulk evaporative mass flux kg/m^2/s (positive = condensation)
    evap_flux = 1.23 * (c.EPS_RATIO / pressure) * (vp_air - es0) / ra
    latent = le * (-evap_flux)       # positive = surface cooling
    evap_mm = jnp.clip(-evap_flux * dt_sec, 0.0, None)  # 1 kg/m^2 == 1 mm

    open_frac = 1.0 - ice_fract
    qnet_surf = (sw_net * 0.6 + net_long + sensible - latent) * open_frac

    # ---- layer temperature update: implicit diffusion ---------------------
    # SW attenuation: Beer's law with eta = 1.1925*depth^-0.424 (LAKE.h lamisw)
    eta = 1.1925 * jnp.power(jnp.maximum(depth, 0.1), -0.424)
    k_idx = jnp.arange(NN)
    z_top_l = k_idx * dz[..., None]
    z_bot_l = (k_idx + 1) * dz[..., None]
    sw_abs = sw_net[..., None] * 0.4 * (
        jnp.exp(-eta[..., None] * z_top_l) - jnp.exp(-eta[..., None] * z_bot_l))

    cp_w = c.CH_WATER  # volumetric heat capacity J/m3/K
    de = eddy_diffusivity(wind, st.temp, lat, dz, surfdz,
                          freeze_flag=ice_fract > 0.5)

    # implicit tridiagonal: (I - dt/dz^2 * D) T_new = T_old + sources
    from ..ops.tridiag import thomas_solve
    alpha = de[..., :-1] * dt_sec / (dz[..., None] ** 2)
    dl = jnp.concatenate([jnp.zeros_like(alpha[..., :1]), -alpha], -1)
    du = jnp.concatenate([-alpha, jnp.zeros_like(alpha[..., :1])], -1)
    dmain = 1.0 + jnp.concatenate(
        [alpha, jnp.zeros_like(alpha[..., :1])], -1) + jnp.concatenate(
        [jnp.zeros_like(alpha[..., :1]), alpha], -1)
    src = sw_abs * dt_sec / (cp_w * dz[..., None])
    src = src.at[..., 0].add(qnet_surf * dt_sec / (cp_w * dz))
    rhs = st.temp + src
    t_new = thomas_solve(dl, dmain, du, rhs)

    # ---- convective mixing sweeps (tracer_mixer:296): red-black pairwise
    # averaging of density-unstable neighbors, fixed sweep budget ------------
    def _pairwise_mix(T):
        for parity in (0, 1):
            rho = water_density(T)
            unstable = rho[..., :-1] > rho[..., 1:]
            sel = (jnp.arange(NN - 1) % 2) == parity
            do = jnp.logical_and(unstable, sel)
            tm = (T[..., :-1] + T[..., 1:]) / 2.0
            T = T.at[..., :-1].set(jnp.where(do, tm, T[..., :-1]))
            T = T.at[..., 1:].set(jnp.where(do, tm, T[..., 1:]))
        return T

    t_new = jax.lax.fori_loop(0, 4, lambda i, T: _pairwise_mix(T), t_new)

    # ---- ice formation / melt (iceform / lakeice) -------------------------
    tcut = freezing_point(0.0)
    supercool = jnp.maximum(tcut - t_new, 0.0)
    layer_vol_m = dz[..., None] * jnp.ones((1, NN))
    qfus_m = supercool * layer_vol_m * c.RHO_W * 4186.8 / (c.LF * RHOICE)
    new_ice_m = qfus_m.sum(-1)         # m of ice over lake area
    t_new = jnp.maximum(t_new, tcut)
    new_ice_vol = new_ice_m * sarea * RHOICE / c.RHO_W  # m^3 water eq

    # surface melt of existing ice when warm
    melt_pot = jnp.where(
        jnp.logical_and(st.ice_water_eq > 0.0, tair > 0.0),
        (sw_net * (1.0 - 0.4) + jnp.maximum(net_long, 0.0)
         + jnp.maximum(sensible, 0.0)) * dt_sec / (c.LF * c.RHO_W), 0.0)
    ice_melt_vol = jnp.minimum(melt_pot * jnp.maximum(st.ice_area, 0.0),
                               st.ice_water_eq + new_ice_vol)

    ice_water_eq = jnp.maximum(st.ice_water_eq + new_ice_vol - ice_melt_vol,
                               0.0)
    grew = ice_water_eq > st.ice_water_eq
    ice_area = jnp.where(
        ice_water_eq <= 0.0, 0.0,
        jnp.where(grew, jnp.minimum(st.ice_area + new_ice_m * sarea * 5.0,
                                    sarea),
                  st.ice_area * ice_water_eq
                  / jnp.maximum(st.ice_water_eq, 1e-10)))
    ice_area = jnp.minimum(ice_area, sarea)
    ice_height = jnp.where(ice_area > 0.0,
                           ice_water_eq * c.RHO_W / RHOICE
                           / jnp.maximum(ice_area, 1.0), 0.0)

    # ---- snow on lake ice (lakes.eb.c:343 ice_melt on snow-covered ice):
    # snowfall accumulates on the ice fraction; melts with available surface
    # energy; meltwater joins the lake volume -------------------------------
    snow_gain_m = jnp.where(ice_area > 0.0, snowfall_mm / 1000.0, 0.0)
    swe1 = st.swe + snow_gain_m
    snow_melt_pot = jnp.where(
        tair > 0.0,
        (sw_net * 0.6 + jnp.maximum(net_long, 0.0)
         + jnp.maximum(sensible, 0.0)) * dt_sec / (c.LF * c.RHO_W), 0.0)
    snow_melt_m = jnp.minimum(swe1, snow_melt_pot)
    swe_new = jnp.maximum(swe1 - snow_melt_m, 0.0)
    swe_new = jnp.where(ice_area > 0.0, swe_new, 0.0)
    # ice gone -> any remaining snow slumps into the lake
    snow_dump_m = jnp.where(ice_area > 0.0, 0.0, swe1 - snow_melt_m)
    snowmelt_m3 = (snow_melt_m + jnp.maximum(snow_dump_m, 0.0)) * st.ice_area

    # ---- water balance (water_balance:1870) -------------------------------
    inflow_m3 = runoff_in_m3 + baseflow_in_m3
    # precip over open water (and rain through) enters the volume directly;
    # snow captured on ice is held in the swe store until it melts
    prec_m3 = (prec_mm / 1000.0 * sarea
               - snow_gain_m * jnp.minimum(st.ice_area, sarea)) + snowmelt_m3
    evap_m3 = jnp.minimum(evap_mm / 1000.0 * sarea * open_frac,
                          jnp.maximum(liquid + inflow_m3 + prec_m3, 0.0))
    volume = st.volume + inflow_m3 + prec_m3 - evap_m3

    # ---- wetland recharge (water_balance, lakes.eb.c:2016-2096): when the
    # lake grows, the newly-flooded wetland fringe is filled to saturation
    # with lake water. delta_moist is expressed in mm over the whole wetland
    # area exactly as the reference does ("mm over (1-lakefrac)",
    # lakes.eb.c:2057), so it adds directly onto the wetland HRU's layers.
    # Deviations (documented): the fill is scaled proportionally across
    # layers when lake liquid cannot saturate all of them (the reference
    # fills top-down, lakes.eb.c:2077-2092); the flooded fringe's
    # above-ground snow/dew liberation and the receding-lake saturation of
    # newly-exposed wetland (lakes.eb.c:2182) are not modeled — lake area
    # does not rescale the static HRU weights in this architecture.
    basin0 = jnp.asarray(lp.basin)[..., 0]
    lakefrac = jnp.clip(jnp.maximum(sarea, st.ice_area)
                        / jnp.maximum(basin0, 1.0), 0.0, 1.0)
    if wetland_moist is not None:
        liquid1 = jnp.maximum(volume - ice_water_eq, 0.0)
        newfrac = jnp.clip(
            jnp.maximum(area_from_depth(lp, depth_from_volume(lp, liquid1)),
                        ice_area) / jnp.maximum(basin0, 1.0), 0.0, 1.0)
        grow = jnp.logical_and(active, newfrac > lakefrac)
        frac_ratio = jnp.clip((newfrac - lakefrac)
                              / jnp.maximum(1.0 - lakefrac, 1e-6), 0.0, 1.0)
        dmoist = jnp.maximum(wetland_max_moist - wetland_moist, 0.0) \
            * frac_ratio[..., None]
        recharge_m3 = dmoist.sum(-1) / 1000.0 * (1.0 - lakefrac) * basin0
        avail = jnp.maximum(volume - ice_water_eq, 0.0)
        scale = jnp.where(recharge_m3 > avail,
                          avail / jnp.maximum(recharge_m3, 1e-12), 1.0)
        dmoist = jnp.where(grow[..., None], dmoist * scale[..., None], 0.0)
        recharge_m3 = jnp.where(grow, jnp.minimum(recharge_m3, avail), 0.0)
        volume = volume - recharge_m3
    else:
        recharge_m3 = jnp.zeros_like(volume)
        dmoist = None

    # ARNO baseflow through the lake bed (water_balance:185-228)
    dsmax_step = dsmax / 24.0 * dt_h
    rel_moist = jnp.ones_like(volume)  # saturated bed
    baseflow_mm = dsmax_step * ds / ws_arno * rel_moist
    baseflow_mm = baseflow_mm + dsmax_step * (1.0 - ds / ws_arno)
    baseflow_out = jnp.clip(baseflow_mm / 1000.0 * sarea, 0.0,
                            jnp.maximum(volume - ice_water_eq, 0.0))
    volume = volume - baseflow_out

    # weir outflow (water_balance:239-255)
    liquid2 = jnp.maximum(volume - ice_water_eq, 0.0)
    depth2 = depth_from_volume(lp, liquid2)
    circum = 2.0 * jnp.pi * jnp.sqrt(jnp.maximum(sarea, 0.0) / jnp.pi)
    head = jnp.maximum(depth2 - lp.mindepth, 0.0)
    runoff_out = jnp.where(
        head > 0.0,
        lp.wfrac * circum * dt_sec * 1.6 * jnp.power(head, 1.5), 0.0)
    runoff_out = jnp.clip(runoff_out, 0.0, liquid2)
    runoff_out = jnp.minimum(runoff_out,
                             jnp.maximum(volume - lp.minvolume, 0.0))
    volume = volume - runoff_out
    volume = jnp.minimum(volume, lp.maxvolume)

    # inactive lanes: passthrough
    keep = ~active
    K = lambda new, old: jnp.where(keep, old, new)
    new_state = LakeState(
        volume=K(volume, st.volume), temp=jnp.where(keep[..., None],
                                                    st.temp, t_new),
        ice_water_eq=K(ice_water_eq, st.ice_water_eq),
        ice_area=K(ice_area, st.ice_area),
        ice_height=K(ice_height, st.ice_height), swe=K(swe_new, st.swe))
    return LakeStepResult(
        state=new_state,
        recharge_m3=jnp.where(keep, 0.0, recharge_m3),
        wetland_dmoist_mm=(None if dmoist is None else
                           jnp.where(keep[..., None], 0.0, dmoist)),
        evap_m3=jnp.where(keep, 0.0, evap_m3),
        runoff_out_m3=jnp.where(keep, 0.0, runoff_out),
        baseflow_out_m3=jnp.where(keep, 0.0, baseflow_out),
        depth=depth_from_volume(lp, jnp.maximum(new_state.volume
                                                - new_state.ice_water_eq,
                                                0.0)),
        sarea=sarea, ice_fract=jnp.where(keep, 0.0, ice_fract),
        surf_temp=jnp.where(keep, st.temp[..., 0], t_new[..., 0]))


def initial_lake_state(lp: LakeParams, avg_temp) -> LakeState:
    depth0 = jnp.asarray(lp.depth_in)
    vol0 = volume_from_depth(lp, depth0)
    n_cell = depth0.shape[0]
    temp0 = jnp.maximum(jnp.asarray(avg_temp), 4.0)[:, None] * jnp.ones(
        (1, MAX_LAKE_NODES))
    Z = jnp.zeros(n_cell)
    return LakeState(volume=vol0, temp=temp0, ice_water_eq=Z, ice_area=Z,
                     ice_height=Z, swe=Z)
