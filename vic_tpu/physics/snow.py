"""Two-layer snowpack model: rain/snow partitioning, albedo decay, densification,
and the surface-layer energy balance with the two-pass 0-degree melt pattern.

Batched TPU re-expression of:
- calc_rainonly          — /root/reference/calc_rainonly.c (VIC_412 linear and
                           KIENZLE S-curve partitions)
- snow_albedo            — /root/reference/snow_utility.c (USACE decay with PCIC
                           per-cell parameters, and SUN1999)
- snow_density /
  new_snow_density       — /root/reference/snow_utility.c (DENS_BRAS, DENS_SNTHRM)
- latent_heat_from_snow  — /root/reference/latent_heat_from_snow.c
- StabilityCorrection    — /root/reference/StabilityCorrection.c (Richardson number)
- SnowPackEnergyBalance  — /root/reference/SnowPackEnergyBalance.c:calculate
- snow_melt              — /root/reference/snow_melt.c:119-560 (two-layer pack
                           mass/energy update, Brent surface-T solve bracketed
                           +/-SNOW_DT, TFALLBACK, refreeze, liquid-water holding)

The reference's scalar two-branch control flow (melt-at-0C vs subfreezing root
solve, SURVEY.md A.3) becomes two fully-evaluated masked lanes around one batched
Brent solve. All mass units here are METERS of water over the step except where
noted (the reference mixes m and mm; we keep snow-internal math in m like it does).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as c
from ..ops.rootfind import batched_brent
from .evap import svp


def calc_rainonly(air_temp, prec, max_snow_temp, min_rain_temp,
                  method: int = 1):
    """Fraction of precip falling as rain (mm). method: 0=VIC_412, 1=KIENZLE
    (calc_rainonly.c:12-120). Returns rain amount; snow = prec - rain."""
    if method == 0:  # VIC_412 linear ramp
        frac = jnp.clip((air_temp - min_rain_temp)
                        / jnp.maximum(max_snow_temp - min_rain_temp, 1e-10),
                        0.0, 1.0)
        return frac * prec
    # KIENZLE (2008) S-curve: TT = min_rain_temp (50% threshold),
    # TR = max_snow_temp (mixed-phase range)
    tt = min_rain_temp
    d = 1.4 * max_snow_temp
    x = (air_temp - tt) / d
    e1 = 5.0 * x ** 3
    e2 = 6.76 * x ** 2
    e3 = 3.19 * x
    rfrac = jnp.where(air_temp <= tt, e1 + e2 + e3 + 0.5, e1 - e2 + e3 + 0.5)
    return jnp.clip(rfrac, 0.0, 1.0) * prec


def new_snow_density(air_temp, snthrm: bool = False):
    """Fresh snow density kg/m^3 (snow_utility.c:new_snow_density)."""
    if snthrm:
        return 67.9 + 51.3 * jnp.exp(air_temp / 2.6)
    tf = air_temp * 9.0 / 5.0 + 32.0
    return jnp.where(tf > 0.0,
                     c.NEW_SNOW_DENSITY + 1000.0 * (tf / 100.0) ** 2,
                     c.NEW_SNOW_DENSITY)


def snow_albedo(new_snow_mm, swq, depth, albedo, cold_content, dt_hours,
                last_snow, melting, new_snow_alb, accum_a, accum_b,
                thaw_a, thaw_b, sun1999: bool = False):
    """Snow surface albedo decay (snow_utility.c:snow_albedo).
    last_snow: steps since last snowfall (float array)."""
    if sun1999:
        deep = 0.5 + (albedo - 0.5) * jnp.exp(-0.01 * dt_hours / 24.0)
        shallow_dry = albedo - 0.006 * dt_hours / 24.0
        shallow_melt = albedo - 0.071 * dt_hours / 24.0
        aged = jnp.where(depth > 0.025, deep,
                         jnp.where(cold_content < 0.0, shallow_dry,
                                   shallow_melt))
        aged = jnp.maximum(aged, 0.0)
    else:
        days = last_snow * dt_hours / 24.0
        accum = new_snow_alb * jnp.power(accum_a, jnp.power(days, accum_b))
        thaw = new_snow_alb * jnp.power(thaw_a, jnp.power(days, thaw_b))
        aged = jnp.where(jnp.logical_and(cold_content < 0.0, ~melting),
                         accum, thaw)
    out = jnp.where(jnp.logical_and(new_snow_mm > c.TRACESNOW,
                                    cold_content < 0.0),
                    new_snow_alb,
                    jnp.where(swq > 0.0, aged, 0.0))
    return out


def snow_density_update(swq_before, depth_before, density_before,
                        surf_temp, new_snow_mm, air_temp, dt_hours,
                        liquid_water=None, snthrm: bool = False):
    """Snowpack densification (snow_utility.c:snow_density). Returns new density
    (kg/m^3). swq/depth in m; new_snow in mm."""
    dens_new = new_snow_density(air_temp, snthrm)
    tavg = surf_temp + c.KELVIN
    if snthrm:
        density = jnp.where(
            new_snow_mm > 0.0,
            jnp.where(depth_before > 0.0, density_before, dens_new),
            density_before)
        dexpf = jnp.exp(-c.SNDENS_C1 * (c.KELVIN - tavg))
        dm = jnp.where(jnp.logical_and(new_snow_mm > 0.0, dens_new > 0.0),
                       jnp.maximum(c.SNDENS_DMLIMIT, 1.15 * dens_new),
                       c.SNDENS_DMLIMIT)
        c3 = jnp.where(density <= dm, 1.0, jnp.exp(-0.046 * (density - dm)))
        lw = liquid_water if liquid_water is not None else jnp.zeros_like(swq_before)
        wet = jnp.where(depth_before > 0.0, lw / jnp.maximum(depth_before, 1e-10),
                        0.0) > 0.01
        c4 = jnp.where(wet, 2.0, 1.0)
        ddz1 = -c.SNDENS_C2 * c3 * c4 * dexpf
        swq_load = new_snow_mm / 1000.0 + c.SNDENS_F * swq_before
        ps = 0.5 * c.G * c.RHO_W * swq_load
        ddz2 = jnp.where(
            new_snow_mm > 0.0,
            -ps / c.SNDENS_ETA0 * jnp.exp(
                -(-c.SNDENS_C5 * (tavg - c.KELVIN) + c.SNDENS_C6 * density)),
            0.0)
        cr = -ddz1 - ddz2
        return density * (1.0 + cr * dt_hours * c.SEC_PER_HOUR)

    # DENS_BRAS path
    depth = depth_before
    swq = swq_before
    dens_safe = jnp.maximum(dens_new, 1.0)
    # compaction by new snowfall (Bras p.257, imperial-unit formula)
    delta_depth = jnp.where(
        jnp.logical_and(new_snow_mm > 0.0, depth > 0.0),
        jnp.minimum(((new_snow_mm / 25.4) * (depth / 0.0254)
                     / jnp.maximum(swq / 0.0254, 1e-10)
                     * jnp.power(jnp.maximum(depth / 0.0254, 1e-10) / 10.0,
                                 0.35)) * 0.0254,
                    0.9 * depth),
        0.0)
    depth_new_snow = new_snow_mm / dens_safe
    has_old = depth > 0.0
    depth1 = jnp.where(
        new_snow_mm > 0.0,
        jnp.where(has_old, depth - delta_depth + depth_new_snow,
                  1000.0 * (swq + new_snow_mm / 1000.0) / dens_safe),
        depth)
    swq1 = swq + new_snow_mm / 1000.0
    density = jnp.where(
        new_snow_mm > 0.0,
        jnp.where(has_old, 1000.0 * swq1 / jnp.maximum(depth1, 1e-10), dens_new),
        jnp.where(depth > 0.0, 1000.0 * swq / jnp.maximum(depth, 1e-10),
                  density_before))
    # aging densification (SNTHRM89 viscosity form)
    overburden = 0.5 * c.G * c.RHO_W * swq1
    viscosity = c.SNDENS_ETA0 * jnp.exp(-c.SNDENS_C5 * (tavg - c.KELVIN)
                                        + c.SNDENS_C6 * density)
    delta_age = jnp.minimum(
        overburden / viscosity * depth1 * dt_hours * c.SEC_PER_HOUR,
        0.9 * depth1)
    depth2 = depth1 - delta_age
    density = jnp.where(depth2 > 0.0,
                        1000.0 * swq1 / jnp.maximum(depth2, 1e-10), density)
    return density


def stability_correction(z, d, tsurf, tair, wind, z0):
    """Richardson-number aerodynamic stability factor
    (StabilityCorrection.c:41-80). Multiplies conductance (divides resistance)."""
    denom_t = ((tair + c.KELVIN) + (tsurf + c.KELVIN)) / 2.0
    wind2 = jnp.maximum(wind * wind, 1e-10)
    ri = c.G * (tair - tsurf) * (z - d) / (denom_t * wind2)
    ri_limit = (tair + c.KELVIN) / (
        denom_t * (jnp.log((z - d) / z0) + 5.0))
    ri = jnp.minimum(ri, ri_limit)
    stable = (1.0 - ri / 0.2) ** 2
    unstable = jnp.sqrt(1.0 - 16.0 * jnp.maximum(ri, -0.5))
    corr = jnp.where(ri > 0.0, stable, unstable)
    return jnp.where(tsurf == tair, 1.0, corr)


def latent_heat_from_snow(air_dens, eact_air, lv, press, ra, tmean, vpd,
                          blowing_flux=0.0):
    """Latent heat fluxes over snow (latent_heat_from_snow.c:66-91).
    blowing_flux: blowing-snow mass flux kg/m2/s (BLOWING option).
    Returns (latent, latent_sub, vapor_mass_flux kg/m2/s)."""
    es_snow = svp(tmean)
    surface_flux = air_dens * (c.EPS_RATIO / press) * (eact_air - es_snow) / ra
    surface_flux = jnp.where(jnp.logical_and(vpd == 0.0, surface_flux < 0.0),
                             0.0, surface_flux)
    vapor_flux = surface_flux + blowing_flux
    ls = (677.0 - 0.07 * tmean) * c.JOULES_PER_CAL * c.GRAMS_PER_KG
    latent = jnp.where(tmean >= 0.0, lv * vapor_flux, 0.0)
    latent_sub = jnp.where(tmean >= 0.0, 0.0, ls * vapor_flux)
    return latent, latent_sub, vapor_flux


def advected_sensible_heat(snow_cover_fract, air_dens, tair, tgrnd, ra):
    """Sensible heat advected from snow-free patches to snow-covered patches
    (advected_sensible_heat.c:8-48, Marsh/Pomeroy/Neumann 1997). Active only
    under SPATIAL_SNOW partial coverage."""
    qbare = air_dens * c.CP * (tair - tgrnd) / ra
    fs = jnp.where(
        snow_cover_fract > 0.6, 1.0,
        jnp.where(snow_cover_fract > 0.5,
                  10.0 ** (3.0 * snow_cover_fract - 1.8),
                  jnp.where(snow_cover_fract > 0.2,
                            10.0 ** (5.6667 * snow_cover_fract - 3.1333),
                            0.01)))
    cov = jnp.maximum(snow_cover_fract, c.SMALL)
    qadv = qbare * (1.0 - snow_cover_fract) / cov * fs
    return jnp.where(snow_cover_fract > 0.0, qadv, 0.0)


class SnowEBTerms(NamedTuple):
    rest: jnp.ndarray            # residual (W/m^2), 0 in melt branch
    refreeze_energy: jnp.ndarray
    vapor_flux: jnp.ndarray      # m/step (negative = sublimation loss)
    latent: jnp.ndarray
    latent_sub: jnp.ndarray
    sensible: jnp.ndarray
    advection: jnp.ndarray
    delta_cc: jnp.ndarray
    grnd_flux: jnp.ndarray
    net_long: jnp.ndarray
    advected_sensible: jnp.ndarray


def snow_energy_terms(tsurf, *, dt, ra, displacement, z_ref, roughness,
                      air_dens, vp_air, longwave_in, lv, pressure, rain_m,
                      net_short, vpd, wind, old_tsurf, snow_depth, snow_density,
                      surf_water, surface_swq, tair, tgrnd,
                      blowing_flux=0.0, snow_cover_fract=None) -> SnowEBTerms:
    """All terms of the snowpack surface energy balance at candidate tsurf
    (SnowPackEnergyBalance.c:calculate). Shapes broadcast over the batch.
    snow_cover_fract: SPATIAL_SNOW partial coverage — enables the advected
    sensible heat term (SnowPackEnergyBalance.c:132-143)."""
    ra_corr = jnp.where(
        wind > 0.0,
        ra / stability_correction(z_ref, 0.0, tsurf, tair, wind, roughness),
        c.HUGE_RESIST)

    tkelv = tsurf + c.KELVIN
    net_long = longwave_in - c.STEFAN_B * tkelv ** 4
    net_rad = net_short + net_long
    sensible = air_dens * c.CP * (tair - tsurf) / ra_corr
    if snow_cover_fract is not None:
        adv_sens = advected_sensible_heat(snow_cover_fract, air_dens, tair,
                                          tgrnd, ra_corr)
    else:
        adv_sens = jnp.zeros_like(sensible)

    latent, latent_sub, vapor_mass_flux = latent_heat_from_snow(
        air_dens, vp_air, lv, pressure, ra_corr, tsurf, vpd, blowing_flux)
    vapor_flux = vapor_mass_flux * dt / c.RHO_W  # kg/m2/s -> m/step

    advection = jnp.where(tsurf == 0.0, c.CH_WATER * tair * rain_m / dt, 0.0)
    delta_cc = c.CH_ICE * surface_swq * (tsurf - old_tsurf) / dt
    grnd_flux = jnp.where(
        snow_depth > 0.0,
        c.K_SNOW * snow_density * snow_density * (tgrnd - tsurf)
        / jnp.maximum(snow_depth, 1e-10) / dt,
        0.0)

    refreeze_energy = surf_water * c.LF * c.RHO_W / dt
    rest = (net_rad + sensible + latent + latent_sub + advection
            + adv_sens - delta_cc + grnd_flux)
    # two-pass 0C pattern (SnowPackEnergyBalance.c:186-195):
    melt_branch = jnp.logical_and(tsurf == 0.0, rest > -refreeze_energy)
    refreeze_out = jnp.where(melt_branch, -rest, refreeze_energy)
    rest_out = jnp.where(melt_branch, 0.0, rest + refreeze_energy)
    return SnowEBTerms(rest=rest_out, refreeze_energy=refreeze_out,
                       vapor_flux=vapor_flux, latent=latent,
                       latent_sub=latent_sub, sensible=sensible,
                       advection=advection, delta_cc=delta_cc,
                       grnd_flux=grnd_flux, net_long=net_long,
                       advected_sensible=adv_sens)


class SnowMeltResult(NamedTuple):
    swq: jnp.ndarray           # m
    surf_temp: jnp.ndarray
    pack_temp: jnp.ndarray
    surf_water: jnp.ndarray    # m
    pack_water: jnp.ndarray    # m
    melt: jnp.ndarray          # mm/step outflow from pack
    vapor_flux: jnp.ndarray    # m/step (sign flipped like snow_melt.c:553)
    cold_content: jnp.ndarray  # J/m^2 of surface layer
    qnet: jnp.ndarray
    surf_temp_fbflag: jnp.ndarray
    firn_to_ice: jnp.ndarray   # m of pack converted to glacier ice this step
    terms: SnowEBTerms
    # thin-pack INCLUDE_SNOW handoff (snow_melt.c:322-376): cold-branch
    # lanes whose surface layer SWE <= MIN_SWQ_EB_THRES skip the pack EB
    # (surf_temp INVALID) and are folded into the ground surface EB by the
    # caller; the returned pack state for them is the accumulation +
    # liquid bookkeeping only
    include_snow: jnp.ndarray = None     # bool
    inc_advection0: jnp.ndarray = None   # rain advection at the 0C pass


def snow_melt(*, swq, surf_temp, pack_temp, surf_water, pack_water,
              snow_depth, snow_density, coldcontent,
              rainfall_mm, snowfall_mm,
              air_temp, tcanopy, tgrnd, wind, vp_air, vpd, air_dens, pressure,
              longwave_in, net_short, lv, ra, displacement, z_ref, roughness,
              dt_sec, max_iter: int = 30, tfallback: bool = True,
              blowing_flux=0.0, active_mask=None,
              is_glacier=None, snow_cover_fract=None) -> SnowMeltResult:
    """Batched two-layer snowpack mass/energy update (snow_melt.c:119-560).

    All snow states in m of water equivalent; precip inputs in mm/step.
    `is_glacier` lanes additionally run the snow-on-glacier variant's
    firn densification (snow_melt_glac.c:110-131): pack snow below the
    depth where a linear density profile reaches CUTOFF_DENSITY converts
    to glacier ice (reported as `firn_to_ice`, the reference's
    glacier->accumulation).
    """
    snowfall = snowfall_mm / 1000.0
    rainfall = rainfall_mm / 1000.0
    old_tsurf = surf_temp

    ice = swq - pack_water - surf_water
    surface_swq = jnp.minimum(ice, c.MAX_SURFACE_SWE)
    pack_swq = ice - surface_swq
    surface_cc = c.CH_ICE * surface_swq * surf_temp
    pack_cc = c.CH_ICE * pack_swq * pack_temp
    snowfall_cc = jnp.where(air_temp > 0.0, 0.0, c.CH_ICE * snowfall * air_temp)

    # distribute fresh snowfall between surface and pack (snow_melt.c:199-222)
    room = c.MAX_SURFACE_SWE - surface_swq
    spill = jnp.logical_and(snowfall > room, room > c.SMALL)
    delta_pack_swq = jnp.where(spill, surface_swq + snowfall - c.MAX_SURFACE_SWE,
                               0.0)
    delta_pack_cc = jnp.where(
        spill,
        jnp.where(delta_pack_swq > surface_swq,
                  surface_cc + (snowfall - c.MAX_SURFACE_SWE)
                  / jnp.maximum(snowfall, c.SMALL) * snowfall_cc,
                  delta_pack_swq / jnp.maximum(surface_swq, c.SMALL)
                  * surface_cc),
        0.0)
    surface_swq = jnp.where(spill, c.MAX_SURFACE_SWE, surface_swq + snowfall)
    surface_cc = surface_cc + snowfall_cc - delta_pack_cc
    pack_swq = pack_swq + delta_pack_swq
    pack_cc = pack_cc + delta_pack_cc

    surf_temp = jnp.where(surface_swq > 0.0,
                          surface_cc / (c.CH_ICE * jnp.maximum(surface_swq,
                                                               c.SMALL)), 0.0)

    # firn → glacier ice on glacier lanes (snow_melt_glac.c:110-131): with a
    # linear density profile from SNOW_SURF_DENSITY at the surface to
    # 2*rho_mean-SNOW_SURF_DENSITY at the bottom, everything below the depth
    # zco where the profile crosses CUTOFF_DENSITY leaves the pack as ice.
    # The pack cold content stays behind (reference quirk), except when the
    # whole pack converts.
    if is_glacier is not None:
        dens_excess = snow_density - c.SNOW_SURF_DENSITY
        zco = ((c.CUTOFF_DENSITY - c.SNOW_SURF_DENSITY) * (snow_depth / 2.0)
               / jnp.maximum(dens_excess, c.SMALL))
        density_zsnow = c.SNOW_SURF_DENSITY + 2.0 * dens_excess
        firn_raw = ((density_zsnow + c.CUTOFF_DENSITY) / (2.0 * c.RHO_W)
                    * (snow_depth - zco))
        eligible = (is_glacier & (pack_swq > 0.0) & (dens_excess > 0.0)
                    & (zco < snow_depth))
        firn_to_ice = jnp.where(eligible,
                                jnp.minimum(firn_raw, pack_swq), 0.0)
        pack_swq = pack_swq - firn_to_ice
        full_conv = jnp.logical_and(eligible, pack_swq <= 0.0)
        pack_cc = jnp.where(full_conv, 0.0, pack_cc)
    else:
        firn_to_ice = jnp.zeros_like(pack_swq)

    pack_temp = jnp.where(pack_swq > 0.0,
                          pack_cc / (c.CH_ICE * jnp.maximum(pack_swq, c.SMALL)),
                          0.0)
    ice = ice + snowfall - firn_to_ice
    surf_water = surf_water + rainfall

    term_kwargs = dict(
        dt=dt_sec, ra=ra, displacement=displacement, z_ref=z_ref,
        roughness=roughness, air_dens=air_dens, vp_air=vp_air,
        longwave_in=longwave_in, lv=lv, pressure=pressure, rain_m=rainfall,
        net_short=net_short, vpd=vpd, wind=wind, old_tsurf=old_tsurf,
        snow_depth=snow_depth, snow_density=snow_density,
        surf_water=surf_water, surface_swq=surface_swq,
        tair=tcanopy, tgrnd=tgrnd, blowing_flux=blowing_flux,
        snow_cover_fract=snow_cover_fract)

    terms0 = snow_energy_terms(jnp.zeros_like(swq), **term_kwargs)
    melt_cond = terms0.rest == 0.0
    # INCLUDE_SNOW candidacy (snow_melt.c:324: SurfaceSwq <=
    # MIN_SWQ_EB_THRES in the cold branch -> surf_temp INVALID)
    thin = jnp.logical_and(~melt_cond,
                           surface_swq <= c.MIN_SWQ_EB_THRES)

    # ---------------- Branch A: melt conditions at 0 C ----------------
    refreeze = terms0.refreeze_energy
    refrozen_water = jnp.clip(refreeze * dt_sec / (c.LF * c.RHO_W),
                              0.0, surf_water)
    a_surface_swq = surface_swq + jnp.where(refreeze >= 0.0, refrozen_water, 0.0)
    a_ice = ice + jnp.where(refreeze >= 0.0, refrozen_water, 0.0)
    a_surf_water = jnp.maximum(
        surf_water - jnp.where(refreeze >= 0.0, refrozen_water, 0.0), 0.0)
    snowmelt = jnp.where(refreeze >= 0.0, 0.0,
                         jnp.abs(refreeze) * dt_sec / (c.LF * c.RHO_W))

    # vapor flux adjustment (snow_melt.c:276-286)
    vflux = terms0.vapor_flux
    vflux_a = jnp.where(a_surf_water < -vflux, -a_surf_water, vflux)
    a_surf_water = jnp.maximum(a_surf_water + vflux_a, 0.0)

    # melt partitioning (snow_melt.c:289-318)
    partial = snowmelt < a_ice
    from_pack = snowmelt <= pack_swq
    a_surf_water_p = jnp.where(
        from_pack, a_surf_water + snowmelt,
        a_surf_water + snowmelt + pack_water)
    a_pack_water_p = jnp.where(from_pack, pack_water, 0.0)
    a_pack_swq_p = jnp.where(from_pack, pack_swq - snowmelt, 0.0)
    a_ice_p = a_ice - snowmelt
    a_surface_swq_p = jnp.where(from_pack, a_surface_swq, a_ice_p)
    # complete melt
    a_surf_water_c = a_surf_water + a_ice
    a_surf_temp = jnp.where(partial, 0.0, 0.0)
    a_state = dict(
        surface_swq=jnp.where(partial, a_surface_swq_p, 0.0),
        pack_swq=jnp.where(partial, a_pack_swq_p, 0.0),
        surf_water=jnp.where(partial, a_surf_water_p, a_surf_water_c),
        pack_water=jnp.where(partial, a_pack_water_p, 0.0),
        ice=jnp.where(partial, a_ice_p, 0.0),
        surf_temp=a_surf_temp,
        pack_temp=jnp.where(partial, pack_temp, 0.0),
        vapor_flux=vflux_a,
    )

    # ---------------- Branch B: subfreezing surface, Brent solve -------------
    def resid(t):
        return snow_energy_terms(t, **term_kwargs).rest

    brent_active = jnp.logical_and(~melt_cond, ~thin) \
        if active_mask is None else \
        jnp.logical_and(jnp.logical_and(~melt_cond, ~thin), active_mask)
    # bracket expansion applies to ALL RootBrent functors, this one included
    # (root_brent.c:183-190: MAXTRIES x TSTEP widening)
    res = batched_brent(resid, old_tsurf - c.SNOW_DT, old_tsurf + c.SNOW_DT,
                        max_iter=max_iter, active=brent_active)
    ok = res.converged
    b_surf_temp = jnp.where(ok, res.root, old_tsurf)  # TFALLBACK
    fbflag = jnp.logical_and(~ok, ~melt_cond)
    terms_b = snow_energy_terms(b_surf_temp, **term_kwargs)

    # all surface liquid refreezes (snow_melt.c:398-405)
    b_surface_swq = surface_swq + surf_water
    b_ice = ice + surf_water
    b_surf_water = jnp.zeros_like(surf_water)
    # vapor flux adjustment vs SurfaceSwq (snow_melt.c:407-424)
    bv = terms_b.vapor_flux
    bv_adj = jnp.where(b_surface_swq < -bv, -b_surface_swq, bv)
    b_surface_swq2 = jnp.maximum(b_surface_swq + bv_adj, 0.0)
    b_ice2 = jnp.where(b_surface_swq < -bv, pack_swq, b_ice + bv_adj)
    b_state = dict(
        surface_swq=b_surface_swq2, pack_swq=pack_swq,
        surf_water=b_surf_water, pack_water=pack_water,
        ice=b_ice2, surf_temp=b_surf_temp, pack_temp=pack_temp,
        vapor_flux=bv_adj,
    )

    # ---------------- merge branches ----------------
    # branch C (thin INCLUDE_SNOW lanes): the EB never ran — pack state
    # passes through with the accumulation bookkeeping only; the caller's
    # ground-EB epilogue applies vapor/melt (calc_surf_energy_bal.c:589-660)
    c_state = dict(
        surface_swq=surface_swq, pack_swq=pack_swq, surf_water=surf_water,
        pack_water=pack_water, ice=ice, surf_temp=old_tsurf,
        pack_temp=pack_temp, vapor_flux=jnp.zeros_like(surf_water))
    b_state = {k: jnp.where(thin, c_state[k], b_state[k])
               for k in b_state}
    fbflag = jnp.logical_and(fbflag, ~thin)
    sel = lambda k: jnp.where(melt_cond, a_state[k], b_state[k])
    surface_swq = sel("surface_swq")
    pack_swq = sel("pack_swq")
    surf_water = sel("surf_water")
    pack_water = sel("pack_water")
    ice = sel("ice")
    surf_temp = sel("surf_temp")
    pack_temp = sel("pack_temp")
    vapor_flux = sel("vapor_flux")
    terms = jax.tree_util.tree_map(
        lambda a, b: jnp.where(melt_cond, a, b), terms0, terms_b)
    terms = jax.tree_util.tree_map(
        lambda a: jnp.where(thin, 0.0, a), terms)

    # ---------------- liquid-water capacity + pack refreeze ----------------
    # surface layer overflow (snow_melt.c:446-453)
    max_liquid = c.SNOW_LIQUID_WATER_CAPACITY * surface_swq
    outflow1 = jnp.maximum(surf_water - max_liquid, 0.0)
    surf_water = jnp.minimum(surf_water, max_liquid)

    # pack refreeze (snow_melt.c:460-496)
    pack_water = pack_water + outflow1
    pack_cc = c.CH_ICE * pack_swq * pack_temp
    pack_refreeze_e = pack_water * c.LF * c.RHO_W
    cold_enough = pack_cc < -pack_refreeze_e
    # full refreeze path
    pack_swq_f = pack_swq + pack_water
    ice_f = ice + pack_water
    pack_cc_f = pack_swq_f * 0.0 + pack_cc + pack_refreeze_e
    pack_temp_f = jnp.where(
        pack_swq_f > 0.0,
        jnp.minimum(pack_cc_f / (c.CH_ICE * jnp.maximum(pack_swq_f, c.SMALL)),
                    0.0),
        0.0)
    # partial refreeze path (cold content exactly consumed)
    delta_pack = -pack_cc / (c.LF * c.RHO_W)
    pack_water_p = pack_water - delta_pack
    pack_swq_p = pack_swq + delta_pack
    ice_p = ice + delta_pack

    pack_swq = jnp.where(cold_enough, pack_swq_f, pack_swq_p)
    ice = jnp.where(cold_enough, ice_f, ice_p)
    pack_water = jnp.where(cold_enough, 0.0, pack_water_p)
    pack_temp = jnp.where(cold_enough, pack_temp_f, 0.0)

    # pack liquid capacity (snow_melt.c:499-506)
    max_liquid_pack = c.SNOW_LIQUID_WATER_CAPACITY * pack_swq
    melt_out = jnp.maximum(pack_water - max_liquid_pack, 0.0)
    pack_water = jnp.minimum(pack_water, max_liquid_pack)

    # re-layer the pack around MAX_SURFACE_SWE (snow_melt.c:509-538)
    ice = pack_swq + surface_swq
    deep = ice > c.MAX_SURFACE_SWE
    surface_cc = c.CH_ICE * surf_temp * surface_swq
    pack_cc = c.CH_ICE * pack_temp * pack_swq
    excess = surface_swq - c.MAX_SURFACE_SWE
    # surface too thick: push excess into pack
    frac_s = excess / jnp.maximum(surface_swq, c.SMALL)
    pack_cc_1 = pack_cc + surface_cc * frac_s
    surface_cc_1 = surface_cc * (1.0 - frac_s)
    pack_swq_1 = pack_swq + excess
    surface_swq_1 = c.MAX_SURFACE_SWE
    # surface too thin: pull deficit from pack
    deficit = c.MAX_SURFACE_SWE - surface_swq
    frac_p = deficit / jnp.maximum(pack_swq, c.SMALL)
    pack_cc_2 = pack_cc * (1.0 - frac_p)
    surface_cc_2 = surface_cc + pack_cc * frac_p
    pack_swq_2 = pack_swq - deficit
    surface_swq_2 = c.MAX_SURFACE_SWE

    too_thick = surface_swq > c.MAX_SURFACE_SWE
    surface_swq_d = jnp.where(too_thick, surface_swq_1, surface_swq_2)
    pack_swq_d = jnp.where(too_thick, pack_swq_1, pack_swq_2)
    surface_cc_d = jnp.where(too_thick, surface_cc_1, surface_cc_2)
    pack_cc_d = jnp.where(too_thick, pack_cc_1, pack_cc_2)
    exact = surface_swq == c.MAX_SURFACE_SWE
    surface_swq_d = jnp.where(exact, surface_swq, surface_swq_d)
    pack_swq_d = jnp.where(exact, pack_swq, pack_swq_d)
    surface_cc_d = jnp.where(exact, surface_cc, surface_cc_d)
    pack_cc_d = jnp.where(exact, pack_cc, pack_cc_d)

    surface_swq = jnp.where(deep, surface_swq_d, surface_swq)
    new_pack_swq = jnp.where(deep, pack_swq_d, 0.0)
    surf_temp_out = jnp.where(
        deep, surface_cc_d / (c.CH_ICE * jnp.maximum(surface_swq_d, c.SMALL)),
        surf_temp)
    pack_temp_out = jnp.where(
        deep, pack_cc_d / (c.CH_ICE * jnp.maximum(pack_swq_d, c.SMALL)), 0.0)
    pack_swq = new_pack_swq

    swq_out = ice + pack_water + surf_water
    empty = swq_out <= 0.0
    surf_temp_out = jnp.where(empty, 0.0, surf_temp_out)
    pack_temp_out = jnp.where(empty, 0.0, pack_temp_out)

    cold_content = c.CH_ICE * surf_temp_out * jnp.minimum(surface_swq,
                                                          c.MAX_SURFACE_SWE)

    return SnowMeltResult(
        swq=swq_out, surf_temp=surf_temp_out, pack_temp=pack_temp_out,
        surf_water=surf_water, pack_water=pack_water,
        melt=melt_out * 1000.0, vapor_flux=-vapor_flux,
        cold_content=cold_content, qnet=terms.rest,
        surf_temp_fbflag=fbflag, firn_to_ice=firn_to_ice, terms=terms,
        include_snow=thin, inc_advection0=terms0.advection)


class SnowCoverageResult(NamedTuple):
    coverage: jnp.ndarray
    store_snow: jnp.ndarray      # bool
    store_swq: jnp.ndarray       # m
    swq_slope: jnp.ndarray       # m/fract (negative)
    store_coverage: jnp.ndarray
    max_swq: jnp.ndarray         # m


def calc_snow_coverage(*, store_snow, dfsc, old_coverage, swq, old_swq,
                       depth, old_depth, melt_m, max_swq, snowfall_mm,
                       store_swq, swq_slope,
                       store_coverage) -> SnowCoverageResult:
    """SPATIAL_SNOW partial snow coverage with depletion-curve memory
    (calc_snow_coverage.c:7-150, Cherkauer 2001): snow is assumed uniformly
    distributed with a slope anchored at depth_full_snow_cover (dfsc); melt
    reduces coverage along the stored slope; fresh snowfall over a partial
    pack is tracked separately (store_swq) so melting it off restores the
    buried depletion state instead of resetting it.

    The reference's stateful branch tree becomes three fully-evaluated masked
    lanes (accumulating / melting / unchanged). All water amounts in m.
    """
    one = jnp.ones_like(old_coverage)
    accum = snowfall_mm > 0.0
    melting = jnp.logical_and(~accum, melt_m > 0.0)

    # ---- accumulation lane (calc_snow_coverage.c:44-80) ----
    sc_keep = jnp.where(store_swq == 0.0,
                        jnp.where(old_coverage < 1.0, old_coverage, one),
                        store_coverage)
    ssw_acc = store_swq + (swq - old_swq)
    bury = depth >= dfsc / 2.0   # deep enough to erase melt-distribution memory
    a_store_snow = jnp.where(store_snow, ~bury, old_coverage < 1.0)
    a_store_swq = jnp.where(
        store_snow, jnp.where(bury, 0.0, ssw_acc),
        jnp.where(old_coverage < 1.0, swq - old_swq, store_swq))
    a_swq_slope = jnp.where(jnp.logical_and(store_snow, bury), 0.0, swq_slope)
    a_store_cov = jnp.where(store_snow, jnp.where(bury, one, sc_keep),
                            store_coverage)

    # ---- melt lane (calc_snow_coverage.c:82-141) ----
    thin = jnp.logical_and(store_swq > 0.0, swq < old_swq)
    m_ssw1 = jnp.where(thin, store_swq + swq - old_swq, store_swq)
    cleared = jnp.logical_and(thin, m_ssw1 <= 0.0)  # stored new snow all gone
    m_ssw = jnp.where(cleared, 0.0, m_ssw1)
    m_oldcov = jnp.where(cleared, store_coverage, old_coverage)
    m_store_cov = jnp.where(cleared, one, store_coverage)
    depleting = m_ssw == 0.0
    need_slope = jnp.logical_and(depleting, swq_slope == 0.0)
    m_slope = jnp.where(
        need_slope,
        jnp.where(old_depth > dfsc / 2.0, -dfsc, -2.0 * old_depth),
        swq_slope)
    m_max0 = jnp.where(need_slope, -m_slope, max_swq)
    m_store_snow = jnp.where(need_slope, True, store_snow)
    m_max = jnp.where(depleting, 2.0 * depth, m_max0)
    # rain/sublimation can raise swq mid-melt: coverage unchanged then
    reduce_cov = jnp.logical_and(
        depleting, jnp.logical_or(m_max < m_max0, m_max0 == 0.0))
    cov_red = jnp.minimum(
        -m_max / jnp.where(m_slope != 0.0, m_slope, -one), one)
    m_cov = jnp.where(jnp.logical_and(depleting, reduce_cov), cov_red,
                      m_oldcov)

    # ---- combine the three lanes ----
    pick = lambda a, m, u: jnp.where(accum, a, jnp.where(melting, m, u))
    return SnowCoverageResult(
        coverage=pick(one, m_cov, old_coverage),
        store_snow=pick(a_store_snow, m_store_snow, store_snow),
        store_swq=pick(a_store_swq, m_ssw, store_swq),
        swq_slope=pick(a_swq_slope, m_slope, swq_slope),
        store_coverage=pick(a_store_cov, m_store_cov, store_coverage),
        max_swq=pick(max_swq, m_max, max_swq))
