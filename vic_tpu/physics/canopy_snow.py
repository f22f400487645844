"""Canopy snow interception and the foliage energy balance.

Batched re-expression of:
- snow_intercept — /root/reference/snow_intercept.c:81-500 (Kobayashi 1986
  temperature-dependent interception capacity, wind-blown reduction, overload
  release, intercepted-snow energy balance with the two-pass 0C pattern and
  Brent Tfoliage solve, melt/drip, refreeze);
- CanopyEnergyBal residual — /root/reference/func_canopy_energy_bal.c:9-150
  (two-sided canopy longwave, sensible, sublimation latent, rain advection);
- MassRelease — /root/reference/massrelease.c:38-80 (recursive release in
  0.17*IntSnow increments above the 0.10*IntSnow drip threshold, re-expressed
  as a fixed-iteration masked loop).

Water units: meters over the step inside (like the reference), converted at
the boundary.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as c
from ..ops.rootfind import batched_brent
from .evap import svp
from .snow import stability_correction


class CanopySnowResult(NamedTuple):
    int_snow: jnp.ndarray        # canopy intercepted snow (m)
    int_rain: jnp.ndarray        # canopy intercepted liquid (m)
    snow_throughfall: jnp.ndarray  # m
    rain_throughfall: jnp.ndarray  # m (includes drip + released mass)
    tfoliage: jnp.ndarray
    vapor_flux: jnp.ndarray      # m/step canopy sublimation (positive = loss)
    temp_int_storage: jnp.ndarray
    fbflag: jnp.ndarray
    latent: jnp.ndarray
    latent_sub: jnp.ndarray
    sensible: jnp.ndarray
    net_long_over: jnp.ndarray
    net_short_over: jnp.ndarray  # canopy-absorbed net SW of the taken branch
    canopy_evap_mm: jnp.ndarray  # liquid interception evap (snow-free canopy
    #                              over ground snow, func_canopy_energy_bal.c
    #                              :88-111); 0 on snow-in-canopy lanes


def canopy_energy_terms(tfoliage, *, dt, lai_ra_over, air_dens, vp_air,
                        pressure, le, tcanopy, vpd, rainfall_m,
                        net_short_over, long_over_in, long_under_out,
                        int_rain, wind_over, z_ref, displacement, roughness,
                        has_csnow=None, ra_plain=None, liquid_evap=None):
    """CanopyEnergyBal terms at candidate Tfoliage
    (func_canopy_energy_bal.c:30-150). lai_ra_over: overstory aero
    resistance already x10 for snow smoothing (AR_406* family).

    has_csnow/ra_plain/liquid_evap: snow-free-canopy branch support
    (IntSnow == 0, func_canopy_energy_bal.c:88-111): the latent term comes
    from the liquid interception evaporation canopy_evap(CALC_EVAP=FALSE)
    at the unmodified overstory resistance (AR_406_FULL default:
    Ra.canopyIfOverstory), entered into the residual with the reference's
    own POSITIVE sign (+Le*Evap*rho_w, :110 — replicated as-is), and no
    refreeze/melt handling. liquid_evap(net_rad) -> (evap_mm, cevap_mm,
    throughfall_mm, wdew_new_mm)."""
    tkelv = tfoliage + c.KELVIN
    long_over_out = c.STEFAN_B * tkelv ** 4
    net_rad = (net_short_over + long_over_in + long_under_out
               - 2.0 * long_over_out)
    net_long_over = long_over_in - long_over_out

    # AR_406_FULL (the reference default, initialize_global.c:129): the
    # intercepted-snow branch multiplies the overstory resistance by 10 and
    # applies NO stability correction — StabilityCorrection runs only for
    # AR_COMBO/AR_410 (func_canopy_energy_bal.c:54-70). A stability-
    # corrected ra here INFLATED the resistance in stable winter air,
    # decoupling the foliage from the canopy air: Tfoliage ran ~7 C cold
    # (213-call replay median), vapor DEPOSITED on the canopy, and canopy
    # snow lingered ~2x longer than the C run.
    ra_snow = lai_ra_over

    es = svp(tfoliage)
    vmf = air_dens * (c.EPS_RATIO / pressure) * (vp_air - es) / ra_snow / c.RHO_W
    vmf = jnp.where(jnp.logical_and(vpd == 0.0, vmf < 0.0), 0.0, vmf)
    ls = (677.0 - 0.07 * tfoliage) * c.JOULES_PER_CAL * c.GRAMS_PER_KG
    latent_sub_snow = ls * vmf * c.RHO_W

    if liquid_evap is not None and has_csnow is not None:
        evap_mm, cevap_mm, thru_mm, wdew_mm = liquid_evap(net_rad)
        # Le(J/kg) * Evap(m/s) * rho_w(kg/m3) = W/m2
        latent_liq = le * (evap_mm / 1000.0 / dt) * c.RHO_W
        snowb = has_csnow
        latent = jnp.where(snowb, 0.0, latent_liq)
        latent_sub = jnp.where(snowb, latent_sub_snow, 0.0)
        vapor_flux = jnp.where(snowb, vmf * dt, 0.0)
        ra_over = jnp.where(snowb, ra_snow, ra_plain)
        cevap_mm = jnp.where(snowb, 0.0, cevap_mm)
    else:
        latent = jnp.zeros_like(latent_sub_snow)
        latent_sub = latent_sub_snow
        vapor_flux = vmf * dt  # m/step
        ra_over = ra_snow
        cevap_mm = jnp.zeros_like(latent_sub_snow)
        thru_mm = wdew_mm = None

    sensible = air_dens * c.CP * (tcanopy - tfoliage) / ra_over
    advected = 4186.8 * tcanopy * rainfall_m / dt
    refreeze = int_rain * c.LF * c.RHO_W / dt

    rest = sensible + latent + latent_sub + net_rad + advected
    melt_branch = jnp.logical_and(tfoliage == 0.0, rest > -refreeze)
    if has_csnow is not None:
        melt_branch = jnp.logical_and(melt_branch, has_csnow)
        rest_plus = jnp.where(has_csnow, rest + refreeze, rest)
    else:
        rest_plus = rest + refreeze
    refreeze_out = jnp.where(melt_branch, -rest, refreeze)
    rest_out = jnp.where(melt_branch, 0.0, rest_plus)
    return dict(rest=rest_out, refreeze=refreeze_out, vapor_flux=vapor_flux,
                latent=latent, latent_sub=latent_sub, sensible=sensible,
                net_long_over=net_long_over, advected=advected,
                canopy_evap_mm=cevap_mm, liq_throughfall_mm=thru_mm,
                liq_wdew_mm=wdew_mm)


def mass_release(int_snow, temp_int_storage, n_iter: int = 8):
    """Fixed-iteration MassRelease (massrelease.c): while melt storage exceeds
    the 10% threshold, release up to 17% of the intercepted snow per round.
    Returns (int_snow, temp_int_storage, released, drip)."""
    released = jnp.zeros_like(int_snow)
    drip = jnp.zeros_like(int_snow)

    def body(_, carry):
        isnow, tstore, rel, drp = carry
        big = isnow > c.MIN_INTERCEPTION_STORAGE
        threshold = 0.10 * isnow
        max_release = 0.17 * isnow
        do_release = jnp.logical_and(big, tstore >= threshold)
        amount = jnp.minimum(
            jnp.maximum(isnow - c.MIN_INTERCEPTION_STORAGE, 0.0), max_release)
        isnow2 = jnp.where(do_release, isnow - amount, isnow)
        rel2 = rel + jnp.where(do_release, amount, 0.0)
        # drip branch: storage drains as liquid
        do_drip = ~do_release
        tempdrip = jnp.minimum(tstore, isnow2)
        drp2 = drp + jnp.where(do_drip, tempdrip, 0.0)
        isnow3 = jnp.where(do_drip, isnow2 - tempdrip, isnow2)
        tstore2 = jnp.where(do_drip, tstore - tempdrip, tstore)
        return isnow3, tstore2, rel2, drp2

    int_snow, temp_int_storage, released, drip = jax.lax.fori_loop(
        0, n_iter, body, (int_snow, temp_int_storage, released, drip))
    return int_snow, temp_int_storage, released, drip


def snow_intercept(*, snowfall_mm, rainfall_mm, int_snow_m, int_rain_m,
                   tfoliage_old, temp_int_storage, lai, wdmax_mm,
                   air_dens, vp_air, vpd, pressure, le, tcanopy,
                   net_short_over, long_over_in, long_under_out,
                   ra_overstory, wind_over, z_ref, displacement, roughness,
                   dt_sec, f_cover=1.0, max_iter: int = 30,
                   active_mask=None, net_short_over_nosnow=None,
                   liquid_evap=None) -> CanopySnowResult:
    """Snow interception + foliage energy balance for overstory lanes
    (snow_intercept.c:81-500). All *_mm inputs in mm/step; canopy storages in m.

    Branches per snow_intercept.c:324-361: lanes whose canopy carries (or
    is receiving) snow solve the intercepted-snow EB (two-pass 0C + Brent
    on [Tfol-SNOW_DT, min(Tfol+SNOW_DT, 0)], melt/drip/refreeze epilogue);
    snow-FREE-canopy lanes (ground snow under a bare forest) solve the
    same foliage EB on the uncapped bracket with the latent term from the
    liquid interception evaporation (func_canopy_energy_bal.c:88-111) —
    net_short_over_nosnow is that branch's (1-bare_albedo) canopy SW
    (*AlbedoOver = bare_albedo, snow_intercept.c:355) and liquid_evap the
    canopy_evap(CALC_EVAP=FALSE) closure.
    """
    snowfall = snowfall_mm / 1000.0
    rainfall = rainfall_mm / 1000.0
    max_int = wdmax_mm / 1000.0
    int_snow = int_snow_m
    int_rain = int_rain_m
    F = f_cover

    # --- interception capacity (Kobayashi 1986; snow_intercept.c:105-130) ---
    imax1 = 4.0 * c.LAI_SNOW_MULTIPLIER * lai
    max_snow_int_f = jnp.where(
        tfoliage_old > -1.0, 4.0,
        jnp.where(tfoliage_old > -3.0, tfoliage_old * 1.5 + 5.5, 1.0))
    max_snow_int = jnp.maximum(max_snow_int_f * c.LAI_SNOW_MULTIPLIER * lai,
                               1e-10)
    delta = (1.0 - int_snow / max_snow_int) * snowfall
    delta = jnp.clip(delta, 0.0, jnp.maximum(max_snow_int - int_snow, 0.0))
    # wind-blown reduction (snow_intercept.c:133-141)
    blown = jnp.where(
        jnp.logical_and(tfoliage_old < -3.0,
                        jnp.logical_and(delta > 0.0, wind_over > 1.0)),
        jnp.minimum((0.2 * wind_over - 0.2) * delta, delta), 0.0)
    delta = delta - blown
    delta = jnp.where(int_snow + delta > imax1, 0.0, delta)

    snow_thru = (snowfall - delta) * F + snowfall * (1.0 - F)
    # thin canopy snow falls through (snow_intercept.c:147-151)
    dump = jnp.logical_and(snowfall == 0.0, int_snow < c.MIN_SWQ_EB_THRES)
    snow_thru = snow_thru + jnp.where(dump, int_snow, 0.0)
    int_snow = jnp.where(dump, 0.0, int_snow + delta)

    # --- rain interception (snow_intercept.c:157-176) ---
    max_water = c.SNOW_LIQUID_WATER_CAPACITY * int_snow + max_int
    fits = (int_rain + rainfall) <= max_water
    rain_thru = jnp.where(fits, rainfall * (1.0 - F),
                          (int_rain + rainfall - max_water) * F
                          + rainfall * (1.0 - F))
    int_rain = jnp.where(fits, int_rain + rainfall * F, max_water)
    dump_r = jnp.logical_and(rainfall == 0.0, int_rain < c.MIN_SWQ_EB_THRES)
    rain_thru = rain_thru + jnp.where(dump_r, int_rain, 0.0)
    int_rain = jnp.where(dump_r, 0.0, int_rain)

    # --- structural overload (snow_intercept.c:186-196) ---
    total = int_rain + int_snow
    over = jnp.maximum(total - imax1, 0.0)
    frac_rain = jnp.where(total > 0.0, int_rain / jnp.maximum(total, 1e-12),
                          0.0)
    rain_thru = rain_thru + over * frac_rain * F
    snow_thru = snow_thru + over * (1.0 - frac_rain) * F
    int_rain = int_rain - over * frac_rain
    int_snow = int_snow - over * (1.0 - frac_rain)

    # --- foliage energy balance (two-pass 0C + Brent) ---
    # branch selector (snow_intercept.c:324): canopy snow present or
    # arriving -> intercepted-snow EB; else the snow-free-canopy EB
    has_csnow = jnp.logical_or(int_snow > 0.0, snowfall > 0.0)
    if net_short_over_nosnow is not None:
        ns_over = jnp.where(has_csnow, net_short_over, net_short_over_nosnow)
    else:
        ns_over = net_short_over
    term_kwargs = dict(
        dt=dt_sec, lai_ra_over=ra_overstory * 10.0, air_dens=air_dens,
        vp_air=vp_air, pressure=pressure, le=le, tcanopy=tcanopy, vpd=vpd,
        rainfall_m=rainfall, net_short_over=ns_over,
        long_over_in=long_over_in, long_under_out=long_under_out,
        int_rain=int_rain, wind_over=wind_over, z_ref=z_ref,
        displacement=displacement, roughness=roughness)
    if liquid_evap is not None:
        term_kwargs.update(has_csnow=has_csnow, ra_plain=ra_overstory,
                           liquid_evap=liquid_evap)

    t0 = canopy_energy_terms(jnp.zeros_like(tfoliage_old), **term_kwargs)
    # melt pass only exists on the snow branch (Qnet at T=0,
    # snow_intercept.c:341-350); snow-free lanes always iterate
    melt_cond = jnp.logical_and(t0["rest"] == 0.0, has_csnow)

    def resid(t):
        return canopy_energy_terms(t, **term_kwargs)["rest"]

    brent_active = ~melt_cond if active_mask is None else \
        jnp.logical_and(~melt_cond, active_mask)
    # snow branch (snow_intercept.c:344-348): Tupper = 0 ALWAYS and
    # Tlower = Tfol-SNOW_DT (or -SNOW_DT for a warm foliage) — an upper
    # bound of min(Tfol+DT, 0) would exclude the warm roots of a cold
    # canopy and bias Tfoliage cold (measured: vapor DEPOSITED on the
    # canopy and snow lingered ~2x longer than the C run).
    # snow-free branch: the symmetric bracket (:358-360). Both expand per
    # root_brent.c:183-190 like every reference functor.
    t_lower = jnp.where(
        has_csnow,
        jnp.where(tfoliage_old <= 0.0, tfoliage_old - c.SNOW_DT,
                  -c.SNOW_DT),
        tfoliage_old - c.SNOW_DT)
    t_upper = jnp.where(has_csnow, 0.0, tfoliage_old + c.SNOW_DT)
    res = batched_brent(resid, t_lower, t_upper,
                        max_iter=max_iter, active=brent_active)
    t_cold = jnp.where(res.converged, res.root, tfoliage_old)
    fbflag = jnp.logical_and(~melt_cond, ~res.converged)
    tfoliage = jnp.where(melt_cond, 0.0, t_cold)
    terms = canopy_energy_terms(tfoliage, **term_kwargs)

    refreeze_j = terms["refreeze"] * dt_sec

    # vapor flux adjustment vs intercepted snow
    vflux = terms["vapor_flux"]
    vflux = jnp.where(-vflux > int_snow, -int_snow, vflux)
    int_snow = jnp.maximum(int_snow + vflux, 0.0)

    # --- melt / drip / refreeze bookkeeping (snow_intercept.c:300-420,
    # massrelease.c) — restructured to be exactly mass-conserving:
    # melt moves snow->liquid; liquid above holding capacity drips; a large
    # ripe pack also structurally releases snow mass.
    melting = tfoliage == 0.0
    melt_eff = jnp.where(
        jnp.logical_and(melting, refreeze_j < 0.0),
        jnp.minimum(-refreeze_j / (c.LF * c.RHO_W), int_snow), 0.0)
    int_snow = int_snow - melt_eff
    int_rain = int_rain + melt_eff

    # liquid holding capacity overflow -> drip (snow_intercept.c:390-400)
    max_water = c.SNOW_LIQUID_WATER_CAPACITY * int_snow + max_int
    drip = jnp.maximum(int_rain - max_water, 0.0)
    int_rain = int_rain - drip

    # structural mass release when the pack is ripe (massrelease.c: release
    # up to 17% of the pack above MIN_INTERCEPTION_STORAGE when melt
    # outflow exceeds 10% of the pack)
    ripe = jnp.logical_and(int_snow > c.MIN_INTERCEPTION_STORAGE,
                           drip + melt_eff >= 0.10 * int_snow)
    released = jnp.where(
        ripe,
        jnp.minimum(jnp.maximum(int_snow - c.MIN_INTERCEPTION_STORAGE, 0.0),
                    0.17 * int_snow), 0.0)
    int_snow = int_snow - released

    # refreeze branch (cold canopy): freeze intercepted rain
    frozen = jnp.where(~melting,
                       jnp.minimum(jnp.maximum(-refreeze_j, 0.0)
                                   / (c.LF * c.RHO_W), int_rain), 0.0)
    int_rain = int_rain - frozen
    int_snow = int_snow + frozen

    rain_thru_total = rain_thru + drip
    snow_thru_total = snow_thru + released
    tstore = jnp.where(melting, temp_int_storage + melt_eff, 0.0)

    cevap_mm = terms["canopy_evap_mm"]
    if liquid_evap is not None:
        # snow-free-canopy lanes: the liquid interception bookkeeping is
        # canopy_evap's (run inside the EB residual) — its throughfall
        # REPLACES the interception result and its Wdew becomes IntRain
        # (snow_intercept.c:424-425; veg_var->Wdew carries out)
        nb = ~has_csnow
        rain_thru_total = jnp.where(
            nb, terms["liq_throughfall_mm"] / 1000.0, rain_thru_total)
        int_rain = jnp.where(nb, terms["liq_wdew_mm"] / 1000.0, int_rain)
        int_snow = jnp.where(nb, 0.0, int_snow)
        tstore = jnp.where(nb, 0.0, tstore)
        cevap_mm = jnp.where(nb, cevap_mm, 0.0)
    vflux = jnp.where(has_csnow, vflux, 0.0)

    return CanopySnowResult(
        int_snow=int_snow, int_rain=int_rain,
        snow_throughfall=snow_thru_total, rain_throughfall=rain_thru_total,
        tfoliage=tfoliage, vapor_flux=-vflux,
        temp_int_storage=tstore,
        fbflag=fbflag, latent=terms["latent"],
        latent_sub=terms["latent_sub"], sensible=terms["sensible"],
        net_long_over=terms["net_long_over"],
        net_short_over=ns_over,
        canopy_evap_mm=cevap_mm)
