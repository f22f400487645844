"""Glacier bare-ice surface energy balance and ablation.

Batched re-expression of the PCIC glacier extension:
- GlacierEnergyBalance residual — /root/reference/GlacierEnergyBalance.c:calculate
  (ice slab at TGrnd = GLAC_TEMP = 0 C; ground flux through the surface layer
  with Slack-1980 conductivity GLAC_K_ICE - 0.0142*Tsurf)
- glacier_melt — /root/reference/glacier_melt.c:65-205 (two-pass 0C pattern:
  melt when the 0C residual is non-negative, else Brent solve in
  [Told-SNOW_DT, Told+SNOW_DT], TFALLBACK, cold content of the active layer)
- latent_heat_from_glacier — /root/reference/latent_heat_from_glacier.c

The glacier water reservoir (K = KMIN + DK*exp(-A*swe); outflow = K*storage,
surface_fluxes_glac.c:586-608) lives in model.py since it couples to the
snowpack state.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as c
from ..ops.rootfind import batched_brent
from .evap import svp
from .snow import stability_correction


class GlacierEBTerms(NamedTuple):
    rest: jnp.ndarray
    melt_energy: jnp.ndarray      # available melt energy at T=0 (W/m^2)
    vapor_flux: jnp.ndarray       # m/step
    latent: jnp.ndarray
    latent_sub: jnp.ndarray
    sensible: jnp.ndarray
    advection: jnp.ndarray
    delta_cc: jnp.ndarray
    grnd_flux: jnp.ndarray
    net_long: jnp.ndarray


def glacier_energy_terms(tsurf, *, dt, ra, z_ref, roughness, air_dens, vp_air,
                         longwave_in, lv, pressure, rain_m, net_short, vpd,
                         wind, old_tsurf, ice_depth_mm, tair,
                         tgrnd=c.GLAC_TEMP) -> GlacierEBTerms:
    """All glacier surface EB terms at candidate tsurf
    (GlacierEnergyBalance.c:calculate)."""
    tmean = (tsurf + tgrnd) / 2.0
    old_tmean = (old_tsurf + tgrnd) / 2.0
    ice_depth = ice_depth_mm / 1000.0

    ra_corr = jnp.where(
        wind > 0.0,
        ra / stability_correction(z_ref, 0.0, tsurf, tair, wind, roughness),
        c.HUGE_RESIST)

    tkelv = tsurf + c.KELVIN
    net_long = longwave_in - c.STEFAN_B * tkelv ** 4
    net_rad = net_short + net_long
    sensible = air_dens * c.CP * (tair - tsurf) / ra_corr

    # latent_heat_from_glacier.c (single vapor flux term)
    es = svp(tsurf)
    vapor_mass_flux = air_dens * (c.EPS_RATIO / pressure) * (vp_air - es) / ra_corr
    vapor_mass_flux = jnp.where(
        jnp.logical_and(vpd == 0.0, vapor_mass_flux < 0.0), 0.0,
        vapor_mass_flux)
    ls = (677.0 - 0.07 * tsurf) * c.JOULES_PER_CAL * c.GRAMS_PER_KG
    latent = jnp.where(tsurf >= 0.0, lv * vapor_mass_flux, 0.0)
    latent_sub = jnp.where(tsurf >= 0.0, 0.0, ls * vapor_mass_flux)
    vapor_flux = vapor_mass_flux * dt / c.RHO_W

    advection = jnp.where(tsurf == 0.0, c.CH_WATER * tair * rain_m / dt, 0.0)
    delta_cc = c.CH_ICE * ice_depth * (tmean - old_tmean) / dt
    grnd_flux = (c.GLAC_K_ICE + tsurf * (-0.0142)) * (tgrnd - tsurf) / \
        jnp.maximum(ice_depth, 1e-6)

    fbal = net_rad + sensible + latent + latent_sub + advection
    rest = fbal - delta_cc + grnd_flux
    melt_energy = rest
    rest = jnp.where(jnp.logical_and(tsurf == 0.0, rest >= 0.0), 0.0, rest)
    return GlacierEBTerms(rest=rest, melt_energy=melt_energy,
                          vapor_flux=vapor_flux, latent=latent,
                          latent_sub=latent_sub, sensible=sensible,
                          advection=advection, delta_cc=delta_cc,
                          grnd_flux=grnd_flux, net_long=net_long)


class GlacierAblationResult(NamedTuple):
    melt_mm: jnp.ndarray       # mm/step of ice melt
    surf_temp: jnp.ndarray
    cold_content: jnp.ndarray
    vapor_flux: jnp.ndarray    # m/step (sign flipped like glacier_melt.c:200)
    fbflag: jnp.ndarray
    terms: GlacierEBTerms


def glacier_ablation(*, tair, net_short, longwave_in, wind, vp_air, vpd,
                     air_dens, pressure, le, rain_mm, ra, z_ref, roughness,
                     old_tsurf, glac_surf_thick, dt_sec,
                     max_iter: int = 30, active_mask=None) -> GlacierAblationResult:
    """Bare-ice ablation for glacier HRU lanes (glacier_melt.c:65-205).

    glac_surf_thick: the surface-layer THICKNESS (mm) — the reference
    passes soil->GLAC_SURF_THICK as the EB's IceDepth (glacier_melt.c:123)
    and uses it for the cold content too (:200); GLAC_SURF_WE is the
    separate mass bookkeeping term. (Round 5: previously the WE was used
    for both — identical in the synthetic/oracle soils where both are
    200 mm, an 8% ground-flux scale error with the PCIC defaults
    thick=100/we=91.7.)"""
    rain_m = rain_mm / 1000.0
    kwargs = dict(dt=dt_sec, ra=ra, z_ref=z_ref, roughness=roughness,
                  air_dens=air_dens, vp_air=vp_air, longwave_in=longwave_in,
                  lv=le, pressure=pressure, rain_m=rain_m,
                  net_short=net_short, vpd=vpd, wind=wind,
                  old_tsurf=old_tsurf, ice_depth_mm=glac_surf_thick, tair=tair)

    t0 = jnp.zeros_like(tair)
    terms0 = glacier_energy_terms(t0, **kwargs)
    melt_cond = terms0.rest == 0.0
    melt_mm = jnp.where(melt_cond,
                        jnp.maximum(terms0.melt_energy, 0.0)
                        / (c.LF * c.RHO_W) * dt_sec * 1000.0,
                        0.0)

    def resid(t):
        return glacier_energy_terms(t, **kwargs).rest

    brent_active = ~melt_cond if active_mask is None else \
        jnp.logical_and(~melt_cond, active_mask)
    res = batched_brent(resid, old_tsurf - c.SNOW_DT, old_tsurf + c.SNOW_DT,
                        max_iter=max_iter, max_tries=1, active=brent_active)
    t_cold = jnp.where(res.converged, res.root, old_tsurf)  # TFALLBACK
    fbflag = jnp.logical_and(~melt_cond, ~res.converged)

    surf_temp = jnp.where(melt_cond, 0.0, t_cold)
    terms = glacier_energy_terms(surf_temp, **kwargs)
    cold_content = jnp.where(
        melt_cond, 0.0,
        c.CH_ICE * surf_temp * glac_surf_thick / 1000.0)

    return GlacierAblationResult(
        melt_mm=melt_mm, surf_temp=surf_temp, cold_content=cold_content,
        vapor_flux=-terms.vapor_flux, fbflag=fbflag, terms=terms)
