"""Soil-surface energy balance residual and solver.

Batched re-expression of the reference's `SurfEnergyBal` functor
(/root/reference/func_surf_energy_bal.c:calculate, driven by
/root/reference/calc_surf_energy_bal.c:7-520):

- quick-flux ground heat via estimate_T1 (Liang et al. 1999) with the GF_406 /
  GF_410 ground-flux variants;
- deltaH heat-storage and fusion terms over the node-0..1 region;
- evapotranspiration evaluated INSIDE the residual (canopy_evap for vegetated,
  arno_evap for bare/LAI==0 lanes) exactly as the reference does
  (func_surf_energy_bal.c:320-336);
- Richardson-number stability-corrected aerodynamic resistance;
- the thin-snow INCLUDE_SNOW terms (snow flux through a shallow pack).

In water-balance mode (FULL_ENERGY=FALSE) the residual is evaluated ONCE at
Ts = Tair (calc_surf_energy_bal.c:300-307); in full-energy mode the surface
temperature is a batched Brent root of this residual bracketed +/-SURF_DT around
0.5*(T0_old + Tair) (calc_surf_energy_bal.c:277-346), with TFALLBACK.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as c
from ..ops.rootfind import batched_brent
from .evap import arno_beta, arno_evap, canopy_evap
from .snow import latent_heat_from_snow, stability_correction
from .soil_thermal import estimate_t1, maximum_unfrozen_water


class SurfEBResult(NamedTuple):
    error: jnp.ndarray          # residual (W/m^2)
    t1: jnp.ndarray             # between-layer temperature estimate
    grnd_flux: jnp.ndarray
    delta_h: jnp.ndarray
    fusion: jnp.ndarray
    latent_heat: jnp.ndarray
    latent_heat_sub: jnp.ndarray
    sensible_heat: jnp.ndarray
    snow_flux: jnp.ndarray
    net_long_bare: jnp.ndarray
    net_short_bare: jnp.ndarray
    evap: jnp.ndarray           # total ET (mm/step) on snow-free fraction
    layer_evap: jnp.ndarray     # [..., n_layer] mm/step (WET lane)
    canopy_evap_mm: jnp.ndarray
    throughfall: jnp.ndarray
    wdew_new: jnp.ndarray
    refreeze_energy: jnp.ndarray
    delta_cc: jnp.ndarray
    # DRY-lane extras (DIST_PRCP; canopy_evap.c:124-146 dist loop). Zero /
    # aliases of the wet lane when dist is disabled.
    layer_evap_dry: jnp.ndarray = None
    canopy_evap_mm_dry: jnp.ndarray = None
    throughfall_dry: jnp.ndarray = None
    wdew_new_dry: jnp.ndarray = None
    evap_dry: jnp.ndarray = None
    # finite-difference path (QUICK_FLUX FALSE): the node profile solved at
    # this candidate Ts (func_surf_energy_bal.c:190-228) and its per-node
    # TFALLBACK counts. None on the quick-flux path.
    t_nodes: jnp.ndarray = None
    node_fbcount: jnp.ndarray = None
    # INCLUDE_SNOW lanes: pack vapor exchange solved in this balance
    # (m water equivalent per step via the reference's ice_density
    # conversion roundtrip, func_surf_energy_bal.c:345-360)
    inc_vapor_flux: jnp.ndarray = None


def surf_energy_terms(
        ts, *,
        # thermal state / geometry
        ts_old, t1_old, t2, d1, d2, kappa1, kappa2, cs1, cs2, dp, delta_t,
        # frozen soil
        moist0_vol, max_moist0_vol, ice0_vol, bubble0, expt0, fs_active,
        # forcing / met at this sub-step
        tair, vpd, vp_air, shortwave_net_bare, long_bare_in, atmos_density,
        atmos_pressure, elevation, latent_heat_le,
        # aero
        ra_under, z_ref, displacement, roughness, wind, overstory_snowing,
        # vegetation / evap inputs
        is_veg, lai, wdew, wdmax, rmin, rgl, rarc, root,
        ra_canopy, displacement_canopy, roughness_canopy, ref_height_canopy,
        rainfall, moist_l, ice_l, wcr, wpwp, depth_l, resid_moist0, b_infilt,
        max_moist_l,
        # snow coupling
        snow_coverage, surf_atten, include_snow=False, snow_terms=None,
        kappa_snow=None, tsnow_surf=None, melt_energy=None,
        grnd_flux_type: int = 1, frozen_soil: bool = False,
        compute_evap: bool = True, dist_dry: dict = None,
        mu_wet=None, evap_pre: dict = None,
        evap_pre_dry: dict = None, fd_solve=None, fd_interp=None,
        fd_given=None, inc_mask=None, inc_terms=None) -> SurfEBResult:
    """Evaluate every term of the surface energy balance at candidate Ts.

    kappa_snow/tsnow_surf: pack->soil conduction coupling for snow-covered
    lanes (func_surf_energy_bal.c:148-156: snow_flux = kappa_snow *
    (Tsnow_surf - Ts), weighted by snow_coverage in the residual;
    kappa_snow = K_SNOW*density^2/depth, calc_surf_energy_bal.c:254).
    melt_energy: energy used in reducing the snow-covered area
    (solve_snow.c:421-448), an additional residual source term.

    inc_mask/inc_terms: per-lane INCLUDE_SNOW — thin packs whose surface
    layer holds <= MIN_SWQ_EB_THRES are solved IN this balance
    (func_surf_energy_bal.c:157-161 snow_flux=0 & Tsnow_surf=TMean,
    :279-286 pack deltaCC/refreeze incl. the Lf*snow_DENSITY quirk,
    :342-362 pack latent at the surface resistance, :370-373 unscaled
    sensible, :388-397 refreeze two-pass at TMean==0). inc_terms keys:
    swq, surf_water, density, old_tsurf, advection0, lw_snow_in,
    net_short_snow_cov, cov, blowing_flux."""
    tmean = ts
    tkelv = tmean + c.KELVIN

    # pack conduction / thin-snow flux (func_surf_energy_bal.c:148-161)
    if include_snow and snow_terms is not None:
        kappa_snow, tsnow_surf, snow_swq, snow_water, snow_density, old_tsurf \
            = snow_terms
        snow_flux = kappa_snow * (tsnow_surf - tmean)
    elif kappa_snow is not None:
        snow_flux = kappa_snow * (tsnow_surf - tmean)
    else:
        snow_flux = jnp.zeros_like(tmean)
    if inc_mask is not None:
        # INCLUDE_SNOW lanes: no separate pack conduction
        # (func_surf_energy_bal.c:157-161)
        snow_flux = jnp.where(inc_mask, 0.0, snow_flux)

    cover_atten = snow_coverage + (1.0 - snow_coverage) * surf_atten
    t_nodes = None
    node_fbcount = None
    if fd_given is not None or fd_interp is not None or fd_solve is not None:
        # finite-difference path (QUICK_FLUX FALSE): the node profile with
        # THIS CANDIDATE Ts as the node-0 Dirichlet BC
        # (func_surf_energy_bal.c:185-228: T_node[0] = TMean;
        # solve_T_profile[_implicit]; T1 = Tnew_node[1]); grnd_flux from the
        # node-1/2 gradient — no exp(-D1/dp) damping term here
        # (func_surf_energy_bal.c:234-240), D1/D2 are node spacings
        # (calc_surf_energy_bal.c:242-243).
        # Three ways to obtain the profile, by cost:
        #  - fd_given: a ProfileResult already solved at this Ts (the final
        #    evaluation after the root is accepted);
        #  - fd_interp: (ts_a, T_a, ts_b, T_b) — affine interpolation of two
        #    reference solves. With the parity-default ice quirk the solved
        #    profile IS affine in the boundary condition wherever node ice
        #    is zero or the node TFALLBACKs to its old temperature (both
        #    make T_j constant-or-linear in Ts), so inside the Brent this is
        #    exact for the dominant lanes and O(bracket^2) elsewhere —
        #    at ~1/1000 the sequential depth of a nested sweep per residual;
        #  - fd_solve: the full quirk-faithful Gauss-Seidel solve
        #    (frozen_soil.solve_t_profile_explicit) per evaluation.
        if fd_given is not None:
            t_nodes = fd_given.temp
            node_fbcount = fd_given.fbcount
        elif fd_interp is not None:
            ts_a, t_a, ts_b, t_b = fd_interp
            wq = ((tmean - ts_a) / (ts_b - ts_a))[..., None]
            t_nodes = t_a + wq * (t_b - t_a)
        else:
            prof = fd_solve(tmean)
            t_nodes = prof.temp
            node_fbcount = prof.fbcount
        t1 = t_nodes[..., 1]
        if grnd_flux_type == 0:  # GF_406
            grnd_flux = cover_atten * (kappa1 / d1 * (t1 - tmean))
        else:  # GF_410 / GF_FULL
            grnd_flux = cover_atten * (
                kappa1 / d1 * (t1 - tmean)
                + kappa2 / d2 * (t_nodes[..., 2] - t1)) / 2.0
    else:
        # quick-flux ground heat (func_surf_energy_bal.c:171-181)
        t1 = estimate_t1(tmean, t1_old, t2, d1, d2, kappa1, kappa2, cs1, cs2,
                         dp, delta_t)
        if grnd_flux_type == 0:  # GF_406
            grnd_flux = cover_atten * (kappa1 / d1 * (t1 - tmean))
        else:  # GF_410 / GF_FULL
            grnd_flux = cover_atten * (
                kappa1 / d1 * (t1 - tmean)
                + (kappa2 / d2 * (1.0 - jnp.exp(-d1 / dp)) * (t2 - t1))) / 2.0

    # heat storage between nodes 0 and 1 (func_surf_energy_bal.c:249-254)
    delta_h_full = cs1 * ((ts_old + t1_old) - (tmean + t1)) * d1 / delta_t / 2.0
    delta_h = jnp.where(grnd_flux_type == 2, cover_atten * delta_h_full,
                        delta_h_full)

    # fusion (func_surf_energy_bal.c:260-275)
    if frozen_soil:
        tavg01 = (tmean + t1) / 2.0
        ice_new = jnp.where(
            tavg01 < 0.0,
            jnp.maximum(moist0_vol - maximum_unfrozen_water(
                tavg01, max_moist0_vol, bubble0, expt0), 0.0),
            0.0)
        fusion_full = -c.ICE_DENSITY * c.LF * (ice0_vol - ice_new) * d1 / delta_t
        fusion = jnp.where(
            jnp.asarray(grnd_flux_type == 2),
            cover_atten * fusion_full, fusion_full)
        fusion = jnp.where(fs_active, fusion, 0.0)
    else:
        fusion = jnp.zeros_like(tmean)

    # thin-snow cold content/refreeze (func_surf_energy_bal.c:279-286)
    if include_snow and snow_terms is not None:
        delta_cc = jnp.where(
            tmean > 0.0,
            c.CH_ICE * (snow_swq - snow_water) * (0.0 - old_tsurf) / delta_t,
            c.CH_ICE * (snow_swq - snow_water) * (tmean - old_tsurf) / delta_t)
        refreeze_energy = (snow_water * c.LF * snow_density) / delta_t
        delta_cc = delta_cc * snow_coverage
        refreeze_energy = refreeze_energy * snow_coverage
    else:
        delta_cc = jnp.zeros_like(tmean)
        refreeze_energy = jnp.zeros_like(tmean)
    if inc_mask is not None:
        i_sw = inc_terms["surf_water"]
        i_dry = inc_terms["swq"] - i_sw
        dcc_i = jnp.where(
            tmean > 0.0,
            c.CH_ICE * i_dry * (0.0 - inc_terms["old_tsurf"]) / delta_t,
            c.CH_ICE * i_dry * (tmean - inc_terms["old_tsurf"]) / delta_t)
        # Lf * snow DENSITY (not rho_w): the reference's own expression
        # (func_surf_energy_bal.c:284)
        rfz_i = (i_sw * c.LF * inc_terms["density"]) / delta_t
        cov_i = inc_terms["cov"]
        delta_cc = jnp.where(inc_mask, dcc_i * cov_i, delta_cc)
        refreeze_energy = jnp.where(inc_mask, rfz_i * cov_i,
                                    refreeze_energy)

    # net radiation on snow-free area (func_surf_energy_bal.c:291-295)
    long_bare_out = c.STEFAN_B * tkelv ** 4
    net_long_bare = long_bare_in - (1.0 - snow_coverage) * long_bare_out
    net_bare_rad = (shortwave_net_bare + net_long_bare + grnd_flux + delta_h
                    + fusion)

    # stability-corrected resistance (func_surf_energy_bal.c:298-310)
    d_eff = jnp.where(overstory_snowing, 0.0, displacement)
    ra_used = jnp.where(
        wind > 0.0,
        ra_under / stability_correction(z_ref, d_eff, tmean, tair, wind,
                                        roughness),
        c.HUGE_RESIST)

    # evapotranspiration inside the residual (func_surf_energy_bal.c:320-336).
    # With DIST_PRCP the reference loops canopy_evap/arno_evap over the
    # wet/dry columns and mu-weights the total into the latent-heat term
    # (canopy_evap.c:124-206, arno_evap.c:92-99); here the two lanes are two
    # batched evaluations combined with weights (mu, 1-mu).
    def _lane_evap(moist_d, ice_d, wdew_d, rainfall_d, pre=None):
        # `pre` carries ts-independent precomputations hoisted out of the
        # Brent iteration by the caller (surface-T solve); recomputed here
        # when absent
        pre = pre or {}
        evap_veg, layer_evap_veg, cevap_veg, thrufall_veg, wdew_veg = \
            canopy_evap(moist_d, ice_d, wcr, wpwp, root, depth_l,
                        wdew_d, rainfall_d, wdmax, rmin, rgl, lai, rarc,
                        net_bare_rad, shortwave_net_bare, vpd, tair, elevation,
                        ra_canopy, delta_t, pre=(pre or None))
        evap_bare = arno_evap(moist_d[..., 0], ice_d[..., 0],
                              max_moist_l[..., 0], depth_l[..., 0],
                              resid_moist0, b_infilt, net_bare_rad, tair, vpd,
                              elevation, ra_used, delta_t,
                              beta=pre.get("arno_beta"),
                              coeffs=pre.get("coeffs"))
        veg = jnp.logical_and(is_veg, lai > 0.0)
        evap_d = jnp.where(veg, evap_veg, evap_bare)
        layer_evap_d = jnp.where(
            veg[..., None],
            layer_evap_veg,
            jnp.concatenate([evap_bare[..., None],
                             jnp.zeros_like(layer_evap_veg[..., 1:])], -1))
        return (evap_d, layer_evap_d, jnp.where(veg, cevap_veg, 0.0),
                jnp.where(veg, thrufall_veg, rainfall_d),
                jnp.where(veg, wdew_veg, wdew_d))

    dry = dict(layer_evap_dry=None, canopy_evap_mm_dry=None,
               throughfall_dry=None, wdew_new_dry=None, evap_dry=None)
    if compute_evap:
        evap, layer_evap, canopy_evap_mm, throughfall, wdew_new = \
            _lane_evap(moist_l, ice_l, wdew, rainfall, pre=evap_pre)
        if dist_dry is not None:
            evap_d, le_d, ce_d, tf_d, wd_d = _lane_evap(
                dist_dry["moist_l"], dist_dry["ice_l"], dist_dry["wdew"],
                dist_dry["rainfall"], pre=evap_pre_dry)
            dry = dict(layer_evap_dry=le_d, canopy_evap_mm_dry=ce_d,
                       throughfall_dry=tf_d, wdew_new_dry=wd_d,
                       evap_dry=evap_d)
            # latent heat sees the cell-average ET (canopy_evap.c:206)
            evap = mu_wet * evap + (1.0 - mu_wet) * evap_d
    else:
        evap = jnp.zeros_like(tmean)
        layer_evap = jnp.zeros_like(moist_l)
        canopy_evap_mm = jnp.zeros_like(tmean)
        throughfall = rainfall
        wdew_new = wdew

    # latent heat (func_surf_energy_bal.c:339-363); evap in mm/step -> m/s
    latent_heat = -c.RHO_W * latent_heat_le * (evap / 1000.0 / delta_t)
    latent_heat_sub = jnp.zeros_like(tmean)
    if include_snow and snow_terms is not None:
        lat_s, lat_sub_s, _ = latent_heat_from_snow(
            atmos_density, vp_air, latent_heat_le, atmos_pressure, ra_used,
            tmean, vpd)
        latent_heat = latent_heat + lat_s * snow_coverage
        latent_heat_sub = lat_sub_s * snow_coverage
    else:
        latent_heat = latent_heat * (1.0 - snow_coverage)

    inc_vapor_flux = None
    if inc_mask is not None:
        lat_i, lat_sub_i, vmf_i = latent_heat_from_snow(
            atmos_density, vp_air, latent_heat_le, atmos_pressure, ra_used,
            tmean, vpd, inc_terms["blowing_flux"])
        cov_i = inc_terms["cov"]
        # SNOWING lanes carry no soil evap in the residual
        # (func_surf_energy_bal.c:319-336 Evap=0); the pack's latent runs
        # at the surface resistance
        latent_heat = jnp.where(inc_mask, lat_i * cov_i, latent_heat)
        latent_heat_sub = jnp.where(inc_mask, lat_sub_i * cov_i,
                                    latent_heat_sub)
        # m water-equivalent/step via the reference's kg/m2s <->
        # m-ice-equivalent roundtrip (:345-360)
        inc_vapor_flux = jnp.where(inc_mask,
                                   vmf_i * delta_t / c.ICE_DENSITY, 0.0)

    # sensible heat (func_surf_energy_bal.c:366-372)
    sensible_raw = atmos_density * c.CP * (tair - tmean) / ra_used
    sensible = sensible_raw
    if not include_snow:
        sensible = sensible * (1.0 - snow_coverage)
    sensible = jnp.where(
        jnp.logical_and(snow_coverage >= 1.0,
                        jnp.logical_not(include_snow)),
        0.0, sensible)
    if inc_mask is not None:
        # unscaled on INCLUDE_SNOW lanes (func_surf_energy_bal.c:370-373)
        sensible = jnp.where(inc_mask, sensible_raw, sensible)

    error = (net_bare_rad + sensible + latent_heat + latent_heat_sub
             + snow_flux * snow_coverage - delta_cc)
    if melt_energy is not None:
        # energy used in reducing the snow-covered area enters the exposed
        # ground's balance (func_surf_energy_bal.c:377 "+ melt_energy")
        error = error + melt_energy
    if include_snow and snow_terms is not None:
        melt_branch = jnp.logical_and(tsnow_surf == 0.0,
                                      error > -refreeze_energy)
        refreeze_energy = jnp.where(melt_branch, -error, refreeze_energy)
        error = jnp.where(melt_branch, 0.0, error + refreeze_energy)
    if inc_mask is not None:
        # pack terms of the joint balance (func_surf_energy_bal.c:378-387):
        # rain advection from the 0C pass, net pack SW, net pack LW; the
        # coverage-reduction melt_energy is zeroed when the fold triggers
        # (surface_fluxes.c:556)
        nls_i = (inc_terms["lw_snow_in"]
                 - inc_terms["cov"] * c.STEFAN_B * tkelv ** 4)
        inc_extra = (inc_terms["advection0"]
                     + inc_terms["net_short_snow_cov"] + nls_i
                     - (melt_energy if melt_energy is not None else 0.0))
        error = error + jnp.where(inc_mask, inc_extra, 0.0)
        # refreeze two-pass at TMean == 0 (Tsnow_surf := TMean,
        # func_surf_energy_bal.c:388-397)
        melt_i = jnp.logical_and(inc_mask, jnp.logical_and(
            tmean == 0.0, error > -refreeze_energy))
        refreeze_energy = jnp.where(melt_i, -error, refreeze_energy)
        error = jnp.where(
            melt_i, 0.0,
            jnp.where(inc_mask, error + refreeze_energy, error))

    return SurfEBResult(
        error=error, t1=t1, grnd_flux=grnd_flux, delta_h=delta_h,
        fusion=fusion, latent_heat=latent_heat,
        latent_heat_sub=latent_heat_sub, sensible_heat=sensible,
        snow_flux=snow_flux, net_long_bare=net_long_bare,
        net_short_bare=shortwave_net_bare, evap=evap, layer_evap=layer_evap,
        canopy_evap_mm=canopy_evap_mm, throughfall=throughfall,
        wdew_new=wdew_new, refreeze_energy=refreeze_energy, delta_cc=delta_cc,
        t_nodes=t_nodes, node_fbcount=node_fbcount,
        inc_vapor_flux=inc_vapor_flux, **dry)


def solve_surface_temperature(kwargs, t0_old, tair, full_energy: bool,
                              include_snow: bool = False,
                              max_iter: int = 30, active=None,
                              fd_affine: bool = False):
    """Find the surface temperature and return (Ts, fbflag, fd_interp).

    Water-balance mode: Ts = Tair, no iteration (calc_surf_energy_bal.c:300).
    Full-energy mode: Brent on [mid-SURF_DT, mid+SURF_DT] with
    mid = 0.5*(T0_old+Tair) (or [T0-SURF_DT, 0] with thin snow), TFALLBACK to
    the bracket midpoint on failure.

    fd_affine (QUICK_FLUX FALSE fast path): instead of re-running the full
    node-profile Gauss-Seidel sweep inside every Brent residual evaluation
    (the reference's literal structure, func_surf_energy_bal.c:190-228), the
    profile is solved ONCE at each bracket endpoint and interpolated
    affinely in between — exact at both endpoints (so the bracketing test
    sees true residuals), exact in the interior wherever the profile
    responds affinely to the BC (zero node ice, or TFALLBACK-pinned nodes),
    and O((2*SURF_DT)^2) elsewhere.  The returned fd_interp tuple lets the
    caller evaluate the accepted root's EB terms at the same cost.
    """
    if not full_energy:
        return tair, jnp.zeros_like(tair, dtype=bool), None

    if include_snow:
        t_lower = t0_old - c.SURF_DT
        t_upper = jnp.zeros_like(t0_old)
    else:
        mid = 0.5 * (t0_old + tair)
        t_lower = mid - c.SURF_DT
        t_upper = mid + c.SURF_DT

    kw = kwargs
    # INCLUDE_SNOW lanes: temperature cannot exceed 0C and the bracket
    # anchors at the carried surface temperature
    # (calc_surf_energy_bal.c:281-289)
    inc = kwargs.get("inc_mask")
    if inc is not None:
        t_lower = jnp.where(inc, t0_old - c.SURF_DT, t_lower)
        t_upper = jnp.where(inc, 0.0, t_upper)
    fd_interp = None
    if fd_affine and kwargs.get("fd_solve") is not None:
        fd_solve = kwargs["fd_solve"]
        # both probes COLD-start from the carried temperatures like the
        # reference's per-evaluation solves: the sweep's root-vs-linear
        # branch keys on the current iterate's sign (frozen_soil.c:388-401),
        # so a warm-started probe can settle on a different branch of the
        # quirk fixed point and poison the interpolation (measured: frozen
        # soil ice exploded when probes chained warm starts)
        prof_lo = fd_solve(t_lower)
        prof_hi = fd_solve(t_upper)
        fd_interp = (t_lower, prof_lo.temp, t_upper, prof_hi.temp)
        kw = dict(kwargs, fd_solve=None, fd_interp=fd_interp)

    def resid(t):
        return surf_energy_terms(t, compute_evap=True, **kw).error

    res = batched_brent(resid, t_lower, t_upper, max_iter=max_iter,
                        active=active)
    ts = jnp.where(res.converged, res.root, t0_old)  # TFALLBACK
    return ts, ~res.converged, fd_interp
