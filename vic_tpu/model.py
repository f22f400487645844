"""The model step: per-record column physics over the full (cell, hru) batch,
and the `lax.scan` time integrator.

This is the TPU-native re-design of the reference call stack
  dist_prec -> full_energy -> [per-HRU loop] surface_fluxes -> runoff
(/root/reference/dist_prec.c:8, full_energy.c:216-455, surface_fluxes.c:17-948):
the reference's OpenMP-over-cells / serial-over-HRUs loop nest becomes one
batched evaluation where every physics kernel runs on [n_cell, max_hru] lanes,
and `lax.scan` carries the prognostic `ModelState` across records.

Phase coverage (SURVEY.md SS7.2): water-balance + full-energy surface physics
with the quick-flux ground heat path; snow via the two-layer pack EB; glacier
HRUs via the PCIC snow-on-ice + bare-ice ablation path (surface_fluxes_glac.c).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import constants as c
from .physics.aero import calc_aerodynamic
from .physics.runoff import runoff_step
from .physics.snow import calc_rainonly, new_snow_density, snow_albedo, \
    snow_density_update, snow_melt
from .physics.soil_thermal import layer_thermal_props
from .physics.surface import solve_surface_temperature, surf_energy_terms
from .prepare import DeviceParams
from .state import ModelState


# Outputs are a plain dict keyed by the reference's OUT_* variable names
# (vicNl_def.h:351-564); registry/metadata live in vic_tpu/output.py.
StepOutputs = dict


def make_step(params: DeviceParams, gp, geom=None, zwt_curves=None,
              lake_params=None, outvars=None):
    """Build the jittable per-record step(state, forcing) -> (state, outputs).

    forcing: dict with [n_cell] arrays 'prec' (mm/step), 'air_temp' (C),
    'wind' (m/s), 'shortwave', 'longwave' (W/m^2), 'pressure' (Pa), 'vp' (Pa),
    'density' (kg/m^3), and int32 scalars 'month' (1-12), 'day_in_year'.

    geom: NodeGeometry (physics.frozen_soil.build_node_geometry) — required
    when gp.frozen_soil (layer-ice estimation and, with QUICK_FLUX=FALSE, the
    finite-difference node solve).

    outvars: optional collection of OUT_* names — when given, the step only
    returns that subset, so XLA dead-code-eliminates every diagnostic that
    doesn't feed a requested variable or the carried state. The reference
    fills its whole out_data table each step no matter what the OUTVAR list
    says (put_data.c); trace-time pruning is the TPU-native improvement.
    OUT_WATER_ERROR is always kept (primary correctness telemetry).
    """
    dt_hours = gp.dt
    dt_sec = float(dt_hours) * 3600.0
    full_energy = gp.full_energy
    frozen = gp.frozen_soil
    nl = gp.nlayer
    if frozen and geom is None:
        raise ValueError("frozen_soil requires a NodeGeometry (geom=)")
    # QUICK_FLUX alone selects the ground-heat method (func_surf_energy_bal.c
    # :167-242, "2011-Aug-09 … depends only on QUICK_FLUX setting"); FROZEN_SOIL
    # gates only the ice/fusion physics on top of it
    fd_nodes = (not gp.quick_flux) and geom is not None

    def step(state: ModelState, forcing):
        p = params
        month = forcing["month"]
        doy = forcing["day_in_year"]
        mi = month - 1

        # ---- broadcast forcings to [c,h] with band lapse (A.2) -------------
        B = lambda a: a[:, None]
        tair = B(forcing["air_temp"]) + p.tfactor
        prec = B(forcing["prec"]) * p.pfactor
        wind = jnp.maximum(B(forcing["wind"]),
                           jnp.asarray(gp.min_wind_speed, tair.dtype))
        sw_in = B(forcing["shortwave"])
        lw_in = B(forcing["longwave"])
        pressure = B(forcing["pressure"])
        vp_air = B(forcing["vp"])
        air_dens = B(forcing["density"])
        from .physics.evap import svp as svp_fn
        vpd = jnp.maximum(svp_fn(tair) - vp_air, 0.0)

        # ---- monthly veg parameter gathers ---------------------------------
        take_m = lambda a: jnp.take(a, mi, axis=-1)
        lai = take_m(p.lai_m)
        wdmax = take_m(p.wdmax_m)
        veg_albedo = take_m(p.albedo_m)
        veg_rough = take_m(p.roughness_m)
        veg_displ = take_m(p.displacement_m)
        bare = p.is_bare | p.is_glacier
        bare_albedo = jnp.where(p.is_glacier, B(p.glac_albedo),
                                jnp.where(bare, c.BARE_SOIL_ALBEDO, veg_albedo))
        surf_rough = jnp.where(bare, B(p.rough), veg_rough)
        surf_displ = jnp.where(bare, 0.0, veg_displ)
        ref_height = jnp.where(bare, B(p.rough) + 2.0, gs_wind_h(p, veg_displ))

        # ---- aerodynamic resistances (full_energy.c:302-354) ---------------
        aero = calc_aerodynamic(
            p.overstory, p.veg_height, p.trunk_ratio, B(p.snow_rough),
            B(p.rough), p.wind_atten, surf_displ, surf_rough, ref_height, wind)

        # ---- rain/snow partition (solve_snow.c:149-156) --------------------
        rainonly = calc_rainonly(tair, prec, B(p.max_snow_temp),
                                 B(p.min_rain_temp),
                                 int(gp.temp_th_type))
        if gp.corrprec:
            # gauge undercatch correction (correct_precip.c, CORRPREC)
            from .physics.hydrology_misc import correct_precip
            gc_rain, gc_snow = correct_precip(
                wind, gs_wind_h(p, veg_displ), B(p.rough), B(p.snow_rough))
        else:
            gc_rain = gc_snow = 1.0
        snowfall = gc_snow * (prec - rainonly) * B(p.padj_s)
        rainfall = gc_rain * rainonly * B(p.padj_r)
        # cell-mean precip echo captured before the wet-fraction
        # intensification and canopy processing (solve_snow.c:164-166)
        out_prec = snowfall + rainfall
        out_rain = rainfall
        out_snow = snowfall
        le = 2.501e6 - 2361.0 * tair

        snow_present = jnp.logical_or(
            jnp.logical_or(state.swq > 0.0, snowfall > 0.0),
            jnp.logical_and(p.overstory, state.snow_canopy > 0.0))

        # ---- distributed-precipitation storm tracking (dist_prec.c:76-152)
        if gp.dist_prcp:
            prec_c = B(forcing["prec"])
            raining = prec_c > 0.0
            # NEW_MU: intensity-based wet fraction; 1 whenever snow is on the
            # ground/canopy or falling; unchanged when no rain falls
            # (dist_prec.c:81-124)
            new_mu = jnp.where(
                snow_present, 1.0,
                jnp.where(raining, 1.0 - jnp.exp(-gp.prec_expt * prec_c),
                          state.mu))
            # DRY_TIME accumulates across dry sub-periods of a storm and is
            # NOT reset by rain (dist_prec.c:116-124, 03-27-03 history note)
            storm_end = jnp.logical_and(
                ~snow_present, jnp.logical_and(~raining,
                                               state.dry_time >= 24))
            still0 = jnp.where(storm_end, False, state.still_storm)
            dry_time = jnp.where(
                jnp.logical_or(raining, snow_present), state.dry_time,
                jnp.where(storm_end, 0, state.dry_time + dt_hours))
            new_storm = jnp.logical_and(
                ~still0, jnp.logical_or(prec_c > c.STORM_THRES, snow_present))
            redist = jnp.logical_and(
                ~new_storm, jnp.logical_and(still0, new_mu != state.mu))
            mu = jnp.where(jnp.logical_or(new_storm, redist), new_mu,
                           state.mu)
            still_storm = jnp.logical_or(still0, new_storm)

            # wet/dry column transfers: storm-onset averaging
            # (initialize_new_storm.c) and mid-storm redistribution
            # (redistribute_during_storm.c), mass-conserving in mu-weights
            from .physics.dist_prcp import storm_transfer
            mu_old = state.mu
            am, rm = new_storm[..., None], redist[..., None]
            moist_w, moist_d = storm_transfer(
                state.moist, state.moist_dry, B(p.max_moist),
                mu_old[..., None], mu[..., None], am, rm)
            ice_w, ice_d = storm_transfer(
                state.ice, state.ice_dry, B(p.max_moist),
                mu_old[..., None], mu[..., None], am, rm)
            wdew_w, wdew_d = storm_transfer(
                state.wdew, state.wdew_dry, wdmax, mu_old, mu,
                new_storm, redist)
            # frozen part cannot exceed the transferred total
            ice_w = jnp.minimum(ice_w, moist_w)
            ice_d = jnp.minimum(ice_d, moist_d)
            mu_safe = jnp.maximum(mu, 1e-6)
            dw = lambda w, d: mu * w + (1.0 - mu) * d
            dwl = lambda w, d: (mu[..., None] * w
                                + (1.0 - mu[..., None]) * d)
        else:
            mu = state.mu
            still_storm = state.still_storm
            dry_time = state.dry_time
            moist_w, moist_d = state.moist, state.moist_dry
            ice_w, ice_d = state.ice, state.ice_dry
            wdew_w, wdew_d = state.wdew, state.wdew_dry
            dw = lambda w, d: w
            dwl = lambda w, d: w

        if gp.dist_prcp:
            # precipitation falls on the wet fraction only, at intensity
            # P/mu (surface_fluxes.c:420); mu==1 whenever snow is involved,
            # and calc_rainonly is linear in prec so partition-then-divide
            # matches the reference's divide-then-partition (calc_rainonly.c)
            rainfall = rainfall / mu_safe
            snowfall = snowfall / mu_safe

        # no-overstory canopy dump when snow falls on stored dew
        dump = jnp.logical_and(~p.overstory,
                               jnp.logical_and(snowfall > 0.0,
                                               wdew_w > 0.0))
        rainfall = rainfall + jnp.where(dump, wdew_w, 0.0)
        wdew0 = jnp.where(dump, 0.0, wdew_w)

        # ================================================================
        # The coupled interception / snow / glacier / surface-EB chain as a
        # function of the canopy-air temperature. Without CLOSE_ENERGY the
        # reference's overstory/understory convergence loops run exactly once
        # at Tcanopy = Tair (surface_fluxes.c:8-15, MAX_ITER=0); with
        # CLOSE_ENERGY the chain is iterated to convergence on Tcanopy
        # (surface_fluxes.c:455-656 + calc_atmos_energy_bal.c).
        # ================================================================
        from .physics.canopy_snow import snow_intercept
        from .physics.glacier import glacier_ablation

        surf_att = surf_atten_of(lai, p)
        short_over_in = (1.0 - surf_att) * sw_in
        # understory SW is canopy-attenuated only for snow-covered overstory
        # (solve_snow.c:224 ShortUnderIn *= surf_atten)
        sw_under = jnp.where(jnp.logical_and(p.overstory, snow_present),
                             surf_att * sw_in, sw_in)
        # the ground-flux damping drops for snow-covered non-overstory lanes
        # (solve_snow.c:207: if !overstory, surf_atten = 1)
        surf_att_eff = jnp.where(
            jnp.logical_and(snow_present, ~p.overstory), 1.0, surf_att)
        glacier = p.is_glacier
        tgrnd = state.node_temp[..., 0]
        tgrnd_eff = jnp.where(glacier, c.GLAC_TEMP, tgrnd)
        fresh = snowfall > 0.0
        last_snow = jnp.where(fresh, 0, state.last_snow + 1)
        snowing = snow_present  # reference SNOWING = snow->snow
        ov_snow = jnp.logical_and(p.overstory, snow_present)
        wdew0_base = wdew0
        rainfall_base = rainfall

        # ---- blowing-snow sublimation flux (BLOWING; CalcBlowingSnow.c) ----
        # (depends on carried state only — outside the Tcanopy chain)
        if gp.blowing:
            from .physics.blowing_snow import calc_blowing_snow
            blow_flux, _blow_transport = calc_blowing_snow(
                dt_sec=dt_sec, tair=tair,
                last_snow=state.last_snow.astype(tair.dtype),
                surf_water_m=state.surf_water, wind_2m=aero.wind.snow_covered,
                ls=(677.0 - 0.07 * state.surf_temp) * c.JOULES_PER_CAL
                * c.GRAMS_PER_KG,
                air_dens=air_dens, pressure=pressure, eact=vp_air,
                z0_snow=B(p.snow_rough), zrh=2.0,
                snowdepth=state.depth, lag_one=p.lag_one,
                sigma_slope=p.sigma_slope, tsnow=state.surf_temp,
                is_bare=p.is_bare, fetch=p.fetch,
                displacement=jnp.maximum(veg_displ, 0.01),
                roughness=jnp.maximum(veg_rough, 0.001))
        else:
            blow_flux = 0.0

        # ---- soil thermal properties (Tcanopy-independent) -----------------
        moist0 = moist_w          # wet-lane moisture drives evap/runoff
        ice0 = ice_w
        # thermal properties use the mu-averaged column
        # (prepare_full_energy.c:52-56 find_average_layer)
        moist_avg = dwl(moist_w, moist_d)
        ice_avg = dwl(ice_w, ice_d)
        kappa, cs = layer_thermal_props(
            moist_avg[..., :2], ice_avg[..., :2], B(p.depth)[..., :2],
            B(p.soil_dens_min)[..., :2], B(p.bulk_dens_min)[..., :2],
            B(p.quartz)[..., :2], B(p.soil_density)[..., :2],
            B(p.bulk_density)[..., :2], B(p.organic)[..., :2])
        # D1/D2 are NODE spacings (calc_surf_energy_bal.c:242-243:
        # Zsum_node[1]-Zsum_node[0], Zsum_node[2]-Zsum_node[1]); on the
        # QUICK_FLUX 3-node geometry these equal depth[0] and dp-depth[0]
        if geom is not None:
            zs = jnp.asarray(geom.zsum)
            d1 = (zs[:, 1] - zs[:, 0])[:, None]
            d2 = (zs[:, 2] - zs[:, 1])[:, None]
        else:
            d1 = B(p.depth)[..., 0]
            d2 = B(p.dp) - d1
        moist0_vol = moist_avg[..., 0] / (B(p.depth)[..., 0] * 1000.0)
        max_moist0_vol = B(p.max_moist)[..., 0] / (B(p.depth)[..., 0] * 1000.0)
        # top-layer ice0 for the fusion term: recomputed FRESH each step
        # from the carried node temperatures, NOT the carried layer-ice
        # state (prepare_full_energy.c:64-76: ice0 = moist0 -
        # maximum_unfrozen_water((T[0]+T[1])/2, ...))
        if frozen:
            from .physics.soil_thermal import maximum_unfrozen_water
            tavg01 = 0.5 * (state.node_temp[..., 0] + state.node_temp[..., 1])
            ice0_vol = jnp.where(
                jnp.logical_and(B(p.fs_active), tavg01 < 0.0),
                jnp.maximum(
                    moist0_vol - maximum_unfrozen_water(
                        tavg01, max_moist0_vol, B(p.bubble)[..., 0],
                        B(p.expt)[..., 0]), 0.0),
                0.0)
        else:
            ice0_vol = jnp.zeros_like(moist0_vol)

        # ---- FD node-profile solver for the surface-EB residual ------------
        # (QUICK_FLUX FALSE): node moisture/ice/kappa/Cs are fixed over the
        # step at the carried temperatures (distribute_node_moisture_
        # properties runs at the END of the previous step, runoff.c:763);
        # the profile is re-solved with each candidate Ts as the node-0 BC
        # inside every Brent residual evaluation (func_surf_energy_bal.c:
        # 190-228)
        if fd_nodes:
            from .physics.frozen_soil import (
                distribute_node_moisture, solve_t_profile_explicit)
            nodep = distribute_node_moisture(moist_avg, state.node_temp, geom,
                                             p, frozen=frozen)

            def fd_solve(ts_candidate, t_start=None):
                # IMPLICIT note: the reference's NR (fda_heat_eqn,
                # frozen_soil.c:589) shares the layer-units ice bug
                # documented on solve_t_profile_explicit, so it fails TOLF
                # whenever any node carries ice and ~always falls back to
                # the explicit sweep (func_surf_energy_bal.c:213-222);
                # ice-free columns solve the same backward-Euler system
                # either way.  The quirk-faithful path therefore always
                # runs the explicit sweep.
                return solve_t_profile_explicit(
                    t0=state.node_temp, surf_temp=ts_candidate,
                    kappa=nodep["kappa"], cs=nodep["cs"],
                    moist_node=nodep["moist"], ice0_node=nodep["ice"],
                    geom=geom, params=p, dt_sec=dt_sec, noflux=gp.noflux,
                    exp_trans=gp.exp_trans, frozen=frozen,
                    max_sweeps=gp.soil_sweep_maxiter, ice_quirk=True,
                    t_start=t_start)

        else:
            fd_solve = None

        eb_common = dict(
            ts_old=state.node_temp[..., 0], t1_old=state.node_temp[..., 1],
            t2=state.node_temp[..., -1], d1=d1, d2=d2,
            kappa1=kappa[..., 0], kappa2=kappa[..., 1],
            cs1=cs[..., 0], cs2=cs[..., 1], dp=B(p.dp), delta_t=dt_sec,
            moist0_vol=moist0_vol, max_moist0_vol=max_moist0_vol,
            ice0_vol=ice0_vol, bubble0=B(p.bubble)[..., 0],
            expt0=B(p.expt)[..., 0], fs_active=B(p.fs_active),
            vpd=vpd, vp_air=vp_air,
            atmos_density=air_dens, atmos_pressure=pressure,
            elevation=B(p.elevation), latent_heat_le=le,
            ra_under=aero.resist.snow_free, z_ref=aero.ref_height.snow_free,
            displacement=aero.displacement.snow_free,
            roughness=aero.roughness.snow_free, wind=aero.wind.snow_free,
            is_veg=jnp.logical_and(~bare, lai > 0.0), lai=lai,
            wdmax=wdmax, rmin=p.rmin, rgl=p.rgl, rarc=p.rarc, root=p.root,
            ra_canopy=aero.resist.canopy,
            displacement_canopy=aero.displacement.canopy,
            roughness_canopy=aero.roughness.canopy,
            ref_height_canopy=aero.ref_height.canopy,
            moist_l=moist0, ice_l=ice0,
            wcr=B(p.wcr), wpwp=B(p.wpwp), depth_l=B(p.depth),
            resid_moist0=B(p.resid_moist)[..., 0], b_infilt=B(p.b_infilt),
            max_moist_l=B(p.max_moist), surf_atten=surf_att_eff,
            grnd_flux_type=int(gp.grnd_flux_type), frozen_soil=frozen,
            fd_solve=fd_solve)

        def column(tca, fd_cheap=False, luo=None):
            """One pass of the overstory->understory chain at canopy-air
            temperature `tca` (== Tair on non-iterated lanes).

            luo: upward longwave from the understory surface — the
            canopy-snow EB's below-canopy input (solve_snow.c:228
            LongUnderOut). Defaults to the carried state
            (energy->LongUnderOut); the CLOSE_ENERGY loop re-feeds each
            pass's surface emission, closing the canopy<->understory
            radiation exchange the reference iterates.

            fd_cheap (QUICK_FLUX FALSE only): evaluate the surface-EB Brent
            on the affine two-probe node-profile model instead of the full
            per-candidate sweep.  Used ONLY for the intermediate CLOSE_ENERGY
            passes, whose sole consumer is the Tcanopy update — the final
            pass (and every non-iterated configuration) runs the exact
            in-residual solve, so the carried node state and reported fluxes
            are bit-identical to the literal nesting.  (An earlier design
            used the affine model everywhere; the frozen-soil quirk solver's
            root-vs-linear branch selection is so sensitive that ~0.01 C
            root differences compounded into r=0.5 parity collapse.)"""
            if luo is None:
                luo = state.long_under_out

            # liquid interception evaporation for snow-free-canopy lanes
            # (func_canopy_energy_bal.c:88-111): canopy_evap with
            # CALC_EVAP=FALSE, Wdew = the PRE-interception dew and prec =
            # the full rainfall — the EB's IntRain bookkeeping is REPLACED
            # by this call's results (the Wdew pointer the reference hands
            # the residual IS the IntRain pointer, canopy_energy_bal.h:15)
            from .physics.evap import canopy_evap as _canopy_evap

            def liquid_evap(net_rad):
                ev, _le_l, cev, thru, wnew = _canopy_evap(
                    moist0, ice0, B(p.wcr), B(p.wpwp), p.root, B(p.depth),
                    wdew0_base, rainfall_base, wdmax, p.rmin, p.rgl, lai,
                    p.rarc, net_rad, short_over_in, vpd, tca,
                    B(p.elevation), aero.resist.canopy, dt_sec,
                    calc_transpiration=False)
                return ev, cev, thru, wnew

            # ---- overstory canopy snow interception (solve_snow.c:226 ->
            # snow_intercept.c) — computed for all lanes, applied to
            # overstory lanes in the snow path ------------------------------
            ci = snow_intercept(
                snowfall_mm=snowfall, rainfall_mm=rainfall_base,
                int_snow_m=state.snow_canopy, int_rain_m=wdew0_base / 1000.0,
                tfoliage_old=state.tfoliage,
                temp_int_storage=0.0 * wdew0_base,
                lai=lai, wdmax_mm=wdmax,
                air_dens=air_dens, vp_air=vp_air, vpd=vpd, pressure=pressure,
                le=le, tcanopy=tca,
                # canopy SW albedo: NEW_SNOW_ALB on the intercepted-snow
                # branch, the HRU's bare albedo on the snow-free branch
                # (snow_intercept.c:328,355)
                net_short_over=(1.0 - B(p.new_snow_alb)) * short_over_in,
                net_short_over_nosnow=(1.0 - veg_albedo) * short_over_in,
                liquid_evap=liquid_evap,
                long_over_in=lw_in,
                long_under_out=luo,
                ra_overstory=aero.resist.canopy, wind_over=aero.wind.canopy,
                z_ref=aero.ref_height.canopy,
                displacement=aero.displacement.canopy,
                roughness=aero.roughness.canopy,
                dt_sec=dt_sec, max_iter=gp.brent_maxiter,
                active_mask=jnp.logical_and(ov_snow, p.mask))
            rainfall = jnp.where(ov_snow, ci.rain_throughfall * 1000.0,
                                 rainfall_base)
            snowfall_ground = jnp.where(ov_snow, ci.snow_throughfall * 1000.0,
                                        snowfall)
            snow_canopy_new = jnp.where(ov_snow, ci.int_snow,
                                        state.snow_canopy)
            wdew0 = jnp.where(ov_snow, ci.int_rain * 1000.0, wdew0_base)
            tfoliage_new = jnp.where(ov_snow, ci.tfoliage, tca)
            canopy_sub_mm = jnp.where(ov_snow, ci.vapor_flux * 1000.0, 0.0)
            # liquid interception evap on snow-free-canopy overstory lanes
            cevap_liq_mm = jnp.where(ov_snow, ci.canopy_evap_mm, 0.0)
            tfol_fb = jnp.where(ov_snow, ci.fbflag, False)

            # below-canopy longwave: snow-covered overstory lanes receive
            # the CANOPY's emission, not the sky's — solve_snow.c passes
            # snow_intercept's LongOverOut out through its LongUnderIn
            # pointer (solve_snow.c:235 &energy->canopy_latent_sub,
            # LongUnderIn) and both snow_melt (:338) and
            # calc_surf_energy_bal consume it
            lw_canopy = lw_in - ci.net_long_over
            lw_under = jnp.where(ov_snow, lw_canopy, lw_in)

            # ---- snow albedo aging (solve_snow.c:418-439) ------------------
            albedo_aged = snow_albedo(
                snowfall_ground, state.swq, state.depth, state.albedo,
                state.cold_content,
                dt_hours, last_snow.astype(tair.dtype), state.melting,
                B(p.new_snow_alb), B(p.snow_alb_accum_a),
                B(p.snow_alb_accum_b),
                B(p.snow_alb_thaw_a), B(p.snow_alb_thaw_b),
                sun1999=(int(gp.snow_albedo) == 1))
            snow_alb = jnp.where(fresh, B(p.new_snow_alb), albedo_aged)
            albedo_under = jnp.where(fresh, snow_alb,
                                     state.coverage * snow_alb
                                     + (1.0 - state.coverage) * bare_albedo)
            net_short_snow = (1.0 - albedo_under) * sw_under

            # ---- snowpack accumulation/ablation (snow_melt.c) --------------
            sm = snow_melt(
                swq=state.swq, surf_temp=state.surf_temp,
                pack_temp=state.pack_temp, surf_water=state.surf_water,
                pack_water=state.pack_water, snow_depth=state.depth,
                snow_density=state.density, coldcontent=state.cold_content,
                rainfall_mm=rainfall, snowfall_mm=snowfall_ground,
                air_temp=tair, tcanopy=tca, tgrnd=tgrnd_eff,
                # snow-surface wind: the log-profile speed at the 2m snow
                # reference level (CalcAerodynamic.c:130,190 — the EB's
                # stability correction uses wind_speed.snowCovered, NOT the
                # raw forcing wind; the raw value biased stable-regime Ri
                # low and warmed the pack)
                wind=aero.wind.snow_covered,
                vp_air=vp_air, vpd=vpd, air_dens=air_dens, pressure=pressure,
                longwave_in=lw_under, net_short=net_short_snow, lv=le,
                ra=aero.resist.snow_covered,
                displacement=aero.displacement.snow_covered,
                z_ref=aero.ref_height.snow_covered,
                roughness=aero.roughness.snow_covered,
                dt_sec=dt_sec, max_iter=gp.brent_maxiter,
                tfallback=gp.tfallback, blowing_flux=blow_flux,
                active_mask=jnp.logical_and(snow_present, p.mask),
                is_glacier=glacier,
                # SPATIAL_SNOW: the pack EB sees last step's coverage
                # (solve_snow.c calls calc_snow_coverage AFTER snow_melt)
                snow_cover_fract=state.coverage if gp.spatial_snow else None)

            # merge: lanes with snow take the snow result, others keep zeros
            S = lambda new, old: jnp.where(snow_present, new, old)
            swq = S(sm.swq, state.swq)
            surf_temp = S(sm.surf_temp, 0.0 * state.surf_temp)
            pack_temp = S(sm.pack_temp, 0.0 * state.pack_temp)
            surf_water = S(sm.surf_water, 0.0 * state.surf_water)
            pack_water = S(sm.pack_water, 0.0 * state.pack_water)
            melt_out = jnp.where(snow_present, sm.melt, 0.0)
            # the reference's complete-melt reset (solve_snow.c:461-477)
            # zeroes surf/pack temps and waters but NOT coldcontent — the
            # last winter value stays STALE on snow-free HRUs (and seeds
            # the albedo/MELTING logic of the next pack); carried as-is
            # for state-file parity
            cold_content = S(sm.cold_content, state.cold_content)
            vapor_flux = jnp.where(snow_present, sm.vapor_flux, 0.0)
            # firn densification: pack snow leaving the water column as
            # glacier ice (snow_melt_glac.c:110-131, glacier->accumulation)
            glac_firn_mm = jnp.where(jnp.logical_and(glacier, snow_present),
                                     sm.firn_to_ice, 0.0) * 1000.0

            # thin-pack INCLUDE_SNOW lanes: the pack EB was skipped
            # (surface-layer SWE <= MIN_SWQ_EB_THRES, snow_melt.c:324) and
            # the pack is folded into the soil surface EB below
            # (surface_fluxes.c:548-556)
            inc = (jnp.logical_and(
                sm.include_snow,
                jnp.logical_and(snow_present,
                                jnp.logical_and(~glacier, p.mask)))
                if full_energy else None)

            # ---- glacier lane: bare-ice ablation once snow is gone ---------
            # (surface_fluxes_glac.c:311 solve_glacier on snow-free ice)
            glac = glacier_ablation(
                tair=tair, net_short=(1.0 - B(p.glac_albedo)) * sw_in,
                longwave_in=lw_in, wind=aero.wind.glacier,
                vp_air=vp_air, vpd=vpd,
                air_dens=air_dens, pressure=pressure, le=le,
                rain_mm=jnp.where(jnp.logical_and(glacier, ~snow_present),
                                  rainfall, 0.0),
                ra=aero.resist.glacier, z_ref=aero.ref_height.glacier,
                roughness=aero.roughness.glacier,
                old_tsurf=state.glac_surf_temp,
                glac_surf_thick=B(p.glac_surf_thick), dt_sec=dt_sec,
                max_iter=gp.brent_maxiter,
                active_mask=jnp.logical_and(
                    jnp.logical_and(glacier, ~snow_present), p.mask))
            on_ice = jnp.logical_and(glacier, ~snow_present)
            glac_melt_mm = jnp.where(on_ice, glac.melt_mm, 0.0)
            glac_surf_temp = jnp.where(on_ice, glac.surf_temp,
                                       jnp.where(glacier, 0.0,
                                                 state.glac_surf_temp))

            # glacier water reservoir: inflow = ALL water reaching the
            # glacier surface (pack outflow, bare-ice melt, rain on bare
            # ice); outflow = K*storage with K = KMIN + DK*exp(-A*swe)
            # (surface_fluxes_glac.c:580-608)
            glac_inflow = jnp.where(
                glacier,
                melt_out + glac_melt_mm + jnp.where(on_ice, rainfall, 0.0),
                0.0)
            storage = state.glac_water_storage + glac_inflow
            kfac = B(p.glac_kmin) + B(p.glac_dk) * jnp.exp(
                -B(p.glac_a) * swq * 1000.0)
            glac_outflow = jnp.where(glacier, kfac * storage, 0.0)
            glac_water_storage = jnp.where(glacier, storage - glac_outflow,
                                           state.glac_water_storage)

            # ---- snowpack density/depth (solve_snow.c:478-496) -------------
            density_new = snow_density_update(
                state.swq, state.depth, state.density, surf_temp,
                snowfall_ground, tair,
                dt_hours, liquid_water=surf_water + pack_water,
                snthrm=(int(gp.snow_density) == 1))
            density = jnp.where(
                swq > 0.0,
                jnp.where(state.swq > 0.0, density_new, new_snow_density(
                    tair, snthrm=(int(gp.snow_density) == 1))),
                0.0)
            depth = jnp.where(density > 0.0, 1000.0 * swq / jnp.maximum(
                density, 1.0), 0.0)
            if gp.spatial_snow:
                # SPATIAL_SNOW partial coverage with depletion-curve memory
                # (calc_snow_coverage.c:7-150; called after snow_melt with the
                # new pack vs the old distribution state, solve_snow.c:384)
                from .physics.snow import calc_snow_coverage
                dfsc = jnp.maximum(B(p.depth_full_snow_cover), 1e-4)
                cr = calc_snow_coverage(
                    store_snow=state.snow_store_snow, dfsc=dfsc,
                    old_coverage=state.coverage, swq=swq, old_swq=state.swq,
                    depth=depth, old_depth=state.depth,
                    melt_m=melt_out / 1000.0 + vapor_flux,
                    max_swq=state.snow_max_swq,
                    snowfall_mm=snowfall_ground,
                    store_swq=state.snow_store_swq,
                    swq_slope=state.snow_swq_slope,
                    store_coverage=state.snow_store_coverage)
                coverage = jnp.where(swq > 0.0, cr.coverage, 0.0)
                # complete-melt reset (solve_snow.c:462-476) and
                # no-snow reset (solve_snow.c:500-501,533-534)
                full_melt = jnp.logical_and(snow_present, swq <= 0.0)
                no_snow = ~snow_present
                cov_state = dict(
                    snow_store_snow=jnp.where(full_melt, True,
                                              cr.store_snow),
                    snow_store_swq=jnp.where(no_snow, 0.0, cr.store_swq),
                    snow_max_swq=cr.max_swq,
                    snow_swq_slope=jnp.where(full_melt, 0.0, cr.swq_slope),
                    snow_store_coverage=jnp.where(no_snow, 1.0,
                                                  cr.store_coverage))
            else:
                coverage = jnp.where(swq > 0.0, 1.0, 0.0)
                cov_state = dict(
                    snow_store_snow=state.snow_store_snow,
                    snow_store_swq=state.snow_store_swq,
                    snow_max_swq=state.snow_max_swq,
                    snow_swq_slope=state.snow_swq_slope,
                    snow_store_coverage=state.snow_store_coverage)

            # MELTING flag (solve_snow.c:500-510, lat-aware season window)
            north = B(p.lat) >= 0
            in_season = jnp.where(north,
                                  jnp.logical_and(doy > 60, doy < 273),
                                  jnp.logical_or(doy < 60, doy > 273))
            melting = jnp.where(
                swq > 0.0,
                jnp.where(jnp.logical_and(cold_content >= 0.0, in_season),
                          True,
                          jnp.where(jnp.logical_and(
                              state.melting,
                              snowfall_ground > c.TRACESNOW),
                              False, state.melting)),
                False)

            # ---- coverage-change bookkeeping (solve_snow.c:406-448) --------
            # delta_coverage = area that lost its snow this step; the energy
            # the pack spent there (melt_energy) feeds the exposed ground's
            # EB, and that area still reflects at the snow albedo this step.
            old_cov = state.coverage
            delta_cov = jnp.where(snow_present,
                                  jnp.maximum(old_cov - coverage, 0.0), 0.0)
            # snow fell and melted entirely within the step
            # (solve_snow.c:442-448): delta_coverage = 1
            same_step = jnp.logical_and(
                snow_present,
                jnp.logical_and(old_cov == 0.0, coverage == 0.0))
            delta_cov = jnp.where(same_step, 1.0, delta_cov)
            cov_w = coverage + delta_cov   # pack-flux output weight
            pack_sum = (sm.terms.advection - sm.terms.delta_cc
                        + sm.terms.latent + sm.terms.latent_sub
                        + sm.terms.sensible + sm.terms.refreeze_energy
                        + sm.terms.advected_sensible)
            melt_energy = jnp.where(
                jnp.logical_and(snow_present, delta_cov > 0.0),
                delta_cov * pack_sum, 0.0)

            # pack->soil conduction coefficient (calc_surf_energy_bal.c:254:
            # kappa_snow = K_SNOW*density^2/mean_depth; surface_fluxes.c:573
            # passes the old/new mean depth)
            mean_depth = 0.5 * (state.depth + depth)
            kappa_snow = jnp.where(
                depth > 0.0,
                c.K_SNOW * density * density
                / jnp.maximum(mean_depth, 1e-10), 0.0)

            # ---- surface energy balance on snow-free ground ----------------
            # just-exposed area reflects at the snow albedo
            # (calc_surf_energy_bal.c:258-261 NetShortBare)
            net_short_bare = sw_under * (
                (1.0 - (coverage + delta_cov)) * (1.0 - bare_albedo)
                + delta_cov * (1.0 - snow_alb))
            long_bare_in = (1.0 - coverage) * lw_under

            # ts-independent evap precomputations, hoisted out of the
            # surface-T Brent iteration (physics/evap.py build_evap_pre)
            from .physics.evap import build_evap_pre
            pre_args = dict(
                wcr=B(p.wcr), wpwp=B(p.wpwp), root=p.root,
                max_moist0=B(p.max_moist)[..., 0], b_infilt=B(p.b_infilt),
                rmin=p.rmin, rgl=p.rgl, lai=lai,
                net_short=net_short_bare, vpd=vpd, air_temp=tair,
                elevation=B(p.elevation))
            evap_pre = build_evap_pre(moist0, ice0, **pre_args)
            eb_kwargs = dict(
                eb_common, tair=tca,
                shortwave_net_bare=net_short_bare, long_bare_in=long_bare_in,
                overstory_snowing=jnp.logical_and(p.overstory, snowing),
                wdew=wdew0, rainfall=rainfall, snow_coverage=coverage,
                # pack->soil conduction + coverage-reduction energy
                # (func_surf_energy_bal.c:148-156,377)
                kappa_snow=kappa_snow, tsnow_surf=surf_temp,
                melt_energy=melt_energy,
                evap_pre=evap_pre)
            if inc is not None:
                eb_kwargs["inc_mask"] = inc
                eb_kwargs["inc_terms"] = dict(
                    swq=swq, surf_water=surf_water, density=density,
                    old_tsurf=state.surf_temp,
                    advection0=sm.inc_advection0,
                    lw_snow_in=coverage * lw_under,
                    net_short_snow_cov=coverage * net_short_snow,
                    cov=coverage,
                    blowing_flux=blow_flux + jnp.zeros_like(coverage))
            if gp.dist_prcp:
                # dry-lane column for the in-residual ET (canopy_evap.c
                # dist loop)
                eb_kwargs["dist_dry"] = dict(
                    moist_l=moist_d, ice_l=ice_d, wdew=wdew_d,
                    rainfall=jnp.zeros_like(rainfall))
                eb_kwargs["evap_pre_dry"] = build_evap_pre(
                    moist_d, ice_d, **pre_args)
                eb_kwargs["mu_wet"] = mu

            ts, fb, fdi = solve_surface_temperature(
                eb_kwargs, state.node_temp[..., 0], tca, full_energy,
                max_iter=gp.brent_maxiter, active=p.mask,
                fd_affine=fd_nodes and gp.fd_affine_residual and fd_cheap)
            # evaluate the accepted root's terms on the same profile model
            # the Brent used (the affine interp when active); finalize_fd
            # re-evaluates on the true solved profile after the Tcanopy
            # loop settles
            eb_eval_kwargs = (dict(eb_kwargs, fd_solve=None, fd_interp=fdi)
                              if fdi is not None else eb_kwargs)
            eb = surf_energy_terms(ts, compute_evap=True, **eb_eval_kwargs)

            if inc is not None:
                # thin-pack update from the joint solution
                # (calc_surf_energy_bal.c:589-660): vapor exchange, then
                # melt or refreeze from the balance's refreeze energy
                vap = jnp.where(-eb.inc_vapor_flux > swq, -swq,
                                eb.inc_vapor_flux)
                swq_i = swq + vap
                sw_i = jnp.maximum(surf_water + vap, 0.0)
                re = eb.refreeze_energy
                refroz = jnp.clip(re * dt_sec / (c.LF * c.RHO_W), 0.0, sw_i)
                re_pos = re >= 0.0
                sw_i = jnp.where(re_pos, sw_i - refroz, sw_i)
                melt_i = jnp.where(re_pos, 0.0,
                                   jnp.abs(re) * dt_sec / (c.LF * c.RHO_W))
                swq_i = swq_i - melt_i
                melt_i = jnp.where(swq_i < 0.0, melt_i + swq_i, melt_i)
                swq_i = jnp.maximum(swq_i, 0.0)
                alive = swq_i > 0.0
                st_i = jnp.minimum(ts, 0.0)
                I = lambda new_, old_: jnp.where(inc, new_, old_)
                swq = I(swq_i, swq)
                surf_water = I(jnp.where(alive, sw_i, 0.0), surf_water)
                surf_temp = I(jnp.where(alive, st_i, 0.0), surf_temp)
                cold_content = I(jnp.where(alive,
                                           c.CH_ICE * st_i * swq_i, 0.0),
                                 cold_content)
                depth = I(jnp.where(alive, 1000.0 * swq_i
                                    / jnp.maximum(density, 1.0), 0.0), depth)
                coverage = I(jnp.where(alive, 1.0, 0.0), coverage)
                dead = jnp.logical_and(inc, ~alive)
                pack_temp = jnp.where(dead, 0.0, pack_temp)
                pack_water = jnp.where(dead, 0.0, pack_water)
                density = jnp.where(dead, 0.0, density)
                melt_out = melt_out + jnp.where(inc, melt_i * 1000.0, 0.0)
                # sm.vapor_flux convention: loss POSITIVE
                vapor_flux = I(-vap, vapor_flux)
                # the fold zeroes the coverage-reduction energy
                # (surface_fluxes.c:556)
                melt_energy = jnp.where(inc, 0.0, melt_energy)

            return dict(
                inc=(inc if inc is not None
                     else jnp.zeros_like(ts, dtype=bool)),
                ci=ci, rainfall=rainfall, snowfall_ground=snowfall_ground,
                snow_canopy_new=snow_canopy_new, wdew0=wdew0,
                tfoliage_new=tfoliage_new, canopy_sub_mm=canopy_sub_mm,
                tfol_fb=tfol_fb, snow_alb=snow_alb,
                cevap_liq_mm=cevap_liq_mm,
                albedo_under=albedo_under, net_short_snow=net_short_snow,
                sm=sm, swq=swq, surf_temp=surf_temp, pack_temp=pack_temp,
                surf_water=surf_water, pack_water=pack_water,
                melt_out=melt_out, cold_content=cold_content,
                vapor_flux=vapor_flux, glac=glac, on_ice=on_ice,
                glac_melt_mm=glac_melt_mm, glac_surf_temp=glac_surf_temp,
                glac_firn_mm=glac_firn_mm,
                glac_inflow=glac_inflow, kfac=kfac,
                glac_outflow=glac_outflow,
                glac_water_storage=glac_water_storage,
                density=density, depth=depth, coverage=coverage,
                cov_state=cov_state, cov_w=cov_w, delta_cov=delta_cov,
                melt_energy=melt_energy,
                melting=melting, net_short_bare=net_short_bare,
                long_bare_in=long_bare_in, ts=ts, fb=fb, eb=eb,
                eb_kwargs=eb_kwargs,
                # upward understory LW for the NEXT canopy evaluation
                # (calc_surf_energy_bal.c:575 LongUnderOut =
                # LongUnderIn - NetLongUnder = the sigma*T^4 blend)
                luo_out=(coverage * c.STEFAN_B * (surf_temp + c.KELVIN) ** 4
                         + (1.0 - coverage)
                         * c.STEFAN_B * (ts + c.KELVIN) ** 4))

        # ---- CLOSE_ENERGY: canopy-air temperature fixed point --------------
        # (surface_fluxes.c:455-656 overstory loop + calc_atmos_energy_bal;
        # only overstory lanes carrying snow iterate — other lanes keep
        # Tcanopy = Tair, surface_fluxes.c:595,609-615). The understory
        # snow-flux reconciliation loop has no analog here: the pack EB is
        # driven by the actual node-0 ground temperature directly.
        tcanopy_fb = jnp.zeros_like(p.overstory)
        atmos_error = jnp.zeros_like(tair)

        if gp.close_energy and full_energy:
            from .physics.canopy_air import calc_atmos_energy_bal

            def tc_update(r, tca):
                under_sens = (r["eb"].sensible_heat
                              + r["sm"].terms.sensible * r["cov_w"])
                in_sens = r["ci"].sensible + under_sens
                ca = calc_atmos_energy_bal(in_sens, tair, air_dens,
                                           aero.resist.canopy)
                iter_mask = jnp.logical_and(ov_snow, p.mask)
                return (jnp.where(iter_mask, ca.tcanopy, tair),
                        jnp.where(iter_mask, ca.fbflag, False),
                        jnp.where(iter_mask, ca.error, 0.0),
                        jnp.where(iter_mask, ca.sensible, under_sens))

            # Per-lane safeguarded secant on the fixed point g(tc) =
            # F(tc) - tc = 0, where F = tc_update(column(tc)).  The
            # reference iterates the damped map tc <- (tc + F(tc))/2
            # (surface_fluxes.c:481-483), converging linearly at rate ~1/2 —
            # ~|log2 tol| passes; on TPU every lane pays the max-lane trip
            # count, so the secant's superlinear tail (same fixed point,
            # same OVER_TOL exit) cuts the column() evaluations ~3x.  Lanes
            # where the secant is undefined or wild take the reference's
            # damped half-step instead.
            def cond(carry):
                tc_prev, g_prev, tc, luo, it, conv = carry
                return jnp.logical_and(it < c.CLOSE_ENERGY_MAXITER, ~conv)

            def body(carry):
                tc_prev, g_prev, tc, luo, it, _ = carry
                ri = column(tc, fd_cheap=True, luo=luo)
                g = tc_update(ri, tc)[0] - tc
                denom = g - g_prev
                sec = g * (tc - tc_prev) / jnp.where(
                    jnp.abs(denom) < 1e-12, 1.0, denom)
                damped = jnp.logical_or(
                    it == 0, jnp.logical_or(jnp.abs(denom) < 1e-12,
                                            jnp.abs(sec) > 10.0))
                tc_next = tc - jnp.where(damped, -0.5 * g, sec)
                live = jnp.where(p.mask, jnp.abs(tc_next - tc), 0.0)
                return (tc, g, tc_next, ri["luo_out"], it + 1,
                        jnp.max(live) <= c.OVER_TOL)

            init = (tair, jnp.zeros_like(tair), tair, state.long_under_out,
                    jnp.asarray(0, jnp.int32), jnp.asarray(False))
            _, _, tcanopy, luo_conv, close_iters, _ = jax.lax.while_loop(
                cond, body, init)
            r = column(tcanopy, luo=luo_conv)
            tcanopy, tcanopy_fb, atmos_error, atmos_sensible = \
                tc_update(r, tcanopy)
            close_iters_out = close_iters
        else:
            tcanopy = tair
            r = column(tair)
            close_iters_out = jnp.asarray(0, jnp.int32)
            atmos_sensible = None

        ci = r["ci"]; rainfall = r["rainfall"]
        snowfall_ground = r["snowfall_ground"]
        snow_canopy_new = r["snow_canopy_new"]; wdew0 = r["wdew0"]
        tfoliage_new = r["tfoliage_new"]; canopy_sub_mm = r["canopy_sub_mm"]
        tfol_fb = r["tfol_fb"]; snow_alb = r["snow_alb"]
        cevap_liq_mm = r["cevap_liq_mm"]
        albedo_under = r["albedo_under"]; net_short_snow = r["net_short_snow"]
        sm = r["sm"]; swq = r["swq"]; surf_temp = r["surf_temp"]
        pack_temp = r["pack_temp"]; surf_water = r["surf_water"]
        pack_water = r["pack_water"]; melt_out = r["melt_out"]
        cold_content = r["cold_content"]; vapor_flux = r["vapor_flux"]
        glac = r["glac"]; on_ice = r["on_ice"]
        glac_melt_mm = r["glac_melt_mm"]; glac_surf_temp = r["glac_surf_temp"]
        glac_firn_mm = r["glac_firn_mm"]
        glac_inflow = r["glac_inflow"]; kfac = r["kfac"]
        glac_outflow = r["glac_outflow"]
        glac_water_storage = r["glac_water_storage"]
        density = r["density"]; depth = r["depth"]; coverage = r["coverage"]
        cov_state = r["cov_state"]; cov_w = r["cov_w"]
        delta_cov = r["delta_cov"]; melt_energy = r["melt_energy"]
        melting = r["melting"]; net_short_bare = r["net_short_bare"]
        long_bare_in = r["long_bare_in"]; ts = r["ts"]; fb = r["fb"]
        eb = r["eb"]
        inc_l = r["inc"]
        # pack energy terms reported for INCLUDE_SNOW lanes come from the
        # joint soil balance (surface_fluxes.c:754-760 copies soil_energy
        # advection/deltaCC/refreeze into the snow terms)
        adv_pack = jnp.where(inc_l, sm.inc_advection0, sm.terms.advection)
        dcc_pack = jnp.where(inc_l, eb.delta_cc, sm.terms.delta_cc)
        rfz_pack = jnp.where(inc_l, eb.refreeze_energy,
                             sm.terms.refreeze_energy)
        # ATMOS-level flux reporting for CLOSE_ENERGY overstory-snow lanes
        # (put_data.c:1068-1092 uses energy.NetShortAtmos/NetLongAtmos/
        # AtmosLatent[Sub]/AtmosSensible, which calc_atmos_energy_bal.c:
        # 77-90 assembles as over+under sums — with the F=1 closure quirk
        # dropping the understory net LW; non-iterated lanes get the
        # understory values, surface_fluxes.c:618-626)
        # glacier lanes never run the soil EB: their reported energy.* come
        # from the glacier slab EB (solve_glacier.c:94) or the pack EB on
        # snow-covered glacier (solve_snow_glac.c:151) alone — no soil term,
        # no coverage blend (round-5 fix: the soil EB's fluxes were added
        # on glacier lanes, biasing bands LATENT/SENSIBLE means +16-30%)
        sens_under = jnp.where(
            glacier, jnp.where(on_ice, glac.terms.sensible,
                               sm.terms.sensible),
            eb.sensible_heat + sm.terms.sensible * cov_w)
        lat_under = jnp.where(
            glacier, jnp.where(on_ice, glac.terms.latent, sm.terms.latent),
            eb.latent_heat + sm.terms.latent * cov_w)
        latsub_under = jnp.where(
            glacier, jnp.where(on_ice, glac.terms.latent_sub,
                               sm.terms.latent_sub),
            eb.latent_heat_sub + sm.terms.latent_sub * cov_w)
        ns_under = net_short_bare + net_short_snow * coverage
        nl_under = eb.net_long_bare + sm.terms.net_long * coverage
        if gp.close_energy and full_energy and atmos_sensible is not None:
            atm = jnp.logical_and(ov_snow, p.mask)
            sens_rep = jnp.where(atm, atmos_sensible, sens_under)
            lat_rep = jnp.where(atm, ci.latent + lat_under, lat_under)
            latsub_rep = jnp.where(atm, ci.latent_sub + latsub_under,
                                   latsub_under)
            ns_rep = jnp.where(atm, ci.net_short_over + ns_under, ns_under)
            nl_rep = jnp.where(atm, ci.net_long_over, nl_under)
        else:
            sens_rep, lat_rep, latsub_rep = sens_under, lat_under, \
                latsub_under
            ns_rep, nl_rep = ns_under, nl_under

        # suppress soil/canopy ET for snow-covered or snowing lanes
        # (func_surf_energy_bal.c:320: Evap=0 when SNOWING)
        no_soil_evap = jnp.logical_or(snowing, glacier)
        evap_sfree = jnp.where(no_soil_evap, 0.0, eb.evap)
        layer_evap = jnp.where(no_soil_evap[..., None], 0.0, eb.layer_evap)
        wdew_new = jnp.where(no_soil_evap, wdew0, eb.wdew_new)
        throughfall = jnp.where(snowing, 0.0, eb.throughfall)

        # water reaching the soil surface (ppt); glacier HRU soil receives
        # nothing — its surface water cycles through the ice reservoir
        # (surface_fluxes_glac.c:581-584 ppt = excess_moist ~= 0)
        ppt = jnp.where(snowing, melt_out, throughfall)
        ppt = jnp.where(glacier, 0.0, ppt)

        # ---- runoff & baseflow ---------------------------------------------
        ro = runoff_step(
            moist0, ice0, layer_evap, ppt,
            B(p.max_moist), B(p.resid_moist), B(p.depth), B(p.ksat),
            B(p.expt), B(p.b_infilt), B(p.ds), B(p.dsmax), B(p.ws),
            B(p.c_expt), dt_hours)

        if gp.dist_prcp:
            # DRY column: no precip; its own ET demand and drainage
            # (runoff.c:222-241 dist loop with mu -> 1-mu)
            layer_evap_d = jnp.where(no_soil_evap[..., None], 0.0,
                                     eb.layer_evap_dry)
            wdew_new_d = jnp.where(no_soil_evap, wdew_d, eb.wdew_new_dry)
            ppt_d = jnp.where(jnp.logical_or(snowing, glacier), 0.0,
                              eb.throughfall_dry)
            ro_d = runoff_step(
                moist_d, ice_d, layer_evap_d, ppt_d,
                B(p.max_moist), B(p.resid_moist), B(p.depth), B(p.ksat),
                B(p.expt), B(p.b_infilt), B(p.ds), B(p.dsmax), B(p.ws),
                B(p.c_expt), dt_hours)
        else:
            layer_evap_d = layer_evap
            wdew_new_d = wdew_new
            ppt_d = ppt
            ro_d = ro

        # ---- node temperatures + layer ice ---------------------------------
        if fd_nodes:
            # new node profile solved at the converged Ts inside the final
            # residual evaluation (calc_surf_energy_bal.c:489-506 final
            # calculate(Tsurf); frozen_soil.c:67 copies Tnew into energy->T)
            node_temp = eb.t_nodes
        else:
            # QUICK_FLUX path: nodes = [Ts, T1, T2] (calc_surf_energy_bal)
            node_temp = state.node_temp
            node_temp = node_temp.at[..., 0].set(ts)
            node_temp = node_temp.at[..., 1].set(eb.t1)

        if frozen:
            from .physics.frozen_soil import estimate_layer_ice
            fs_kw = dict(
                frost_subareas=(gp.frost_subareas if gp.spatial_frost else 1),
                frost_slope=gp.frost_slope)
            _, ice_new = estimate_layer_ice(node_temp, ro.moist, geom, p,
                                            frozen=True, **fs_kw)
            if gp.dist_prcp:
                _, ice_new_d = estimate_layer_ice(node_temp, ro_d.moist,
                                                  geom, p, frozen=True,
                                                  **fs_kw)
            else:
                ice_new_d = ice_new
        else:
            ice_new = ice0
            ice_new_d = ice_d if gp.dist_prcp else ice_new

        snow_sub_mm = vapor_flux * 1000.0  # m/step -> mm (loss positive)
        total_evap = evap_sfree + snow_sub_mm + canopy_sub_mm + cevap_liq_mm

        # ---- lake/wetland coupling (full_energy.c:714-800 + lakes.eb.c) ----
        # Runs BEFORE state assembly so the wetland recharge enters the soil
        # state and the closure accounting.
        w = p.weight
        agg = lambda x: (x * w).sum(-1)
        runoff_c = dw(ro.runoff, ro_d.runoff)
        baseflow_c = dw(ro.baseflow, ro_d.baseflow)
        moist_wet_f = ro.moist
        moist_dry_f = ro_d.moist
        recharge_lane_mm = jnp.zeros_like(runoff_c)
        cell_runoff = agg(runoff_c + glac_outflow)
        cell_baseflow = agg(baseflow_c)
        lake_out = {}
        if gp.lakes and lake_params is not None:
            from .physics.lake import LakeState, lake_step
            lp_l = lake_params
            cell_area = p.cell_area
            rperc = jnp.asarray(lp_l.rpercent, cell_runoff.dtype)
            # wetland host tile = first valid non-glacier band-0 lane (the
            # reference attaches the lake to the lake_idx veg tile,
            # read_lakeparam.c:70-90; here the leading tile stands in)
            cand = jnp.logical_and(
                p.mask, jnp.logical_and(p.band == 0, ~p.is_glacier))
            wl_idx = jnp.argmax(cand, axis=1)
            nh = p.mask.shape[1]
            wl_mask = jnp.logical_and(
                jnp.arange(nh)[None, :] == wl_idx[:, None],
                cand.any(1)[:, None])
            take_wl = lambda x: jnp.take_along_axis(
                x, wl_idx[:, None, None], 1)[:, 0]
            take_wl2 = lambda x: jnp.take_along_axis(
                jnp.asarray(x), wl_idx[:, None], 1)[:, 0]
            # pre-step dynamic lake fraction (full_energy.c:239: lakefrac =
            # lake_var.sarea/basin[0] BEFORE the HRU loop, where sarea is
            # last step's final max(liquid area, ice area))
            from .physics.lake import area_from_depth, depth_from_volume
            basin0_w = jnp.asarray(lp_l.basin, cell_runoff.dtype)[..., 0]
            has_l = jnp.asarray(lp_l.has_lake)
            liq_pre = jnp.maximum(state.lake_volume - state.lake_ice_we, 0.0)
            sarea_pre = jnp.maximum(
                area_from_depth(lp_l, depth_from_volume(lp_l, liq_pre)),
                state.lake_ice_area)
            clake_pre = jnp.where(has_l, jnp.clip(
                sarea_pre / jnp.maximum(basin0_w, 1.0), 0.0, 1.0), 0.0)
            # the wetland tile routes ALL of its runoff/baseflow into the
            # lake, weighted by its LAND share Cv*(1-lakefrac) — the
            # reference mutates Cv *= (1-lakefrac) at full_energy.c:242
            # before the inflow sum at :740-767; other tiles contribute
            # rpercent of their full-Cv share
            wl_w = (w * wl_mask).sum(-1)
            wet_ro = ((runoff_c + glac_outflow) * w * wl_mask).sum(-1)
            wet_bf = (baseflow_c * w * wl_mask).sum(-1)
            oth_ro = cell_runoff - wet_ro
            oth_bf = cell_baseflow - wet_bf
            r_in = (oth_ro * rperc
                    + wet_ro * (1.0 - clake_pre)) / 1000.0 * cell_area
            b_in = (oth_bf * rperc
                    + wet_bf * (1.0 - clake_pre)) / 1000.0 * cell_area
            # cell-level rain/snow partition for the lake column
            # (full_energy.c:769-781; gauge correction not reapplied here)
            tair_c = forcing["air_temp"]
            rainonly_c = calc_rainonly(
                tair_c, forcing["prec"], jnp.asarray(p.max_snow_temp),
                jnp.asarray(p.min_rain_temp), int(gp.temp_th_type))
            vpd_c = jnp.maximum(svp_fn(tair_c) - forcing["vp"], 0.0)
            lstate = LakeState(
                volume=state.lake_volume, temp=state.lake_temp,
                ice_water_eq=state.lake_ice_we,
                ice_area=state.lake_ice_area,
                ice_height=state.lake_ice_height, swe=state.lake_swe,
                tempi=state.lake_tempi,
                surf_temp=state.lake_snow_surf_temp,
                pack_temp=state.lake_snow_pack_temp,
                surf_water=state.lake_snow_surf_water,
                pack_water=state.lake_snow_pack_water,
                salbedo=state.lake_salbedo,
                last_snow=state.lake_last_snow,
                melting=state.lake_melting)
            # bottom-layer relative moisture for the lake-bed ARNO curve
            # (lakes.eb.c:2104-2115: liq = max_moist - WET-lane soil_ice,
            # rel_moist = (liq - resid)/(max_moist - resid)), per LANE —
            # water_balance runs once per HRU and reads each HRU's own ice
            mm_bot = jnp.asarray(p.max_moist, cell_runoff.dtype)[..., -1]
            resid_bot = (jnp.asarray(p.resid_moist,
                                     cell_runoff.dtype)[..., -1]
                         * jnp.asarray(p.depth,
                                       cell_runoff.dtype)[..., -1] * 1000.0)
            liq_bot = mm_bot[:, None] - ice_new[..., -1]
            wl_rel_moist = (liq_bot - resid_bot[:, None]) / jnp.maximum(
                mm_bot - resid_bot, 1.0)[:, None]
            lres = lake_step(
                lp_l, lstate,
                tair=tair_c, wind=forcing["wind"],
                sw_in=forcing["shortwave"], lw_in=forcing["longwave"],
                vp_air=forcing["vp"], vpd=vpd_c,
                pressure=forcing["pressure"],
                air_density=forcing["density"],
                rainfall_mm=rainonly_c,
                snowfall_mm=forcing["prec"] - rainonly_c,
                runoff_in_m3=r_in, baseflow_in_m3=b_in,
                lat=p.lat, day_in_year=doy,
                wind_h=take_wl2(p.wind_h),
                snow_rough=jnp.asarray(p.snow_rough),
                new_snow_alb=jnp.asarray(p.new_snow_alb),
                alb_accum_a=jnp.asarray(p.snow_alb_accum_a),
                alb_accum_b=jnp.asarray(p.snow_alb_accum_b),
                alb_thaw_a=jnp.asarray(p.snow_alb_thaw_a),
                alb_thaw_b=jnp.asarray(p.snow_alb_thaw_b),
                ds=p.ds, dsmax=p.dsmax, ws_arno=p.ws, c_expt=p.c_expt,
                dt_sec=dt_sec, blowing=gp.blowing,
                wetland_moist=dwl(moist_wet_f, moist_dry_f),
                wetland_max_moist=jnp.asarray(p.max_moist,
                                              cell_runoff.dtype),
                wetland_rel_moist=wl_rel_moist, lane_mask=p.mask)
            # lake-fraction bookkeeping for the advection + weighting below
            # (clake_pre computed above, before the inflow assembly)
            clake_post = jnp.where(has_l, jnp.clip(
                lres.sarea / jnp.maximum(basin0_w, 1.0), 0.0, 1.0), 0.0)
            maxnf = jnp.where(has_l, jnp.clip(
                lres.max_newfraction, 0.0, 1.0), 0.0)

            # ---- per-lane storage advection for the changing lake area
            # (water_balance runs once per HRU and its
            # advect_soil_veg_storage / advect_snow_storage act on THAT
            # HRU's soil/snow/dew — ALL lanes, not just the wetland tile;
            # lakes.eb.c:2307-2334,2374-2533) ----
            # 1. the per-lane flooding recharge delta (mm over
            #    (1-lakefrac)) saturates the newly-flooded fringe; excess
            #    spills down then up (the reference's residual-spill-to-
            #    baseflow at lakes.eb.c:2436-2439 adds raw m^3 into a mm
            #    variable and is unreachable with room-capped deltas —
            #    intentionally not replicated);
            # 2. each lane's column is blended with the SATURATED strip
            #    the lake exposed (or minus the strip it flooded):
            #    m = (m*(1-lf) + max_moist*(lf-nf_h)) / (1-nf_h).
            mm_max = jnp.asarray(p.max_moist, cell_runoff.dtype)[:, None, :]
            dmo = lres.wetland_dmoist_mm            # [c, lane, nl]
            m0_lane = dwl(moist_wet_f, moist_dry_f)
            m1 = m0_lane + dmo
            nlay = m1.shape[-1]
            for _l in range(nlay - 1):
                exc = jnp.maximum(m1[..., _l] - mm_max[..., _l], 0.0)
                m1 = m1.at[..., _l].add(-exc).at[..., _l + 1].add(exc)
            for _l in range(nlay - 1, 0, -1):
                exc = jnp.maximum(m1[..., _l] - mm_max[..., _l], 0.0)
                m1 = m1.at[..., _l].add(-exc).at[..., _l - 1].add(exc)
            m1 = m1.at[..., 0].min(mm_max[..., 0])
            lf = clake_pre[:, None]                 # pre-step lakefrac
            nf_l = jnp.where(has_l[:, None], lres.lane_nf, 0.0)
            maxnf_l = jnp.where(has_l[:, None], lres.lane_maxnf, 0.0)
            one_m_nf = jnp.maximum(1.0 - nf_l, 1e-6)
            m_adv = jnp.clip(
                (m1 * (1.0 - lf)[..., None]
                 + mm_max * (lf - nf_l)[..., None]) / one_m_nf[..., None],
                0.0, mm_max)
            live_l = jnp.logical_and(jnp.logical_and(has_l[:, None],
                                                     lf < 1.0), p.mask)
            dmoist_total = jnp.where(live_l[..., None], m_adv - m0_lane,
                                     0.0)
            moist_wet_f = moist_wet_f + dmoist_total
            moist_dry_f = moist_dry_f + dmoist_total
            # per-lane snow rescale (advect_snow_storage: shrink by
            # (1-max_newfraction) when the lake grew, stretch by
            # (1-lakefrac) when it receded, both onto (1-newfraction))
            grow_l = maxnf_l > lf
            sscale_lane = jnp.where(
                live_l,
                jnp.where(grow_l, 1.0 - maxnf_l, 1.0 - lf) / one_m_nf,
                1.0)
            snow_adv_mm = (swq + snow_canopy_new) * (sscale_lane - 1.0) \
                * 1000.0
            swq = swq * sscale_lane
            surf_water = surf_water * sscale_lane
            pack_water = pack_water * sscale_lane
            depth = depth * sscale_lane
            snow_canopy_new = snow_canopy_new * sscale_lane
            # Wdew rescale (advect_soil_veg_storage:2460-2469)
            wdew_adv_mm = wdew_new * (sscale_lane - 1.0)
            wdew_new = wdew_new * sscale_lane
            # closure credit: all advected water is exchanged with the lake
            # (the lake books its own residual; lakes.eb.c comment at 2030)
            recharge_lane_mm = (dmoist_total.sum(-1)
                                + snow_adv_mm + wdew_adv_mm)
            to_mm = 1000.0 / cell_area
            # put_data weighting of the lake's own fluxes: lakes.eb.c:2337-
            # 2343 stores runoff/baseflow/evap as mm over the CURRENT lake
            # area (runoff_out*1000/(newfraction*basin[0])), and put_data.c
            # :405-413,789 aggregates them with AreaFactor = Cv*Clake where
            # Clake = sarea/basin[0]. The net cell contribution is therefore
            # flux_m3 * 1000/sarea * Cv*Clake = flux_m3*to_mm * (Cv/Cl[0]) —
            # faithful to the reference, self-consistent only when the
            # wetland tile's Cv equals the lake basin fraction Cl[0].
            lake_w = wl_w * clake_post          # Cv*Clake (put_data.c:789)
            over_lake_mm = 1000.0 / jnp.maximum(lres.sarea, 1.0)
            cell_runoff = ((1.0 - rperc) * oth_ro
                           + lres.runoff_out_m3 * over_lake_mm * lake_w)
            cell_baseflow = ((1.0 - rperc) * oth_bf
                             + lres.baseflow_out_m3 * over_lake_mm * lake_w)
            lake_evap_mm = lres.evap_m3 * over_lake_mm * lake_w
            # OUT_PREC with lakes (full_energy.c:240-243,781): HRU precip
            # accumulates with the wetland Cv scaled by the PRE-step lake
            # fraction, plus the lake's own precip at Cl[0]*lakefrac_pre;
            # out_rain/out_snow get NO lake term (upstream quirk).
            w_pre = w * (1.0 - wl_mask * clake_pre[:, None])
            cl0 = basin0_w / jnp.maximum(cell_area, 1.0)
            # gauge correction factors are cell-independent 1.0 unless
            # CORRPREC; the reference applies them here too
            # (full_energy.c:779-781)
            lake_prec_add = ((forcing["prec"] - rainonly_c)
                             * jnp.asarray(p.padj_s)
                             + rainonly_c * jnp.asarray(p.padj_r)
                             ) * cl0 * clake_pre
            prec_cell = (out_prec * w_pre).sum(-1) + lake_prec_add
            rain_cell = (out_rain * w_pre).sum(-1)
            snow_cell = (out_snow * w_pre).sum(-1)
            lake_out = {
                "OUT_LAKE_DEPTH": lres.depth,
                "OUT_LAKE_VOLUME": lres.state.volume,
                "OUT_LAKE_SURF_AREA": lres.sarea,
                "OUT_LAKE_ICE_FRACT": lres.ice_fract,
                # put_data.c:447 writes lake_var.hice RAW (meters) despite the
                # [cm] unit claim in output_list_utils.c:97 — replicate
                "OUT_LAKE_ICE_HEIGHT": lres.state.ice_height,
                # put_data.c:475 reads lake_var.temp[0] — the top WATER
                # layer temperature, not a coverage blend over ice/snow
                "OUT_LAKE_SURF_TEMP": lres.state.temp[..., 0],
                "OUT_LAKE_EVAP": lake_evap_mm,
                "OUT_LAKE_RCHRG": lres.recharge_m3 * to_mm,
                # extended lake diagnostics (put_data.c lake section)
                "OUT_LAKE_AREA_FRAC": lake_w,   # Cv*Clake (put_data.c:463)
                # lake ice expressed as the reference does: per-ice-area
                # water equivalent scaled by ice/water density
                # (put_data.c OUT_LAKE_ICE formula)
                "OUT_LAKE_ICE": jnp.where(
                    lres.state.ice_area > 0.0,
                    lres.state.ice_water_eq
                    / jnp.maximum(lres.state.ice_area, 1.0)
                    * c.ICE_DENSITY / c.RHO_W, 0.0),
                # ice/snow slab surface temperature (lake_var.tempi)
                "OUT_LAKE_ICE_TEMP": jnp.where(
                    lres.state.ice_area > 0.0, lres.state.tempi, 0.0),
                "OUT_LAKE_SWE": lres.state.swe,              # m over lake
                "OUT_LAKE_SWE_V": lres.state.swe * lres.sarea,     # m3
                "OUT_LAKE_DSWE_V": (lres.state.swe - state.lake_swe)
                * lres.sarea,
                "OUT_LAKE_DSWE": (lres.state.swe - state.lake_swe)
                * lres.sarea * to_mm,
                "OUT_LAKE_DSTOR_V": lres.state.volume - state.lake_volume,
                "OUT_LAKE_DSTOR": (lres.state.volume - state.lake_volume)
                * to_mm,
                "OUT_LAKE_MOIST": lres.state.volume * to_mm,
                "OUT_SURFSTOR": lres.state.volume * to_mm,
                "OUT_DELSURFSTOR": (lres.state.volume - state.lake_volume)
                * to_mm,
                "OUT_LAKE_BF_IN_V": b_in,
                "OUT_LAKE_BF_IN": b_in * to_mm,
                "OUT_LAKE_BF_OUT_V": lres.baseflow_out_m3,
                "OUT_LAKE_BF_OUT": lres.baseflow_out_m3 * to_mm,
                # no channel-routing network in the standalone model:
                # channel_in is identically 0 (lake_var.channel_in is only
                # fed by external routing couplers)
                "OUT_LAKE_CHAN_IN_V": jnp.zeros_like(b_in),
                "OUT_LAKE_CHAN_IN": jnp.zeros_like(cell_runoff),
                "OUT_LAKE_CHAN_OUT_V": lres.runoff_out_m3,
                "OUT_LAKE_CHAN_OUT": lres.runoff_out_m3 * to_mm,
                "OUT_LAKE_EVAP_V": lres.evap_m3,
                "OUT_LAKE_PREC_V": lres.precip_in_m3,
                "OUT_LAKE_RCHRG_V": lres.recharge_m3,
                "OUT_LAKE_RO_IN_V": r_in,
                "OUT_LAKE_RO_IN": r_in * to_mm,
                # pack + lake-ice sublimation (ice_melt.c vapor_flux)
                "OUT_LAKE_VAPFLX_V": lres.vapor_flux_m3,
                "OUT_LAKE_VAPFLX": lres.vapor_flux_m3 * to_mm,
                # lake-column closure telemetry (new; the reference folds
                # the lake into calc_water_balance_error)
                "OUT_LAKE_WATER_ERROR": lres.water_error_mm,
                "OUT_LAKE_ENERGY_ERROR": lres.energy_error,
                # soil node temperatures under the wetland tile
                # (put_data.c:368: lake_var energy.T overridden by wetland)
                "OUT_SOIL_TNODE_WL": take_wl(node_temp),
            }
            lake_state = dict(
                lake_volume=lres.state.volume, lake_temp=lres.state.temp,
                lake_ice_we=lres.state.ice_water_eq,
                lake_ice_area=lres.state.ice_area,
                lake_ice_height=lres.state.ice_height,
                lake_swe=lres.state.swe, lake_tempi=lres.state.tempi,
                lake_snow_surf_temp=lres.state.surf_temp,
                lake_snow_pack_temp=lres.state.pack_temp,
                lake_snow_surf_water=lres.state.surf_water,
                lake_snow_pack_water=lres.state.pack_water,
                lake_salbedo=lres.state.salbedo,
                lake_last_snow=lres.state.last_snow,
                lake_melting=lres.state.melting)
            # flooded-fringe output weighting (put_data.c:195-196,271,789):
            # Clake = sarea/basin[0]; the wetland HRU aggregates at
            # Cv*(1-Clake) while the lake's own wb/eb terms enter at
            # Cv*Clake (lake_w above). Closure accounting above stays on
            # the static mosaic — the per-lane budgets are
            # weight-independent.
            w = w * (1.0 - wl_mask * clake_post[:, None])
            agg = lambda x: (x * w).sum(-1)
        else:
            lake_evap_mm = jnp.zeros_like(cell_runoff)
            prec_cell = rain_cell = snow_cell = None
            lake_state = dict(
                lake_volume=state.lake_volume, lake_temp=state.lake_temp,
                lake_ice_we=state.lake_ice_we,
                lake_ice_area=state.lake_ice_area,
                lake_ice_height=state.lake_ice_height,
                lake_swe=state.lake_swe, lake_tempi=state.lake_tempi,
                lake_snow_surf_temp=state.lake_snow_surf_temp,
                lake_snow_pack_temp=state.lake_snow_pack_temp,
                lake_snow_surf_water=state.lake_snow_surf_water,
                lake_snow_pack_water=state.lake_snow_pack_water,
                lake_salbedo=state.lake_salbedo,
                lake_last_snow=state.lake_last_snow,
                lake_melting=state.lake_melting)

        # Without DIST_PRCP the dry columns are inert: pass the carried
        # arrays through untouched so XLA elides the copies. They are never
        # read before a storm-onset averaging overwrites them (mu==1 until
        # then), so stale values are harmless even across a warm start.
        new_state = ModelState(
            moist=moist_wet_f, ice=ice_new, wdew=wdew_new,
            moist_dry=moist_dry_f if gp.dist_prcp else state.moist_dry,
            ice_dry=ice_new_d if gp.dist_prcp else state.ice_dry,
            wdew_dry=wdew_new_d if gp.dist_prcp else state.wdew_dry,
            snow_canopy=snow_canopy_new,
            swq=swq, surf_temp=surf_temp, pack_temp=pack_temp,
            surf_water=surf_water, pack_water=pack_water,
            density=density, depth=depth, albedo=snow_alb,
            last_snow=last_snow, melting=melting, coverage=coverage,
            cold_content=cold_content, snow_flag=snow_present,
            **cov_state,
            node_temp=node_temp, tfoliage=tfoliage_new,
            long_under_out=r["luo_out"],
            glac_water_storage=glac_water_storage,
            # mass_balance = precip_in - water_reaching_surface - sublimation
            # (surface_fluxes_glac.c:478, m of water equivalent)
            glac_cum_mass_balance=state.glac_cum_mass_balance
            + jnp.where(glacier,
                        (out_prec - glac_inflow - snow_sub_mm) / 1000.0
                        - jnp.where(on_ice, glac.vapor_flux, 0.0),
                        0.0),
            glac_surf_temp=glac_surf_temp,
            surf_temp_fbcount=state.surf_temp_fbcount + fb.astype(jnp.int32),
            snow_temp_fbcount=state.snow_temp_fbcount
            + sm.surf_temp_fbflag.astype(jnp.int32),
            mu=mu, still_storm=still_storm, dry_time=dry_time,
            cell_valid=state.cell_valid,
            **lake_state,
        )

        # ---- cell aggregation (put_data.c:282-330: sum w*Cv*mu*AreaFract);
        # mu-weighting of the wet/dry columns happens in dw()/dwl() ----------
        ppt_c = dw(ppt, ppt_d)
        wdew_c = dw(wdew_new, wdew_new_d)
        # note: swq already includes surf/pack liquid water (snow_melt.c:540)
        # storage baseline uses the post-transfer lanes at the NEW mu: the
        # storm transfers conserve mu-weighted mass (dist_prcp.py); lake
        # recharge enters as an influx credit on the wetland lane
        storage0 = dw(moist_w.sum(-1), moist_d.sum(-1)) + dw(wdew_w, wdew_d) \
            + state.swq * 1000.0 \
            + state.snow_canopy * 1000.0 + state.glac_water_storage
        storage1 = dw(moist_wet_f.sum(-1), moist_dry_f.sum(-1)) + wdew_c \
            + swq * 1000.0 \
            + snow_canopy_new * 1000.0 + glac_water_storage
        influx = out_prec + jnp.where(glacier, glac_melt_mm, 0.0) \
            + recharge_lane_mm - glac_firn_mm
        wb_err = (storage1 - storage0) - (
            influx - total_evap - (runoff_c + glac_outflow) - baseflow_c)

        # potential evaporation for the 6 reference surfaces
        # (surface_fluxes.c:659-694 -> compute_pot_evap.c)
        from .physics.evap import compute_pot_evap, svp as _svp
        pets = compute_pot_evap(
            mi, tair, vpd, sw_in, eb.net_long_bare, B(p.elevation), dt_hours,
            aero.resist.snow_free, aero.resist.canopy,
            p.rmin, p.rarc, p.rgl, lai, veg_albedo, p.overstory)

        # energy closure residual at the accepted surface temperature
        # (calc_energy_balance_errors equivalent): eb.error is exactly the
        # surface EB residual; melt branch closes by construction.
        energy_err = eb.error

        # aggregated layer quantities
        aggl = lambda x: (x * w[..., None]).sum(-2)      # [..., n_layer]
        moist_f = dwl(moist_wet_f, moist_dry_f)
        ice_f = dwl(ice_new, ice_new_d)
        liq_f = moist_f - ice_f
        rootmoist = agg((moist_f * (p.root > 0.0)).sum(-1))
        wcr_b, wpwp_b = B(p.wcr), B(p.wpwp)
        soil_wet = agg(jnp.clip(
            (moist_f - wpwp_b).sum(-1)
            / jnp.maximum((B(p.max_moist) - wpwp_b).sum(-1), 1e-10), 0.0, 1.0))

        # reported surface skin temperature: coverage-weighted blend of pack
        # surface and soil surface (calc_surf_energy_bal.c:578-580
        # energy->Tsurf); radiative temperature picks the canopy for
        # snow-covered overstory lanes (put_data.c:1015-1019)
        ts_blend = coverage * surf_temp + (1.0 - coverage) * ts
        rt_lane = jnp.where(jnp.logical_and(p.overstory, snow_present),
                            tcanopy, ts_blend)
        rad_temp = agg((rt_lane + c.KELVIN) ** 4) ** 0.25

        # --- derived quantities for the extended put_data variable set ------
        zero_c = jnp.zeros_like(cell_runoff)
        # sublimation split: blowing vs pack-surface portion
        # (put_data.c:799-801 OUT_SUB_SURFACE = snow.surface_flux)
        sub_blow_lane = ((-blow_flux * dt_sec if gp.blowing else 0.0 * tair)
                         * jnp.where(snow_present, 1.0, 0.0))
        # aerodynamic conductances: cond1 = understory/surface exchange at the
        # resistance actually used by the EB, cond2 = overstory exchange
        # (put_data.c:836-860; resistances re-derived as reciprocals at
        # :551-564 — here per step rather than from the aggregate)
        ra_used = jnp.where(
            snow_present, aero.resist.snow_covered,
            jnp.where(on_ice, aero.resist.glacier, aero.resist.snow_free))
        cond1 = 1.0 / jnp.maximum(ra_used, c.SMALL)
        cond2 = jnp.where(p.overstory,
                          1.0 / jnp.maximum(aero.resist.canopy, c.SMALL), 0.0)
        cond_eff = jnp.where(p.overstory, cond2, cond1)
        agg_cond1 = agg(cond1)
        agg_cond2 = agg(cond2)
        agg_cond = agg(cond_eff)
        recip = lambda x: jnp.where(x > c.SMALL, 1.0 / jnp.maximum(x, c.SMALL),
                                    c.HUGE_RESIST)
        # moisture storage deltas (put_data.c:574-600 save_data deltas)
        delsoil = agg(dw(moist_wet_f.sum(-1), moist_dry_f.sum(-1))
                      - dw(moist_w.sum(-1), moist_d.sum(-1)))
        soil_moist_l = aggl(moist_f)
        soil_liq_l = aggl(liq_f)
        smliqfrac = soil_liq_l / jnp.maximum(soil_moist_l, c.SMALL)
        # freezing/thawing front depths (soil_conduction.c:775
        # find_0_degree_fronts); only meaningful with an active node profile
        if frozen:
            from .physics.frozen_soil import find_zero_fronts
            tdep, fdep = find_zero_fronts(node_temp, geom.zsum[:, None, :])
            tdepth_c = (tdep * w[..., None]).sum(-2) * 100.0   # cm
            fdepth_c = (fdep * w[..., None]).sum(-2) * 100.0
            # per-node fallback flags [c,h,nn] (frozen_soil.c:404-418)
            soilt_fb = (eb.node_fbcount > 0).astype(ts.dtype) if fd_nodes \
                else jnp.zeros_like(node_temp)
        else:
            tdepth_c = jnp.zeros(cell_runoff.shape + (3,), cell_runoff.dtype)
            fdepth_c = tdepth_c
            soilt_fb = jnp.zeros_like(node_temp)

        outputs = {
            # --- water states ---
            "OUT_SWE": agg((swq + snow_canopy_new) * 1000.0),
            "OUT_SNOW_DEPTH": agg(depth * 100.0),
            "OUT_SNOW_COVER": agg(coverage),
            "OUT_SNOW_CANOPY": agg(snow_canopy_new * 1000.0),
            "OUT_WDEW": agg(wdew_c),
            "OUT_SOIL_MOIST": aggl(moist_f),
            "OUT_SOIL_LIQ": aggl(liq_f),
            "OUT_SOIL_ICE": aggl(ice_f),
            "OUT_SOIL_MOIST_TOT": agg(moist_f.sum(-1)),
            "OUT_ROOTMOIST": rootmoist,
            "OUT_SOIL_WET": soil_wet,
            "OUT_ASAT": agg(dw(ro.asat, ro_d.asat)),
            # --- water fluxes (mm/step) ---
            # with LAKES the precip echoes use the PRE-step lake-scaled
            # weights + the lake's own precip term (full_energy.c:240-243,
            # 429-431,781); rain/snow echoes get no lake term upstream
            "OUT_PREC": prec_cell if prec_cell is not None
            else agg(out_prec),
            "OUT_RAINF": rain_cell if rain_cell is not None
            else agg(out_rain),
            "OUT_SNOWF": snow_cell if snow_cell is not None
            else agg(out_snow),
            "OUT_EVAP": agg(total_evap) + lake_evap_mm,
            "OUT_EVAP_BARE": agg(jnp.where(bare, evap_sfree, 0.0)),
            # snow-free-canopy overstory lanes evaporate intercepted
            # liquid inside the foliage EB even while ground snow is
            # present (func_canopy_energy_bal.c:88-111 -> put_data.c:809)
            "OUT_EVAP_CANOP": agg(jnp.where(
                snowing, cevap_liq_mm,
                dw(eb.canopy_evap_mm,
                   eb.canopy_evap_mm_dry if gp.dist_prcp
                   else eb.canopy_evap_mm))),
            "OUT_TRANSP_VEG": agg(jnp.where(
                jnp.logical_or(bare, snowing), 0.0,
                dw(layer_evap.sum(-1), layer_evap_d.sum(-1)))),
            "OUT_SUB_SNOW": agg(snow_sub_mm),
            "OUT_SUB_CANOP": agg(canopy_sub_mm),
            # reference sign split (snow_melt.c:277-281 + put_data.c:800-802):
            # vapor_flux is loss-POSITIVE, its blowing/surface components are
            # loss-NEGATIVE (vapor_flux = -(blowing_flux + surface_flux))
            "OUT_SUB_BLOWING": -agg(sub_blow_lane),
            "OUT_TFOL_FBFLAG": agg(tfol_fb.astype(ts.dtype)),
            "OUT_TCAN_FBFLAG": agg(tcanopy_fb.astype(ts.dtype)),
            # CLOSE_ENERGY fixed-point trip count this record (max over
            # lanes; TPU cost telemetry — every lane pays it)
            "OUT_TCANOPY_ITER": jnp.broadcast_to(
                close_iters_out.astype(ts.dtype), cell_runoff.shape),
            "OUT_TCANOPY": agg(tcanopy),
            # snow-free overstory reports Tfoliage, else the radiative
            # surface temperature (put_data.c:1030-1036)
            "OUT_VEGT": agg(jnp.where(
                jnp.logical_and(p.overstory, ~snow_present),
                tfoliage_new, rt_lane)),
            "OUT_RUNOFF": cell_runoff,
            "OUT_BASEFLOW": cell_baseflow,
            "OUT_INFLOW": agg(ppt_c),
            "OUT_SNOW_MELT": agg(melt_out),
            "OUT_WATER_ERROR": agg(wb_err),
            "OUT_PET_SATSOIL": agg(pets["satsoil"]),
            "OUT_PET_H2OSURF": agg(pets["h2osurf"]),
            "OUT_PET_SHORT": agg(pets["short"]),
            "OUT_PET_TALL": agg(pets["tall"]),
            "OUT_PET_NATVEG": agg(pets["natveg"]),
            "OUT_PET_VEGNOCR": agg(pets["vegnocr"]),
            # --- energy fluxes (W/m^2) ---
            "OUT_NET_SHORT": agg(ns_rep),
            "OUT_NET_LONG": agg(nl_rep),
            # energy fluxes are NEGATED at output — the reference reports
            # them positive-upward while the internal convention is
            # positive-toward-surface (put_data.c:1086-1102). Pack fluxes
            # weight by (coverage + delta_coverage) = the area the pack
            # actually occupied this step (surface_fluxes.c:804-815,
            # solve_snow.c:456-458)
            "OUT_LATENT": -agg(lat_rep),
            "OUT_LATENT_SUB": -agg(latsub_rep),
            "OUT_SENSIBLE": -agg(sens_rep),
            # glacier lanes never run the soil EB in the reference: their
            # energy.grnd_flux is the GLACIER slab conduction
            # (solve_glacier.c:94 <- glacier_melt GroundFlux) or, under a
            # pack, the PACK EB's GroundFlux (solve_snow_glac.c:151);
            # deltaH/fusion stay 0 there (round-5 fix: the soil EB's terms
            # were aggregated on glacier lanes, biasing bands GRND_FLUX
            # mean 14.7 vs 9.4 W/m2)
            "OUT_GRND_FLUX": -agg(jnp.where(
                on_ice, glac.terms.grnd_flux,
                jnp.where(glacier, sm.terms.grnd_flux, eb.grnd_flux))),
            "OUT_DELTAH": -agg(jnp.where(glacier, 0.0, eb.delta_h)),
            "OUT_FUSION": -agg(jnp.where(glacier, 0.0, eb.fusion)),
            # OUT_SNOW_FLUX reports the soil EB's pack-conduction term
            # (store_snow_flux += soil_energy.snow_flux*(cov+dcov),
            # surface_fluxes.c:810-812)
            "OUT_SNOW_FLUX": agg(eb.snow_flux * cov_w),
            "OUT_ADVECTION": agg(adv_pack * cov_w),
            "OUT_DELTACC": agg(dcc_pack * cov_w),
            # raw pack refreeze energy (negative = surface melt), as the
            # reference reports it (put_data.c:1126)
            "OUT_RFRZ_ENERGY": agg(rfz_pack * cov_w),
            # energy used in reducing the snow-covered area
            # (put_data.c:1129 <- solve_snow.c melt_energy)
            "OUT_MELT_ENERGY": agg(melt_energy),
            "OUT_ENERGY_ERROR": agg(energy_err),
            # --- temperatures / surface states ---
            "OUT_SURF_TEMP": agg(ts_blend),
            "OUT_RAD_TEMP": rad_temp,
            "OUT_BARESOILT": agg(jnp.where(bare, ts_blend, 0.0)),
            "OUT_SNOW_SURF_TEMP": agg(surf_temp),
            "OUT_SNOW_PACK_TEMP": agg(pack_temp),
            "OUT_SOIL_TEMP": aggl(jnp.repeat(
                node_temp[..., :1], moist_f.shape[-1], axis=-1))
            if not frozen else aggl(_layer_temps(node_temp, moist_f, geom, p)),
            "OUT_SOIL_TNODE": (node_temp * w[..., None]).sum(-2),
            "OUT_ALBEDO": agg(albedo_under),
            "OUT_SALBEDO": agg(snow_alb),
            "OUT_SURFT_FBFLAG": agg(fb.astype(ts.dtype)),
            "OUT_SNOWT_FBFLAG": agg(sm.surf_temp_fbflag.astype(ts.dtype)),
            # --- met echo: raw CELL-level atmos values (put_data.c:227-249
            # direct assignment from cell->atmos — no Tfactor band lapse, no
            # HRU weighting; Tfactor only enters the physics' Tair) ---
            "OUT_AIR_TEMP": forcing["air_temp"],
            "OUT_WIND": jnp.maximum(
                forcing["wind"],
                jnp.asarray(gp.min_wind_speed, tair.dtype)),
            "OUT_SHORTWAVE": forcing["shortwave"],
            "OUT_LONGWAVE": forcing["longwave"],
            "OUT_DENSITY": forcing["density"],
            "OUT_PRESSURE": forcing["pressure"] / 1000.0,  # kPa per reference
            "OUT_VP": forcing["vp"] / 1000.0,
            "OUT_VPD": jnp.maximum(
                _svp(forcing["air_temp"]) - forcing["vp"], 0.0) / 1000.0,
            "OUT_REL_HUMID": 100.0 * forcing["vp"] / jnp.maximum(
                _svp(forcing["air_temp"]), 1e-10),
            # --- PCIC glacier variables ---
            "OUT_GLAC_WAT_STOR": agg(glac_water_storage),
            "OUT_GLAC_AREA": agg(jnp.where(glacier, 1.0, 0.0)),
            "OUT_GLAC_MELT": agg(glac_melt_mm),
            "OUT_GLAC_SUB": agg(jnp.where(on_ice, -glac.vapor_flux, 0.0)
                                * 1000.0),
            "OUT_GLAC_INFLOW": agg(glac_inflow),
            "OUT_GLAC_OUTFLOW": agg(glac_outflow),
            "OUT_GLAC_SURF_TEMP": agg(glac_surf_temp),
            "OUT_GLAC_MBAL": agg(state.glac_cum_mass_balance * 1000.0),
            # firn→ice conversion and the ice mass budget it feeds
            # (put_data.c:930-932; ice_mass_balance defined at
            # surface_fluxes_glac.c:479)
            "OUT_GLAC_ACCUM": agg(glac_firn_mm),
            "OUT_GLAC_IMBAL": agg(
                glac_firn_mm - glac_melt_mm
                - jnp.where(on_ice, glac.vapor_flux, 0.0) * 1000.0),
            "OUT_GLAC_OUTFLOW_COEF": agg(kfac),
            "OUT_GLAC_DELTACC": agg(jnp.where(on_ice, glac.terms.delta_cc,
                                              0.0)),
            "OUT_GLAC_FLUX": agg(jnp.where(on_ice, glac.terms.grnd_flux,
                                           0.0)),
            "OUT_GLAC_MELT_ENERGY": agg(jnp.where(
                on_ice, glac.terms.melt_energy, 0.0)),
            "OUT_GLAC_TSURF_FBFLAG": agg(jnp.where(
                on_ice, glac.fbflag, False).astype(ts.dtype)),
            # --- extended put_data set (put_data.c:574-600, 836-860) ---
            "OUT_QAIR": agg(c.EPS_RATIO * vp_air / pressure),
            "OUT_SOIL_LIQ_TOT": agg(liq_f.sum(-1)),
            "OUT_SOIL_ICE_TOT": agg(ice_f.sum(-1)),
            "OUT_SMLIQFRAC": smliqfrac,
            "OUT_SMFROZFRAC": 1.0 - smliqfrac,
            # static soil echoes (put_data.c:517-522)
            "OUT_POROSITY": jnp.asarray(p.max_moist)
            / (jnp.asarray(p.depth) * 1000.0),
            "OUT_SOIL_DEPTH": jnp.asarray(p.depth),
            # storage-change diagnostics (put_data.c:574-600)
            "OUT_DELSOILMOIST": delsoil,
            "OUT_DELSWE": agg((swq + snow_canopy_new - state.swq
                               - state.snow_canopy) * 1000.0),
            "OUT_DELINTERCEPT": agg(wdew_c - dw(wdew_w, wdew_d)),
            # refreeze flux in mm (put_data.c:591: RFRZ_ENERGY/Lf*dt)
            "OUT_REFREEZE": agg(rfz_pack * cov_w)
            / c.LF * dt_sec,
            "OUT_SUB_SURFACE": -agg(snow_sub_mm - sub_blow_lane),
            # sensible heat advected from snow-free patches onto the pack
            # (advected_sensible_heat.c:8, SPATIAL_SNOW only); negated and
            # coverage-weighted like the other pack terms
            # (put_data.c:1131, surface_fluxes.c:804-806)
            "OUT_ADV_SENS": -agg(sm.terms.advected_sensible * cov_w),
            "OUT_AERO_COND": agg_cond,
            "OUT_AERO_COND1": agg_cond1,
            "OUT_AERO_COND2": agg_cond2,
            # scene resistance = 1/OUT_AERO_COND (put_data.c:564; the
            # output interval re-derives it from the aggregated conductance,
            # put_data.c:681 — output.aggregate_outputs does the same)
            "OUT_AERO_RESIST": recip(agg_cond),
            "OUT_AERO_RESIST1": recip(agg_cond1),
            "OUT_AERO_RESIST2": recip(agg_cond2),
            # net radiation + incoming longwave echoes (put_data.c:592,
            # :1075-1077 — LongOverIn == LongUnderIn == cell lw_in here;
            # the canopy-filtered understory LW deviation is documented at
            # the snow_melt call)
            "OUT_R_NET": agg(ns_rep + nl_rep),
            "OUT_IN_LONG": agg(lw_in),
            "OUT_SOILT_FBFLAG": (soilt_fb * w[..., None]).sum(-2),
            "OUT_FDEPTH": fdepth_c,
            "OUT_TDEPTH": tdepth_c,
            # EXCESS_ICE subsidence — compiled out upstream
            # (user_def.h EXCESS_ICE, full_energy.c:503-707)
            "OUT_SUBSIDENCE": zero_c,
            "OUT_SURF_FROST_FRAC": agg(
                (ice_f[..., 0] > 0.0).astype(ts.dtype)),
            "OUT_SURFSTOR": zero_c,
            "OUT_DELSURFSTOR": zero_c,
            # registered upstream but never filled by put_data.c
            # (output_list_utils.c:230 only) — emitted as 0 for grammar parity
            "OUT_SURF_COND": zero_c,
        }
        if geom is not None:
            # static node-depth echo (put_data.c:522)
            outputs["OUT_ZSUM_NODE"] = jnp.broadcast_to(
                geom.zsum, (p.n_cell, geom.zsum.shape[-1]))
        if "tskc" in forcing:
            outputs["OUT_TSKC"] = agg(B(forcing["tskc"]))

        # ---- band-resolved outputs (put_data.c band accumulation: within a
        # band each veg tile's Cv sums to 1, so sum(Cv*x) = band average) ----
        n_band = max(1, gp.snow_band)
        if n_band > 1:
            def band_agg(x):
                cols = []
                for b in range(n_band):
                    in_b = jnp.logical_and(p.band == b, p.mask)
                    cols.append((jnp.where(in_b, p.cv * x, 0.0)).sum(-1))
                return jnp.stack(cols, -1)      # [c, n_band]
            outputs["OUT_SWE_BAND"] = band_agg((swq + snow_canopy_new)
                                               * 1000.0)
            outputs["OUT_SNOW_DEPTH_BAND"] = band_agg(depth * 100.0)
            outputs["OUT_SNOW_CANOPY_BAND"] = band_agg(snow_canopy_new
                                                       * 1000.0)
            outputs["OUT_SNOW_COVER_BAND"] = band_agg(coverage)
            outputs["OUT_ALBEDO_BAND"] = band_agg(albedo_under)
            outputs["OUT_LATENT_BAND"] = -band_agg(lat_under)
            outputs["OUT_SENSIBLE_BAND"] = -band_agg(sens_under)
            outputs["OUT_NET_SHORT_BAND"] = band_agg(
                net_short_bare + net_short_snow * coverage)
            outputs["OUT_NET_LONG_BAND"] = band_agg(
                eb.net_long_bare + sm.terms.net_long * coverage)
            outputs["OUT_SNOW_MELT_BAND"] = band_agg(melt_out)
            outputs["OUT_GLAC_MELT_BAND"] = band_agg(glac_melt_mm)
            outputs["OUT_GLAC_WAT_STOR_BAND"] = band_agg(glac_water_storage)
            outputs["OUT_AREA_BAND"] = band_agg(jnp.ones_like(coverage))
            outputs["OUT_ELEV_BAND"] = band_agg(B(p.elevation) * 0.0
                                                + p.band_elev)
            # extended band-resolved energy/glacier set (put_data.c
            # collect_eb_terms band accumulation, vicNl_def.h:548-560)
            outputs["OUT_ADVECTION_BAND"] = band_agg(adv_pack * cov_w)
            outputs["OUT_ADV_SENS_BAND"] = -band_agg(
                sm.terms.advected_sensible * cov_w)
            outputs["OUT_DELTACC_BAND"] = band_agg(dcc_pack * cov_w)
            outputs["OUT_GRND_FLUX_BAND"] = -band_agg(jnp.where(
                on_ice, glac.terms.grnd_flux,
                jnp.where(glacier, sm.terms.grnd_flux, eb.grnd_flux)))
            outputs["OUT_IN_LONG_BAND"] = band_agg(lw_in)
            outputs["OUT_LATENT_SUB_BAND"] = -band_agg(
                eb.latent_heat_sub + sm.terms.latent_sub * cov_w)
            outputs["OUT_MELT_ENERGY_BAND"] = band_agg(melt_energy)
            outputs["OUT_RFRZ_ENERGY_BAND"] = band_agg(rfz_pack * cov_w)
            outputs["OUT_SNOW_FLUX_BAND"] = band_agg(
                eb.snow_flux * cov_w)
            outputs["OUT_SNOW_PACKT_BAND"] = band_agg(pack_temp)
            outputs["OUT_SNOW_SURFT_BAND"] = band_agg(surf_temp)
            outputs["OUT_GLAC_ACCUM_BAND"] = band_agg(glac_firn_mm)
            outputs["OUT_GLAC_AREA_BAND"] = band_agg(
                jnp.where(glacier, 1.0, 0.0))
            outputs["OUT_GLAC_IMBAL_BAND"] = band_agg(
                glac_firn_mm - glac_melt_mm
                - jnp.where(on_ice, glac.vapor_flux, 0.0) * 1000.0)
            outputs["OUT_GLAC_INFLOW_BAND"] = band_agg(glac_inflow)
            outputs["OUT_GLAC_MBAL_BAND"] = band_agg(
                state.glac_cum_mass_balance * 1000.0)
            outputs["OUT_GLAC_OUTFLOW_BAND"] = band_agg(glac_outflow)
            outputs["OUT_GLAC_SUB_BAND"] = band_agg(
                jnp.where(on_ice, -glac.vapor_flux, 0.0) * 1000.0)
            outputs["OUT_GLAC_DELTACC_BAND"] = band_agg(
                jnp.where(on_ice, glac.terms.delta_cc, 0.0))
            outputs["OUT_GLAC_FLUX_BAND"] = band_agg(
                jnp.where(on_ice, glac.terms.grnd_flux, 0.0))

        # water-table positions (wrap_compute_zwt, compute_zwt.c)
        if zwt_curves is not None:
            from .physics.hydrology_misc import compute_zwt
            cz = zwt_curves["zwt"][:, None]      # [c,1,nl+2,11]
            cm = zwt_curves["moist"][:, None]
            zwt_l = compute_zwt(
                moist_f, cz[:, :, :nl], cm[:, :, :nl])  # per layer
            zwt2 = compute_zwt(moist_f[..., :-1].sum(-1),
                               cz[:, :, nl], cm[:, :, nl])
            zwt3 = compute_zwt(moist_f.sum(-1),
                               cz[:, :, nl + 1], cm[:, :, nl + 1])
            # zwt method 1: lowest unsaturated layer's zwt
            sat = (B(p.max_moist) - moist_f) <= 1e-10
            all_sat = sat.all(-1)
            zwt1 = jnp.where(all_sat, 0.0, zwt_l[..., -1])
            outputs["OUT_ZWT"] = agg(zwt1)
            outputs["OUT_ZWT2"] = agg(zwt2)
            outputs["OUT_ZWT3"] = agg(zwt3)
            outputs["OUT_ZWTL"] = aggl(zwt_l)

        outputs.update(lake_out)

        # ---- CONTINUEONERROR: freeze cells whose solution went non-finite
        # (vicNl.c:521-558 isValid mask, re-expressed as a masked update) ----
        if gp.continue_on_error:
            finite = (jnp.isfinite(new_state.moist).all(axis=(-2, -1))
                      & jnp.isfinite(new_state.swq).all(axis=-1)
                      & jnp.isfinite(new_state.node_temp).all(axis=(-2, -1)))
            cell_valid = jnp.logical_and(state.cell_valid, finite)

            def freeze(new, old):
                v = cell_valid.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(v, new, old)

            new_state = jax.tree_util.tree_map(freeze, new_state, state)
            new_state = new_state.__class__(
                **{**{f: getattr(new_state, f)
                      for f in new_state.__dataclass_fields__},
                   "cell_valid": cell_valid})
            vmask = cell_valid.astype(ts.dtype)
            outputs = {k: v * vmask.reshape((-1,) + (1,) * (v.ndim - 1))
                       for k, v in outputs.items()}
            outputs["OUT_CELL_VALID"] = vmask
        else:
            new_state = new_state.__class__(
                **{**{f: getattr(new_state, f)
                      for f in new_state.__dataclass_fields__},
                   "cell_valid": state.cell_valid})

        if outvars is not None:
            keep = set(outvars) | {"OUT_WATER_ERROR"}
            if gp.continue_on_error:
                keep.add("OUT_CELL_VALID")
            outputs = {k: v for k, v in outputs.items() if k in keep}

        return new_state, outputs

    return step


def _layer_temps(node_temp, moist_f, geom, p):
    """Layer-average temperatures from node temps (estimate_layer_ice path)."""
    from .physics.frozen_soil import estimate_layer_ice
    lt, _ = estimate_layer_ice(node_temp, moist_f, geom, p, frozen=False)
    return lt


def gs_wind_h(p: DeviceParams, veg_displ):
    """Wind measurement reference height per HRU: veg wind_h, but at least
    displacement + 2 m above it for bare (read_veglib wind_h semantics)."""
    return jnp.maximum(p.wind_h, veg_displ + 2.0)


def surf_atten_of(lai, p: DeviceParams):
    """Surface attenuation exp(-rad_atten * LAI) for EVERY vegetated lane —
    not just overstory (full_energy.c:282); 1 on bare/glacier lanes. It damps
    the ground-heat/storage terms in the surface EB (func_surf_energy_bal.c
    cover_atten) and, for overstory, attenuates understory shortwave."""
    return jnp.where(p.is_bare | p.is_glacier, 1.0,
                     jnp.exp(-p.rad_atten * lai))


def run(state: ModelState, forcing_stacked: dict, params: DeviceParams, gp,
        geom=None, zwt_curves=None, lake_params=None, outvars=None):
    """Scan the step over [n_rec, ...] stacked forcing. Returns
    (final_state, StepOutputs stacked over records)."""
    step = make_step(params, gp, geom, zwt_curves, lake_params,
                     outvars=outvars)

    def body(carry, forc):
        return step(carry, forc)

    return jax.lax.scan(body, state, forcing_stacked)


def make_forcing_stack(forc: dict, timeaxis, dtype=jnp.float32) -> dict:
    """Stack host forcing dict of [n_rec, n_cell] numpy arrays + time axis into
    the scan input pytree."""
    out = {k: jnp.asarray(v, dtype) for k, v in forc.items()}
    out["month"] = jnp.asarray(timeaxis.month, jnp.int32)
    out["day_in_year"] = jnp.asarray(timeaxis.day_in_year, jnp.int32)
    return out
