"""Evapotranspiration chain: saturation vapor pressure, Penman–Monteith,
canopy interception evaporation, transpiration with soil-moisture stress, and
ARNO bare-soil evaporation.

Batched TPU re-expression of the reference scalar routines:
- svp/svp_slope             — /root/reference/svp.c:7-25 (HBH eqns 4.2.2/4.2.3)
- calc_rc/penman            — /root/reference/penman.c:44-140
- canopy_evap/transpiration — /root/reference/canopy_evap.c:46-445
- arno_evap                 — /root/reference/arno_evap.c:61-228 (30-term beta series)

All functions operate elementwise over any batch shape (typically [n_cell, max_hru]);
per-layer quantities carry a trailing layer axis. The reference's wet/dry DIST_PRCP
loop becomes an optional leading `dist` axis handled by the caller; these kernels are
single-distribution.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import (A_SVP, B_SVP, C_SVP, CP_PM, HUGE_RESIST, LAPSE_PM,
                         PS_PM, SEC_PER_DAY)

# penman.c:40-42
_CLOSURE = 4000.0   # Pa
_RSMAX = 5000.0
_VPDMINFACTOR = 0.1


def svp(temp):
    """Saturated vapor pressure (Pa). svp.c:7-23 incl. sub-freezing correction."""
    s = A_SVP * jnp.exp((B_SVP * temp) / (C_SVP + temp))
    s = jnp.where(temp < 0.0,
                  s * (1.0 + 0.00972 * temp + 0.000042 * temp * temp), s)
    return s * 1000.0


def svp_slope(temp):
    """d(svp)/dT (Pa/K). svp.c (HBH 4.2.3)."""
    return (B_SVP * C_SVP) / ((C_SVP + temp) ** 2) * svp(temp)


def calc_rc(rs, net_short, rgl, tair, vpd, lai, gsm_inv, ref_crop: bool = False):
    """Canopy resistance (s/m), Wigmosta et al. 1994 factors (penman.c:44-96).

    ref_crop is a static python flag (the PET reference-surface path)."""
    rgl_safe = jnp.where(rgl == 0.0, 1.0, rgl)
    f = net_short / rgl_safe
    dayfactor = jnp.where(rs > 0.0, (1.0 + f) / (f + rs / _RSMAX), 1.0)
    tfactor = jnp.maximum(0.08 * tair - 0.0016 * tair * tair, 1e-10)
    vpdfactor = jnp.maximum(1.0 - vpd / _CLOSURE, _VPDMINFACTOR)
    lai_safe = jnp.where(lai == 0.0, 1.0, lai)
    gsm_safe = jnp.where(gsm_inv == 0.0, 1.0, gsm_inv)
    if ref_crop:
        rc_full = rs / (lai_safe * 0.5)
    else:
        rc_full = jnp.minimum(
            rs / (lai_safe * gsm_safe * tfactor * vpdfactor) * dayfactor, _RSMAX)
    rc = jnp.where(rs == 0.0, 0.0,
                   jnp.where(lai == 0.0, HUGE_RESIST,
                             jnp.where(gsm_inv == 0.0, _RSMAX, rc_full)))
    return rc


def penman_coeffs(tair, elevation):
    """The (tair, elevation)-only Penman terms — constant during a
    surface-temperature solve, hoistable out of the Brent iteration."""
    slope = svp_slope(tair)
    h = 287.0 / 9.81 * ((tair + 273.15) + 0.5 * elevation * LAPSE_PM)
    pz = PS_PM * jnp.exp(-elevation / h)
    lv = 2501000.0 - 2361.0 * tair
    gamma = 1628.6 * pz / lv
    r_air = 0.003486 * pz / (275.0 + tair)
    return slope, lv, gamma, r_air


def penman(tair, elevation, rad, vpd, ra, rc, rarc, coeffs=None):
    """Penman–Monteith evaporation in mm/day (penman.c:96-143)."""
    if coeffs is None:
        coeffs = penman_coeffs(tair, elevation)
    slope, lv, gamma, r_air = coeffs
    ra_safe = jnp.maximum(ra, 1e-10)
    evap = ((slope * rad + r_air * CP_PM * vpd / ra_safe)
            / (lv * (slope + gamma * (1.0 + (rc + rarc) / ra_safe)))
            * SEC_PER_DAY)
    # negative evap only allowed as condensation when vpd < 0 (penman.c:138-141)
    return jnp.where(jnp.logical_and(vpd >= 0.0, evap < 0.0), 0.0, evap)


def transpiration_pre(moist, soil_ice, wcr, wpwp, root,
                      rmin, rgl, lai, net_short, vpd, air_temp, elevation):
    """Everything in the transpiration split that does not depend on the
    candidate surface temperature: moisture-stress fractions, the CASE 1/2
    selection, both canopy resistances, the layer caps, and the Penman
    coefficients. Hoisted out of the surface-T Brent iteration."""
    n_layer = moist.shape[-1]
    avail = jnp.maximum(moist - soil_ice, 0.0)
    has_root = root > 0.0
    # top N-1 layers combined (canopy_evap.c:296-312): only layers with roots
    top = slice(0, n_layer - 1)
    avail_top = jnp.where(has_root[..., top], avail[..., top], 0.0)
    moist1 = avail_top.sum(-1)
    wcr1 = jnp.where(has_root[..., top], wcr[..., top], 0.0).sum(-1)
    moist2 = avail[..., -1]
    avail_eff = jnp.concatenate([avail_top, moist2[..., None]], axis=-1)
    root_last = root[..., -1]

    # CASE 1 condition (canopy_evap.c:339-343)
    case1 = ((moist1 >= wcr1) & (moist2 >= wcr[..., -1]) & (wcr1 > 0.0)) \
        | ((moist1 >= wcr1) & ((1.0 - root_last) >= 0.5)) \
        | ((moist2 >= wcr[..., -1]) & (root_last >= 0.5))

    layer_wet = avail_eff >= wcr
    gsm_l = jnp.clip((avail_eff - wpwp) / jnp.maximum(wcr - wpwp, 1e-10),
                     0.0, 1.0)
    rc1 = calc_rc(rmin, net_short, rgl, air_temp, vpd, lai,
                  jnp.ones_like(vpd))
    rc2 = calc_rc(rmin[..., None] * jnp.ones_like(gsm_l),
                  net_short[..., None], rgl[..., None], air_temp[..., None],
                  vpd[..., None], lai[..., None], gsm_l)

    # CASE 1 shortfall redistribution weights: layerevap1 = evap1 * w1
    w1 = jnp.where(layer_wet, root, gsm_l * root)
    spare_frac = jnp.where(layer_wet, 0.0, root * (1.0 - gsm_l)).sum(-1)
    root_sum = 1.0 - jnp.where(layer_wet, 0.0, root).sum(-1)
    root_sum = jnp.where(root_sum <= 0.0, 1.0, root_sum)
    w1 = w1 + jnp.where(layer_wet, root * (spare_frac / root_sum)[..., None],
                        0.0)

    # moisture-availability caps (canopy_evap.c:420-443)
    cap_icy = jnp.where(soil_ice >= wpwp, avail, moist - wpwp)
    cap = jnp.maximum(jnp.where(soil_ice > 0.0, cap_icy, moist - wpwp), 0.0)

    return dict(case1=case1, gsm_l=gsm_l, rc1=rc1, rc2=rc2, w1=w1, cap=cap,
                coeffs=penman_coeffs(air_temp, elevation))


def transpiration(moist, soil_ice, wcr, wpwp, root, depth,
                  rmin, rgl, lai, rarc,
                  rad, net_short, vpd, air_temp, elevation, ra,
                  f, wdew_frac_pow, delta_t, pre=None):
    """Transpiration split over soil layers (canopy_evap.c:218-445).

    moist/soil_ice/wcr/wpwp/root/depth: [..., n_layer]
    everything else: [...] broadcastable.
    f: fraction of step used by canopy evaporation.
    wdew_frac_pow: (Wdew/Wdmax)^(2/3) term.
    pre: optional transpiration_pre result (ts-independent hoists).
    Returns layerevap [..., n_layer] (mm/step).
    """
    if pre is None:
        pre = transpiration_pre(moist, soil_ice, wcr, wpwp, root,
                                rmin, rgl, lai, net_short, vpd, air_temp,
                                elevation)
    coeffs = pre["coeffs"]
    trans_factor = (1.0 - f * wdew_frac_pow)

    # --- CASE 1: unstressed potential ET split by roots -----------------
    evap1 = (penman(air_temp, elevation, rad, vpd, ra, pre["rc1"], rarc,
                    coeffs=coeffs)
             * delta_t / SEC_PER_DAY * trans_factor)
    layerevap1 = evap1[..., None] * pre["w1"]

    # --- CASE 2: independent stressed layers ----------------------------
    gsm_l = pre["gsm_l"]
    cl = lambda x: x[..., None]
    layerevap2 = jnp.where(
        gsm_l > 0.0,
        penman(cl(air_temp), cl(elevation), cl(rad), cl(vpd), cl(ra),
               pre["rc2"], cl(rarc),
               coeffs=tuple(cl(t) for t in coeffs))
        * delta_t / SEC_PER_DAY * root * trans_factor[..., None],
        0.0)

    layerevap = jnp.where(pre["case1"][..., None], layerevap1, layerevap2)
    return jnp.clip(layerevap, 0.0, pre["cap"])


def canopy_evap(moist, soil_ice, wcr, wpwp, root, depth,
                wdew, prec, wdmax,
                rmin, rgl, lai, rarc,
                rad, net_short, vpd, air_temp, elevation, ra,
                delta_t, calc_transpiration: bool = True, pre=None):
    """Canopy interception evaporation + transpiration (canopy_evap.c:46-213).

    Returns (evap_total_mm_per_step [...], layerevap [..., n_layer],
             canopyevap [...], throughfall [...], wdew_new [...]).
    All water terms in mm per time step.
    """
    wdmax_safe = jnp.maximum(wdmax, 1e-10)
    coeffs = pre["coeffs"] if pre is not None else None
    # spill any Wdew over this month's capacity (canopy_evap.c:152-156)
    throughfall = jnp.maximum(wdew - wdmax, 0.0)
    wdew_c = jnp.minimum(wdew, wdmax)

    # wet-canopy evaporation uses rc = 0 (calc_rc returns 0 when rs == 0,
    # penman.c:55; the reference passes rs = 0.0 here)
    canopyevap = (jnp.power(jnp.clip(wdew_c / wdmax_safe, 0.0, 1.0), 2.0 / 3.0)
                  * penman(air_temp, elevation, rad, vpd, ra,
                           jnp.zeros_like(vpd), rarc, coeffs=coeffs)
                  * delta_t / SEC_PER_DAY)

    # fraction of step consumed by canopy evaporation (canopy_evap.c:168-177)
    storage = jnp.where(delta_t == SEC_PER_DAY, wdew_c + prec, wdew_c)
    f = jnp.where(canopyevap > 0.0,
                  jnp.minimum(1.0, storage / jnp.maximum(canopyevap, 1e-20)),
                  1.0)
    canopyevap = canopyevap * f

    wdew_new = jnp.maximum(wdew_c + prec - canopyevap, 0.0)
    over = jnp.maximum(wdew_new - wdmax, 0.0)
    throughfall = throughfall + over
    wdew_new = wdew_new - over

    if calc_transpiration:
        # the (Wdew/Wdmax)^(2/3) damping uses the START-of-step dew, before
        # the capacity spill and the canopy evaporation update: the
        # reference passes tmp_veg_var->Wdew, assigned the raw input at
        # canopy_evap.c:153 before either adjustment (call at :193).
        # UNclipped — Wdew above capacity drives the factor above 1 and the
        # resulting negative layerevap is zeroed by the final clamp
        # (canopy_evap.c:441), replicated by the clip in transpiration().
        # (round-4 replay of 251 instrumented C calls: using the updated
        # dew zeroed transpiration whenever rain filled the canopy)
        wdew_frac_pow = jnp.power(jnp.maximum(wdew, 0.0) / wdmax_safe,
                                  2.0 / 3.0)
        layerevap = transpiration(moist, soil_ice, wcr, wpwp, root, depth,
                                  rmin, rgl, lai, rarc,
                                  rad, net_short, vpd, air_temp, elevation, ra,
                                  f, wdew_frac_pow, delta_t,
                                  pre=(pre or {}).get("transp"))
    else:
        layerevap = jnp.zeros_like(moist)

    evap_total = canopyevap + layerevap.sum(-1)
    return evap_total, layerevap, canopyevap, throughfall, wdew_new


def compute_pot_evap(month_idx, tair, vpd, shortwave, net_longwave, elevation,
                     dt_hours, ra_surface, ra_overstory,
                     veg_rmin, veg_rarc, veg_rgl, veg_lai, veg_albedo,
                     veg_overstory):
    """Potential evaporation for the 6 reference surfaces (compute_pot_evap.c:8-87;
    surfaces defined global.h:49-62). Returns dict PET name -> mm/step.

    The 4 non-natural surfaces use the appended reference-veg parameters;
    the 2 natural ones use the HRU's own veg parameters.
    """
    from .. import constants as c

    out = {}
    names = ("satsoil", "h2osurf", "short", "tall", "natveg", "vegnocr")
    for i, name in enumerate(names):
        if i < 4:
            rs = jnp.asarray(c.REF_VEG_RMIN[i], tair.dtype)
            rarc = jnp.asarray(c.REF_VEG_RARC[i], tair.dtype)
            rgl = jnp.asarray(c.REF_VEG_RGL[i], tair.dtype)
            lai = jnp.asarray(c.REF_VEG_LAI[i], tair.dtype)
            albedo = jnp.asarray(c.REF_VEG_ALBEDO[i], tair.dtype)
            ra = ra_surface
        else:
            rs = jnp.where(jnp.asarray(i == 5), 0.0, veg_rmin)
            rarc, rgl, lai, albedo = veg_rarc, veg_rgl, veg_lai, veg_albedo
            ra = jnp.where(veg_overstory, ra_overstory, ra_surface)
        net_short = (1.0 - albedo) * shortwave
        net_rad = net_short + net_longwave
        rc = calc_rc(rs, net_short, rgl, tair, vpd, lai,
                     jnp.ones_like(tair), ref_crop=bool(c.REF_VEG_REF_CROP[i]))
        out[name] = penman(tair, elevation, net_rad, vpd, ra, rc, rarc) \
            * dt_hours / 24.0
    return out


def build_evap_pre(moist, soil_ice, wcr, wpwp, root, max_moist0, b_infilt,
                   rmin, rgl, lai, net_short, vpd, air_temp, elevation):
    """Bundle every ts-independent ET precomputation for one moisture column:
    Penman coefficients, ARNO beta, transpiration stress/selection structure.
    Built once per model step (per DIST column) and reused by every Brent
    iterate of the surface-temperature solve."""
    return dict(
        coeffs=penman_coeffs(air_temp, elevation),
        arno_beta=arno_beta(moist[..., 0], soil_ice[..., 0], max_moist0,
                            b_infilt),
        transp=transpiration_pre(moist, soil_ice, wcr, wpwp, root,
                                 rmin, rgl, lai, net_short, vpd, air_temp,
                                 elevation))


def arno_beta(moist0, soil_ice0, max_moist0, b_infilt):
    """The ARNO beta factor: saturated-area fraction + 30-term power series
    (arno_evap.c:184-196). A pure function of soil moisture — hoist it out
    of the surface-temperature Brent iteration (the series' 30 pow/div per
    lane cost ~17% of the whole model step when evaluated per iterate)."""
    moist = jnp.minimum(jnp.maximum(moist0 - soil_ice0, 0.0), max_moist0)
    ratio = jnp.clip(1.0 - moist / max_moist0, 0.0, 1.0)
    b_safe = jnp.where(b_infilt == 0.0, 1.0, b_infilt)
    # the chained exponents of arno_evap.c:126-189: the VIC infiltration
    # shape first maps the deficit through ^(1/(b+1)) (":139" ratio =
    # pow(ratio, 1/(b_infilt+1))), so the saturated-area term is
    # 1 - deficit^(b/(b+1)) and the 30-term series runs in
    # x = deficit^(1/(b+1)) — NOT in the raw deficit (a round-4 replay of
    # 256 instrumented C arno_evap calls caught the missing first step:
    # max rel error was 27% at mid-range soil moisture)
    x = jnp.where(ratio != 0.0,
                  jnp.power(ratio, 1.0 / (b_safe + 1.0)), 0.0)
    as_frac = 1.0 - jnp.where(x != 0.0, jnp.power(x, b_safe), 0.0)
    powers = jnp.power(x[..., None], jnp.arange(1, 31, dtype=moist.dtype))
    terms = b_infilt[..., None] * powers / (
        b_infilt[..., None] + jnp.arange(1, 31, dtype=moist.dtype))
    dummy = 1.0 + terms.sum(-1)
    return as_frac + (1.0 - as_frac) * (1.0 - x) * dummy


def arno_evap(moist0, soil_ice0, max_moist0, depth0, resid_moist0,
              b_infilt, rad, air_temp, vpd, elevation, ra, delta_t,
              beta=None, coeffs=None):
    """ARNO/Francini-Pacciani bare-soil evaporation from the top layer
    (arno_evap.c:61-228). Returns evap (mm/step). `beta` is the optional
    precomputed arno_beta (ts-independent)."""
    moist = jnp.minimum(jnp.maximum(moist0 - soil_ice0, 0.0), max_moist0)
    epot = penman(air_temp, elevation, rad, vpd, ra,
                  jnp.zeros_like(ra), jnp.zeros_like(ra),
                  coeffs=coeffs) * delta_t / SEC_PER_DAY
    if beta is None:
        beta = arno_beta(moist0, soil_ice0, max_moist0, b_infilt)
    evap = epot * beta

    resid_mm = resid_moist0 * depth0 * 1000.0
    cap = jnp.maximum(moist - resid_mm, 0.0)
    evap = jnp.where(evap > 0.0, jnp.minimum(evap, cap), evap)
    return evap
