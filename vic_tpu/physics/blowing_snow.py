"""Blowing-snow sublimation and transport (Pomeroy / Liston & Sturm).

Batched re-expression of /root/reference/CalcBlowingSnow.c:56-799:
- probability of blowing-snow occurrence (Li & Pomeroy 1997 logistic in U10,
  air temperature and snow age; get_prob:~700);
- threshold shear velocity (variable, Li & Pomeroy 1997; get_thresh);
- saltation shear stress: root of
  f(u*) = log(2 g Zr / 0.12) + log(1/u*^2) - k U_r / u*   (get_shear:477)
  solved with fixed-budget bisection on [u*_t, k U10] (replacing the scalar
  Newton rtnewt); saltation roughness Zo = 0.12 u*^2 / 2g;
- sublimation of the saltation layer + suspension-layer integral of
  sub_with_height (Liston & Sturm 1998 eqs; particle-size profile of
  Pomeroy & Male) — the reference's adaptive Romberg (qromb:56-70) becomes a
  fixed 16-point log-spaced trapezoid (TPU-native fixed cost);
- Laplace wind-speed distribution over NUMINCS=10 probability increments with
  analytic conditional means (SPATIAL_WIND path);
- fetch dependence (Liston & Sturm eq. 10) and transport out of the domain.

Returns the blowing-snow mass flux (kg/m^2/s, negative = mass loss) that
feeds `latent_heat_from_snow` as BlowingMassFlux.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as c
from .evap import svp

KA_AIR = 0.0245187      # thermal conductivity of air (W/mK)
CSALT = 0.68
UTHRESH = 0.25
KIN_VIS = 1.3e-5
SETTLING = 0.3
NUMINCS = 10
MW = 18.0148e-3
R_GAS = 8.3143
G_STD = 9.80665


def get_prob(tair, age_h, surf_water, u10):
    """Probability of blowing-snow occurrence (Li & Pomeroy 1997)."""
    age = jnp.maximum(age_h, 1e-3)
    dry = surf_water < 0.001
    mean_u = jnp.where(dry,
                       11.2 + 0.365 * tair + 0.00706 * tair * tair
                       + 0.9 * jnp.log(age), 21.0)
    sigma = jnp.where(dry, 4.3 + 0.145 * tair + 0.00196 * tair * tair, 7.0)
    prob = 1.0 / (1.0 + jnp.exp(jnp.sqrt(jnp.pi) * (mean_u - u10) / sigma))
    return jnp.clip(prob, 0.0, 1.0)


def get_thresh(tair, surf_water, z0):
    """Threshold shear velocity, variable form (get_thresh)."""
    ut10 = jnp.where(surf_water < 0.001,
                     9.43 + 0.18 * tair + 0.0033 * tair * tair, 9.9)
    return c.VON_K * ut10 / jnp.log(10.0 / z0)


def shear_residual(x, u_r, zr=10.0):
    return (jnp.log(2.0 * G_STD * zr / 0.12) + jnp.log(1.0 / (x * x))
            - c.VON_K * u_r / x)


def solve_shear(u10, z0, utshear, n_iter: int = 24):
    """Saltation shear velocity (shear_stress:640-664): bisection between
    utshear and k*U10; log-profile fallback when no saltation solution."""
    umin = utshear
    umax = c.VON_K * u10
    f_lo = shear_residual(umin, u10)
    f_hi = shear_residual(umax, u10)
    bracketed = f_lo * f_hi < 0.0

    def body(_, carry):
        lo, hi, flo = carry
        mid = 0.5 * (lo + hi)
        fm = shear_residual(mid, u10)
        left = flo * fm <= 0.0
        return (jnp.where(left, lo, mid), jnp.where(left, mid, hi),
                jnp.where(left, flo, fm))

    lo, hi, _ = jax.lax.fori_loop(0, n_iter, body, (umin, umax, f_lo))
    ushear_root = 0.5 * (lo + hi)
    ushear_fb = c.VON_K * u10 / jnp.log(10.0 / z0)
    ushear = jnp.where(bracketed, ushear_root, ushear_fb)
    zo_salt = jnp.where(bracketed, 0.12 * ushear * ushear / (2.0 * G_STD), z0)
    return ushear, zo_salt


def sub_with_height(z, es, u10, zo_salt, eact, F, hsalt, phi_s, ushear):
    """Sublimation rate at height z, kg/m^3/s (sub_with_height:508-551)."""
    rrz = 4.6e-5 * jnp.power(z, -0.258)
    alphaz = 4.08 + 12.6 * z
    mz = (4.0 / 3.0) * jnp.pi * c.ICE_DENSITY * rrz ** 3 \
        * (1.0 + 3.0 / alphaz + 2.0 / (alphaz * alphaz))
    rmean = jnp.power(3.0 * mz / (4.0 * jnp.pi * c.ICE_DENSITY), 1.0 / 3.0)
    terminal_v = 1.1e7 * jnp.power(rmean, 1.8)
    fluct_v = 0.005 * jnp.power(u10, 1.36)
    vtz = terminal_v + 3.0 * fluct_v * jnp.cos(jnp.pi / 4.0)
    re = 2.0 * rmean * vtz / KIN_VIS
    nu = 1.79 + 0.606 * jnp.sqrt(re)
    sigz = (eact / es - 1.0) * (1.019 + 0.027 * jnp.log(z))
    dmdt = 2.0 * jnp.pi * rmean * sigz * nu / F
    psi_t = dmdt / mz
    temp = (0.5 * ushear * ushear) / (u10 * SETTLING)
    phi_t = phi_s * ((temp + 1.0)
                     * jnp.power(z / hsalt, -SETTLING / (c.VON_K * ushear))
                     - temp)
    return psi_t * phi_t


def _sub_flux_one(u10, tair, tsnow, es, eact, air_dens, zrh, z0, fe, F,
                  surf_water, utshear, n_quad: int = 16):
    """Sublimation flux kg/m^2/s for one wind speed (CalcSubFlux, Liston &
    Sturm path with fetch)."""
    ushear, zo_salt = solve_shear(u10, z0, utshear)
    saltating = ushear > utshear

    qsalt = (CSALT * air_dens / G_STD) * (utshear / ushear) \
        * jnp.maximum(ushear * ushear - utshear * utshear, 0.0)
    qsalt = qsalt * (1.0 + (500.0 / (3.0 * fe))
                     * (jnp.exp(-3.0 * fe / 500.0) - 1.0))
    hsalt = 0.08436 * jnp.power(ushear, 1.27)
    particle = utshear * 2.8
    phi_s = qsalt / jnp.maximum(hsalt * particle, 1e-12)
    T = 0.5 * ushear * ushear / (u10 * SETTLING)
    ztop = hsalt * jnp.power(T / (T + 1.0),
                             (c.VON_K * ushear) / (-SETTLING))

    # saltation-layer sublimation: SubFlux = phi_s * psi_s * hsalt with
    # psi_s = sub_with_height(hsalt/2) — reproduced exactly as the reference
    # composes it (CalcSubFlux:700-710)
    psi_s = sub_with_height(hsalt / 2.0, es, u10, zo_salt, eact, F, hsalt,
                            phi_s, ushear)
    sub_salt = phi_s * psi_s * hsalt

    # suspension layer: fixed log-spaced trapezoid of sub_with_height
    lo = jnp.log(jnp.maximum(hsalt, 1e-4))
    hi = jnp.log(jnp.maximum(ztop, jnp.maximum(hsalt, 1e-4) * 1.0001))
    ts = jnp.linspace(0.0, 1.0, n_quad)
    zs = jnp.exp(lo[..., None] + (hi - lo)[..., None] * ts)   # [..., nq]
    fz = sub_with_height(zs, es[..., None], u10[..., None],
                         zo_salt[..., None], eact[..., None], F[..., None],
                         hsalt[..., None], phi_s[..., None],
                         ushear[..., None])
    # integrate f dz = integral f(z(t)) z dlog over t
    integrand = fz * zs
    dt_q = (hi - lo) / (n_quad - 1)
    sub_susp = (integrand[..., :-1] + integrand[..., 1:]).sum(-1) / 2.0 * dt_q

    undersat = eact < es
    subflux = jnp.where(jnp.logical_and(saltating, undersat),
                        sub_salt + sub_susp, 0.0)
    # transport out of the domain (CalcSubFlux:731-739): saltation
    # Qs(fe) (Liston & Sturm eq. 10) + the suspension-layer integral of
    # transport_with_height, divided by the fetch (FETCH=1)
    trans_salt = qsalt * (1.0 - jnp.exp(-3.0 * fe / 500.0))
    uz = ushear[..., None] * jnp.log(zs / jnp.maximum(zo_salt[..., None],
                                                      1e-10)) / c.VON_K
    phi_tz = phi_s[..., None] * (
        (T[..., None] + 1.0)
        * jnp.power(zs / hsalt[..., None],
                    -SETTLING / (c.VON_K * ushear[..., None]))
        - T[..., None])
    tz = uz * phi_tz * zs      # log-space quadrature: f(z(t)) * z
    trans_susp = (tz[..., :-1] + tz[..., 1:]).sum(-1) / 2.0 * dt_q
    transport = jnp.where(saltating, (trans_salt + trans_susp) / fe, 0.0)
    return subflux, transport


def calc_blowing_snow(*, dt_sec, tair, last_snow, surf_water_m, wind_2m,
                      ls, air_dens, pressure, eact, z0_snow, zrh, snowdepth,
                      lag_one, sigma_slope, tsnow, is_bare, fetch,
                      displacement, roughness):
    """Blowing-snow sublimation flux, kg/m^2/s (negative = snowpack mass loss)
    (CalcBlowingSnow:56-250). All inputs broadcastable batch arrays."""
    age_h = jnp.maximum(last_snow * dt_sec / 3600.0, 1e-3)
    es = svp(tair)
    tk = tair + c.KELVIN
    ros = 0.622 * es / (287.0 * tk)
    diffus = 2.06e-5 * jnp.power(tk / 273.0, 1.75)
    F = (ls / (KA_AIR * tk)) * (ls * MW / (R_GAS * tk) - 1.0) \
        + 1.0 / (diffus * ros)

    wind10 = wind_2m * jnp.log(10.0 / z0_snow) / jnp.log((2.0 + z0_snow)
                                                         / z0_snow)
    fe = jnp.where(is_bare, 1500.0, fetch)
    sslope = jnp.where(is_bare, 2.0e-4, sigma_slope)
    ratio = (2.44 - 0.43 * lag_one) * sslope
    sigma_w = wind10 * ratio
    uo = wind10

    hv = 1.5 * displacement
    nd = (4.0 / 3.0) * roughness / jnp.maximum(displacement, 1e-6)
    utshear = get_thresh(tair, surf_water_m, z0_snow)

    area = 1.0 / NUMINCS
    total = jnp.zeros_like(wind10)
    total_transport = jnp.zeros_like(wind10)
    sig_safe = jnp.maximum(sigma_w, 1e-10)
    for p in range(NUMINCS):
        # Laplace-distribution interval bounds (CalcBlowingSnow.c:203-223);
        # the conditional mean selects by lower >= Uo (upper tail, density
        # e^{-(u-Uo)/sigma}) vs upper <= Uo (lower tail, e^{(u-Uo)/sigma})
        # — C's :230-237, NOT by the p index: for every p < NUMINCS/2 the
        # whole interval sits below the median.  (Round-5 fix: the halves
        # were swapped, anti-correlating the blowing flux with the C
        # reference.)
        if p == 0:
            lower = uo - 9999.0
            upper = uo + sigma_w * jnp.log(2.0 * (p + 1) * area)
        elif p < NUMINCS // 2:
            lower = uo + sigma_w * jnp.log(2.0 * p * area)
            upper = uo + sigma_w * jnp.log(2.0 * (p + 1) * area)
        elif p < NUMINCS - 1:
            lower = uo - sigma_w * jnp.log(2.0 - 2.0 * p * area)
            upper = uo - sigma_w * jnp.log(2.0 - 2.0 * (p + 1.0) * area)
        else:
            lower = uo - sigma_w * jnp.log(2.0 - 2.0 * p * area)
            upper = uo + 9999.0
        lower = jnp.minimum(lower, upper)   # C's lower>upper guard (:225)
        # exponent args clamped so the UNselected branch cannot overflow
        # (jnp.where evaluates both); the selected branch's args are <= 0
        e_hi = lambda x: jnp.exp(jnp.minimum(-(x - uo) / sig_safe, 0.0))
        e_lo = lambda x: jnp.exp(jnp.minimum((x - uo) / sig_safe, 0.0))
        u10_hi = -0.5 * ((upper + sigma_w) * e_hi(upper)
                         - (lower + sigma_w) * e_hi(lower)) / area
        u10_lo = 0.5 * ((upper - sigma_w) * e_lo(upper)
                        - (lower - sigma_w) * e_lo(lower)) / area
        u10 = jnp.where(lower >= uo, u10_hi, u10_lo)
        u10 = jnp.clip(u10, 0.4, 25.0)
        uveg = jnp.where(snowdepth < hv,
                         u10 / jnp.sqrt(1.0 + 170.0 * nd
                                        * jnp.maximum(hv - snowdepth, 0.0)),
                         u10)
        prob = get_prob(tair, age_h, surf_water_m, uveg)
        sub, trans = _sub_flux_one(u10, tair, tsnow, es, eact, air_dens, zrh,
                                   z0_snow, fe, F, surf_water_m, utshear)
        total = total + area * sub * prob
        total_transport = total_transport + area * trans * prob

    total = jnp.where(snowdepth > 0.0, total, 0.0)
    total = jnp.maximum(total, -5.0e-5)   # reference floor (CalcBlowingSnow:246)
    return total, jnp.where(snowdepth > 0.0, total_transport, 0.0)
