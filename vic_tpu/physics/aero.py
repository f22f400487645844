"""Aerodynamic resistance over the four surface cases.

Batched re-expression of /root/reference/CalcAerodynamic.c:7-272: log-profile and
canopy-attenuation wind profiles give per-HRU aerodynamic resistance, adjusted
wind speed, displacement, roughness, and reference height for the reference's
`VegConditions` 4-vector: snow-free surface, canopy (if overstory), snow-covered
surface, glacier surface.

The scalar overstory/no-overstory branch becomes two fully-computed lanes merged
with `jnp.where(overstory, ...)` — every HRU lane gets all four cases each step.
Results are per *unit wind*; the actual wind multiplies/divides at the end
(CalcAerodynamic.c:243-258).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import HUGE_RESIST, VON_K


class SurfaceCases(NamedTuple):
    """One value per surface case, each shaped like the HRU batch."""
    snow_free: jnp.ndarray
    canopy: jnp.ndarray
    snow_covered: jnp.ndarray
    glacier: jnp.ndarray

    def select(self, idx):
        """Gather by case index array (0..3)."""
        stack = jnp.stack([self.snow_free, self.canopy,
                           self.snow_covered, self.glacier])
        return jnp.take_along_axis(stack, idx[None], axis=0)[0]


class AeroResult(NamedTuple):
    resist: SurfaceCases       # s/m (already divided by wind)
    wind: SurfaceCases         # m/s (adjusted)
    displacement: SurfaceCases  # m
    ref_height: SurfaceCases   # m
    roughness: SurfaceCases    # m


def calc_aerodynamic(overstory, height, trunk_ratio, z0_snow, z0_soil,
                     wind_atten, displacement_veg, roughness_veg, ref_height_veg,
                     wind) -> AeroResult:
    """All-lanes aerodynamic properties.

    overstory: bool array; height/trunk_ratio/wind_atten: veg-lib params;
    displacement_veg/roughness_veg: monthly veg values; ref_height_veg: veg
    wind measurement height; wind: measured wind speed (m/s).
    """
    k2 = VON_K * VON_K
    eps = 1e-10

    # ---------------- no-overstory lane (CalcAerodynamic.c:96-132) ----------
    z0_lo = jnp.maximum(roughness_veg, eps)
    d_lo = displacement_veg
    zref = ref_height_veg
    log_2z0 = jnp.log((2.0 + z0_lo) / z0_lo)
    log_ref = jnp.log(jnp.maximum((zref - d_lo) / z0_lo, 1.0 + eps))
    u_sf_no = log_2z0 / log_ref
    ra_sf_no = log_2z0 * log_ref / k2

    z0s = jnp.maximum(z0_snow, eps)
    log_2z0s = jnp.log((2.0 + z0s) / z0s)
    log_refs = jnp.log(jnp.maximum(zref / z0s, 1.0 + eps))
    u_sc_no = log_2z0s / log_refs
    ra_sc_no = log_2z0s * log_refs / k2

    log_refg = jnp.log(jnp.maximum(zref / z0_lo, 1.0 + eps))
    u_gl_no = log_2z0 / log_refg
    ra_gl_no = log_2z0 * log_refg / k2

    # ---------------- overstory lane (CalcAerodynamic.c:137-240) ------------
    z0_up = jnp.maximum(roughness_veg, eps)
    d_up = displacement_veg
    z0_soil_s = jnp.maximum(z0_soil, eps)
    h = jnp.maximum(height, 2.0 * eps)
    zw = 1.5 * h - 0.5 * d_up
    zt = jnp.maximum(trunk_ratio * h, z0_soil_s * (1.0 + eps))
    n = wind_atten

    log_up = jnp.log(jnp.maximum((zref - d_up) / z0_up, 1.0 + eps))
    n_safe = jnp.where(n == 0.0, 1.0, n)
    ra_can = (log_up / k2
              * (h / (n_safe * (zw - d_up))
                 * (jnp.exp(n * (1.0 - (d_up + z0_up) / h)) - 1.0)
                 + (zw - h) / (zw - d_up)
                 + jnp.log(jnp.maximum((zref - d_up) / (zw - d_up), eps))))
    uw = jnp.log(jnp.maximum((zw - d_up) / z0_up, 1.0 + eps)) / log_up
    uh = uw - (1.0 - (h - d_up) / (zw - d_up)) / log_up
    u_can = uh * jnp.exp(n * ((z0_up + d_up) / h - 1.0))
    ut = jnp.maximum(uh * jnp.exp(n * (zt / h - 1.0)), eps)

    log_2zsoil = jnp.log((2.0 + z0_soil_s) / z0_soil_s)
    log_zt = jnp.log(jnp.maximum(zt / z0_soil_s, 1.0 + eps))
    u_sf_ov = ut * log_2zsoil / log_zt
    ra_sf_ov = log_2zsoil * log_zt / (k2 * ut)

    # snow under overstory: 3 cases by canopy geometry
    log_zts = jnp.log(jnp.maximum(zt / z0s, 1.0 + eps))
    u_sc_1 = ut * log_2z0s / log_zts
    ra_sc_1 = log_2z0s * log_zts / (k2 * ut)
    u_sc_2 = uh * jnp.exp(n * ((2.0 + z0s) / h - 1.0))
    ra_sc_2 = (log_zts * log_zts / (k2 * ut)
               + h * log_up / (n_safe * k2 * (zw - d_up))
               * (jnp.exp(n * (1.0 - zt / h))
                  - jnp.exp(n * (1.0 - (z0s + 2.0) / h))))
    u_sc_3 = uh
    ra_sc_3 = (log_zts * log_zts / (k2 * ut)
               + h * log_up / (n_safe * k2 * (zw - d_up))
               * (jnp.exp(n * (1.0 - zt / h)) - 1.0))
    case1 = zt > (2.0 + z0s)
    case2 = h > (2.0 + z0s)
    u_sc_ov = jnp.where(case1, u_sc_1, jnp.where(case2, u_sc_2, u_sc_3))
    ra_sc_ov = jnp.where(case1, ra_sc_1, jnp.where(case2, ra_sc_2, ra_sc_3))

    # ---------------- merge lanes ----------------
    ov = overstory
    u_sf = jnp.where(ov, u_sf_ov, u_sf_no)
    ra_sf = jnp.where(ov, ra_sf_ov, ra_sf_no)
    u_can_m = jnp.where(ov, u_can, u_sf_no)
    ra_can_m = jnp.where(ov, ra_can, ra_sf_no)
    u_sc = jnp.where(ov, u_sc_ov, u_sc_no)
    ra_sc = jnp.where(ov, ra_sc_ov, ra_sc_no)
    u_gl = jnp.where(ov, u_sf_ov, u_gl_no)          # glacier unused w/ overstory
    ra_gl = jnp.where(ov, ra_sf_ov, ra_gl_no)

    disp = SurfaceCases(
        snow_free=jnp.where(ov, jnp.zeros_like(d_lo), d_lo),
        canopy=d_up,
        snow_covered=jnp.zeros_like(d_lo),
        glacier=jnp.zeros_like(d_lo))
    refh = SurfaceCases(
        snow_free=jnp.where(ov, 2.0 + z0_soil_s, zref),
        canopy=zref,
        snow_covered=jnp.where(ov, 2.0 + z0s, 2.0 + z0s),
        glacier=2.0 + jnp.where(ov, z0_soil_s, z0_lo))
    rough = SurfaceCases(
        snow_free=jnp.where(ov, z0_soil_s, z0_lo),
        canopy=z0_up,
        snow_covered=z0s,
        glacier=jnp.where(ov, z0_soil_s, z0_lo))

    # wind scaling (CalcAerodynamic.c:243-258); zero wind -> HUGE_RESIST
    windy = wind > 0.0
    w = jnp.maximum(wind, 1e-10)

    def scale(u, ra):
        return (jnp.where(windy, u * w, 0.0),
                jnp.where(windy, ra / w, HUGE_RESIST))

    u_sf, ra_sf = scale(u_sf, ra_sf)
    u_can_m, ra_can_m = scale(u_can_m, ra_can_m)
    u_sc, ra_sc = scale(u_sc, ra_sc)
    u_gl, ra_gl = scale(u_gl, ra_gl)

    return AeroResult(
        resist=SurfaceCases(ra_sf, ra_can_m, ra_sc, ra_gl),
        wind=SurfaceCases(u_sf, u_can_m, u_sc, u_gl),
        displacement=disp, ref_height=refh, roughness=rough)
