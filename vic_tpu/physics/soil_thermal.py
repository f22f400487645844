"""Soil thermal properties and the quick-flux ground heat formulation.

Batched re-expression of:
- soil_conductivity / volumetric_heat_capacity / maximum_unfrozen_water
  — /root/reference/soil_conduction.c:7-889 (Johansen conductivity, component
    heat capacities, unfrozen-water maximum from the Brooks–Corey retention)
- estimate_T1 — /root/reference/estimate_T1.c:8-45 (Liang et al. 1999 3-layer
  quick-flux ground heat formulation)
- quick-flux node geometry — initialize_model_state.c:505-514:
  Zsum_node = [0, depth0, dp], so D1 = depth0, D2 = dp - depth0.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import LF


def soil_conductivity(moist, wu, soil_dens_min, bulk_dens_min, quartz,
                      soil_density, bulk_density, organic):
    """Johansen soil thermal conductivity, W/m/K (soil_conduction.c).
    moist/wu in mm/mm (volumetric); wu = liquid fraction."""
    ki, kw = 2.2, 0.57
    kdry_org, ks_org = 0.05, 0.25
    kdry_min = (0.135 * bulk_dens_min + 64.7) / (
        soil_dens_min - 0.947 * bulk_dens_min)
    kdry = (1.0 - organic) * kdry_min + organic * kdry_org

    porosity = 1.0 - bulk_density / soil_density
    sr = jnp.clip(moist / jnp.maximum(porosity, 1e-10), 1e-10, None)
    ks_min = jnp.where(quartz < 0.2,
                       jnp.power(7.7, quartz) * jnp.power(3.0, 1.0 - quartz),
                       jnp.power(7.7, quartz) * jnp.power(2.2, 1.0 - quartz))
    ks = (1.0 - organic) * ks_min + organic * ks_org

    unfrozen = wu == moist
    ksat_u = jnp.power(ks, 1.0 - porosity) * jnp.power(kw, porosity)
    ke_u = 0.7 * jnp.log10(sr) + 1.0
    ksat_f = (jnp.power(ks, 1.0 - porosity)
              * jnp.power(ki, jnp.maximum(porosity - wu, 0.0))
              * jnp.power(kw, wu))
    ke_f = sr
    ksat = jnp.where(unfrozen, ksat_u, ksat_f)
    ke = jnp.where(unfrozen, ke_u, ke_f)
    k = jnp.maximum((ksat - kdry) * ke + kdry, kdry)
    return jnp.where(moist > 0.0, k, kdry)


def volumetric_heat_capacity(soil_fract, water_fract, ice_fract, organic_fract):
    """J/m^3/K (soil_conduction.c:volumetric_heat_capacity)."""
    cs = 2.0e6 * soil_fract * (1.0 - organic_fract)
    cs = cs + 2.7e6 * soil_fract * organic_fract
    cs = cs + 4.2e6 * water_fract
    cs = cs + 1.9e6 * ice_fract
    cs = cs + 1.3e3 * (1.0 - (soil_fract + water_fract + ice_fract))
    return cs


def maximum_unfrozen_water(t, max_moist, bubble, expt):
    """Maximum liquid water at temperature t (C); units follow max_moist
    (soil_conduction.c:maximum_unfrozen_water, Zhang et al. 2007 form)."""
    arg = (-LF * jnp.minimum(t, -1e-10)) / 273.16 / (9.81 * bubble / 100.0)
    unfrozen = max_moist * jnp.power(jnp.maximum(arg, 1e-30),
                                     -(2.0 / (expt - 3.0)))
    unfrozen = jnp.clip(unfrozen, 0.0, max_moist)
    return jnp.where(t <= 0.0, unfrozen, max_moist)


def layer_thermal_props(moist_mm, ice_mm, depth, soil_dens_min, bulk_dens_min,
                        quartz, soil_density, bulk_density, organic):
    """kappa (W/m/K) and Cs (J/m^3/K) per soil layer
    (soil_conduction.c:compute_soil_layer_thermal_properties).
    moist_mm/ice_mm: [..., n_layer] in mm; depth in m."""
    moist = moist_mm / depth / 1000.0
    ice = ice_mm / depth / 1000.0
    kappa = soil_conductivity(moist, moist - ice, soil_dens_min, bulk_dens_min,
                              quartz, soil_density, bulk_density, organic)
    cs = volumetric_heat_capacity(bulk_density / soil_density,
                                  moist - ice, ice, organic)
    return kappa, cs


def estimate_t1(ts, t1_old, t2, d1, d2, kappa1, kappa2, cs1, cs2, dp, delta_t):
    """Liang et al. 1999 between-layer temperature estimate (estimate_T1.c)."""
    c1 = cs2 * dp / d2 * (1.0 - jnp.exp(-d2 / dp))
    c2 = -(1.0 - jnp.exp(d1 / dp)) * jnp.exp(-d2 / dp)
    c3 = kappa1 / d1 - kappa2 / d1 + kappa2 / d1 * jnp.exp(-d1 / dp)
    t1 = ((kappa1 / 2.0 / d1 / d2 * ts + c1 / delta_t * t1_old
           + (2.0 * c2 - 1.0 + jnp.exp(-d1 / dp)) * kappa2 / 2.0 / d1 / d2 * t2)
          / (c1 / delta_t + kappa2 / d1 / d2 * c2 + c3 / 2.0 / d2))
    return t1
