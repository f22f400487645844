"""Canopy-air (atmospheric-exchange) energy balance — CLOSE_ENERGY.

Re-expression of /root/reference/calc_atmos_energy_bal.c:7-167 and
func_atmos_energy_bal.c:9-29 (concept from Sellers et al. 1996 / BATS):
find the canopy air temperature Tcanopy at which the sensible heat carried
from canopy air to the atmospheric mixing level equals the sensible heat
injected into the canopy air by the overstory and the understory:

    InSensible = rho_air * Cp * (Tair - Tcanopy) / Ra_overstory

The reference Brent-solves this residual over [Tair-CANOPY_DT,
Tair+CANOPY_DT] (calc_atmos_energy_bal.c:101-110). The residual is LINEAR in
Tcanopy, so the TPU kernel uses the closed form and reproduces Brent's
behavior exactly: a root outside the +/-CANOPY_DT bracket is a non-convergence
-> TFALLBACK to Tair with the fallback flag raised
(calc_atmos_energy_bal.c:112-121).

The companion canopy vapor-pressure balance (func_atmos_moist_bal.c) is
disabled upstream — the entire VPcanopy solve is commented out and VPcanopy
is bypassed to atmospheric vp (calc_atmos_energy_bal.c:131-160) — so it is a
documented absence here too.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as c


class CanopyAirResult(NamedTuple):
    tcanopy: jnp.ndarray       # canopy air temperature (C)
    fbflag: jnp.ndarray        # bool: fell back to Tair (TFALLBACK)
    sensible: jnp.ndarray      # atmos-level sensible heat at Tcanopy (W/m^2)
    error: jnp.ndarray         # residual InSensible - SensibleHeat (W/m^2)


def calc_atmos_energy_bal(in_sensible, tair, air_dens, ra_over,
                          canopy_dt: float = c.CANOPY_DT) -> CanopyAirResult:
    """Solve the canopy-air energy balance for Tcanopy (batched lanes).

    in_sensible: total sensible heat into the canopy air = overstory canopy
    sensible + understory (soil+snow) sensible (surface_fluxes.c:595-608).
    ra_over: overstory aerodynamic resistance (s/m).
    """
    ra = jnp.maximum(ra_over, 1e-6)
    coef = air_dens * c.CP / ra
    tc = tair - in_sensible / jnp.maximum(coef, 1e-12)
    inside = jnp.abs(tc - tair) <= canopy_dt
    tcanopy = jnp.where(inside, tc, tair)          # TFALLBACK -> Tair
    sensible = coef * (tair - tcanopy)
    return CanopyAirResult(tcanopy=tcanopy, fbflag=~inside,
                           sensible=sensible,
                           error=in_sensible - sensible)
