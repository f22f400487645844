"""Distributed-precipitation (DIST_PRCP) wet/dry moisture bookkeeping.

The reference carries TWO soil-moisture columns per HRU — `cell[WET]` and
`cell[DRY]` (/root/reference/vicNl_def.h:1374-1388) — plus wet/dry canopy
storage `veg_var[WET/DRY].Wdew`. Precipitation falls only on the wet fraction
`mu = 1 - exp(-PREC_EXPT * P)` at intensity `P / mu`
(/root/reference/dist_prec.c:82, surface_fluxes.c:420); cell values are the
mu-weighted average of the two columns (put_data.c:282-330).

Two mass-conserving transfers move water between the columns when mu changes:

- **storm onset** (`initialize_new_storm.c:101-125`): both columns are set to
  the old-weighted average, `wet = dry = mu_old*wet + (1-mu_old)*dry`;
- **intensity change mid-storm** (`redistribute_during_storm.c:140-167`,
  `redistribute_moisture_for_storm`): the grown side absorbs the shrinking
  side's share so that `mu_new*wet' + (1-mu_new)*dry' ==
  mu_old*wet + (1-mu_old)*dry`, clamped to the layer maximum.

Here both transforms are branch-free batched updates applied to the stacked
wet/dry lanes under a boolean mask.
"""
from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-12


def average_for_storm(wet, dry, mu_old):
    """Storm-onset averaging (initialize_new_storm.c:101-125): both columns
    take the total `mu_old*wet + (1-mu_old)*dry`."""
    avg = mu_old * wet + (1.0 - mu_old) * dry
    return avg, avg


def redistribute_for_storm(wet, dry, max_val, mu_old, mu_new):
    """Mid-storm redistribution (redistribute_during_storm.c:140-167).

    Shrinking wet fraction (mu_old > mu_new): the dry column absorbs the
    ceded wet share; growing wet fraction: the wet column absorbs part of the
    dry column. Degenerate mu (0 or 1) collapses both to the average.
    Values are clamped to `max_val` afterwards (the reference flags — but
    proceeds with — the clamped value; mass error is reported upstream via
    the closure telemetry).
    """
    interior = jnp.logical_and((1.0 - mu_new) > _SMALL, mu_new > _SMALL)
    shrink = jnp.logical_and(mu_old > mu_new, interior)
    grow = jnp.logical_and(~shrink, interior)

    dry_shrunk = ((mu_old - mu_new) * wet + (1.0 - mu_old) * dry) \
        / jnp.maximum(1.0 - mu_new, _SMALL)
    wet_grown = ((mu_new - mu_old) * dry + mu_old * wet) \
        / jnp.maximum(mu_new, _SMALL)
    avg = (1.0 - mu_old) * dry + mu_old * wet

    new_wet = jnp.where(shrink, wet, jnp.where(grow, wet_grown, avg))
    new_dry = jnp.where(shrink, dry_shrunk, jnp.where(grow, dry, avg))
    return jnp.minimum(new_wet, max_val), jnp.minimum(new_dry, max_val)


def storm_transfer(wet, dry, max_val, mu_old, mu_new, avg_mask, redist_mask):
    """Apply the two storm moisture transfers under their masks.

    wet/dry: [..., *extra] lanes; mu_old/mu_new/avg_mask/redist_mask
    broadcastable to them. Returns the updated (wet, dry) pair.
    """
    a_wet, a_dry = average_for_storm(wet, dry, mu_old)
    r_wet, r_dry = redistribute_for_storm(wet, dry, max_val, mu_old, mu_new)
    new_wet = jnp.where(avg_mask, a_wet, jnp.where(redist_mask, r_wet, wet))
    new_dry = jnp.where(avg_mask, a_dry, jnp.where(redist_mask, r_dry, dry))
    return new_wet, new_dry
