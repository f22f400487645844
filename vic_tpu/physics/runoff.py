"""Surface runoff, inter-layer drainage, and ARNO baseflow.

Batched TPU re-expression of /root/reference/runoff.c:
- VIC variable-infiltration-capacity curve, Wood et al. 1992 eqs (1),(3a),(3b)
  (runoff.c:773-814 `compute_runoff_and_asat`)
- hourly sub-loop: Brooks–Corey drainage Q12 between layers, saturation
  overflow cascade, ARNO baseflow from the bottom layer (runoff.c:446-700)

The per-column scalar hourly loop becomes a `lax.fori_loop` over the (static)
number of hours, with every step a fused VPU update over the whole
[n_cell, max_hru] batch; the layer loops are unrolled in Python (n_layer is 2
or 3, static).

Water units: mm over the time step (Ksat/Dsmax converted to mm/hour inside).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RunoffResult(NamedTuple):
    moist: jnp.ndarray      # [..., n_layer] total layer moisture (liq+ice), mm
    runoff: jnp.ndarray     # [...] surface runoff, mm/step
    baseflow: jnp.ndarray   # [...] baseflow, mm/step
    asat: jnp.ndarray       # [...] saturated area fraction at end of step
    layer_evap: jnp.ndarray  # [..., n_layer] evap actually taken, mm/step


def compute_runoff_and_asat(moist, max_moist_l, b_infilt, inflow):
    """Wood et al. 1992 runoff from the VIC infiltration curve
    (runoff.c:773-814). moist/max_moist_l: [..., n_layer]; top N-1 layers used.
    Returns (asat, runoff)."""
    top_moist = jnp.minimum(moist[..., :-1].sum(-1), max_moist_l[..., :-1].sum(-1))
    top_max = max_moist_l[..., :-1].sum(-1)
    ex = b_infilt / (1.0 + b_infilt)
    rel = jnp.clip(1.0 - top_moist / jnp.maximum(top_max, 1e-10), 0.0, 1.0)
    asat = 1.0 - jnp.power(rel, ex)
    max_infil = (1.0 + b_infilt) * top_max
    i0 = max_infil * (1.0 - jnp.power(jnp.clip(1.0 - asat, 0.0, 1.0),
                                      1.0 / b_infilt))
    basis = jnp.clip(1.0 - (i0 + inflow) / jnp.maximum(max_infil, 1e-10),
                     0.0, 1.0)
    runoff_3b = (inflow - top_max + top_moist
                 + top_max * jnp.power(basis, 1.0 + b_infilt))
    runoff_3a = inflow - top_max + top_moist
    runoff = jnp.where((i0 + inflow) > max_infil, runoff_3a, runoff_3b)
    runoff = jnp.where(max_infil == 0.0, inflow, runoff)
    runoff = jnp.where(inflow == 0.0, 0.0, runoff)
    return asat, jnp.maximum(runoff, 0.0)


def runoff_step(moist, soil_ice, layer_evap, ppt,
                max_moist_l, resid_fract, depth, ksat, expt,
                b_infilt, ds, dsmax, ws, c_expt, dt_hours: int):
    """One model step of runoff/drainage/baseflow for every HRU lane.

    moist:      [..., n_layer] total moisture (liq+ice) entering the step, mm.
    soil_ice:   [..., n_layer] frozen fraction of moist, mm.
    layer_evap: [..., n_layer] evapotranspiration demand for the step, mm
                (runoff subtracts it hourly, runoff.c:292).
    ppt:        [...] liquid water reaching the soil surface, mm/step.
    ksat (mm/day), dsmax (mm/day) per reference conventions.
    dt_hours: static int (model step in hours).
    """
    n_layer = moist.shape[-1]
    resid_mm = resid_fract * depth * 1000.0       # runoff.c:214
    liq0 = moist - soil_ice
    ice = soil_ice
    evap_hr = layer_evap / dt_hours
    ksat_hr = ksat / 24.0
    dsmax_hr = dsmax / 24.0

    # initial runoff estimate from starting moisture + full-step inflow.
    # With DIST_PRCP the caller runs this kernel once per wet/dry column
    # with the wet inflow already intensified by 1/mu (runoff.c:222-241).
    asat0, runoff0 = compute_runoff_and_asat(moist, max_moist_l, b_infilt,
                                             ppt)
    dt_runoff = runoff0 / dt_hours
    dt_inflow = ppt / dt_hours

    def hour_body(_, carry):
        liq, runoff_acc, baseflow_acc = carry

        # ---- drainage between layers (runoff.c:496-522) ----
        q12 = []
        for l in range(n_layer - 1):
            tmp_liq = jnp.maximum(liq[..., l] - evap_hr[..., l], resid_mm[..., l])
            frac = jnp.clip(
                (tmp_liq - resid_mm[..., l])
                / jnp.maximum(max_moist_l[..., l] - resid_mm[..., l], 1e-10),
                0.0, 1.0)
            q = jnp.where(liq[..., l] > resid_mm[..., l],
                          ksat_hr[..., l] * jnp.power(frac, expt[..., l]), 0.0)
            q12.append(q)

        liq_l = [liq[..., l] for l in range(n_layer)]
        runoff_h = jnp.zeros_like(runoff_acc)

        # ---- update upper layers sequentially (runoff.c:530-612) ----
        inflow = dt_inflow
        for l in range(n_layer - 1):
            dro = dt_runoff if l == 0 else 0.0
            liq_l[l] = liq_l[l] + (inflow - dro) - (q12[l] + evap_hr[..., l])
            # saturation overflow
            excess = jnp.maximum(liq_l[l] + ice[..., l] - max_moist_l[..., l], 0.0)
            liq_l[l] = jnp.minimum(liq_l[l], max_moist_l[..., l] - ice[..., l])
            if l == 0:
                q12[0] = q12[0] + excess
                tmp_inflow = jnp.zeros_like(excess)
            else:
                # cascade excess up; any excess above layer 0 becomes runoff
                tmp_inflow = excess
                for up in range(l - 1, -1, -1):
                    liq_l[up] = liq_l[up] + tmp_inflow
                    over = jnp.maximum(
                        liq_l[up] + ice[..., up] - max_moist_l[..., up], 0.0)
                    liq_l[up] = jnp.minimum(
                        liq_l[up], max_moist_l[..., up] - ice[..., up])
                    tmp_inflow = over
                runoff_h = runoff_h + tmp_inflow
                tmp_inflow = jnp.zeros_like(tmp_inflow)
            # minimum-moisture enforcement (runoff.c:596-601)
            deficit = jnp.minimum(
                liq_l[l] + ice[..., l] - resid_mm[..., l], 0.0)
            q12[l] = q12[l] + deficit
            liq_l[l] = jnp.maximum(liq_l[l], resid_mm[..., l] - ice[..., l])
            inflow = q12[l]

        # ---- ARNO baseflow from bottom layer (runoff.c:615-645) ----
        lb = n_layer - 1
        rel_moist = ((liq_l[lb] - resid_mm[..., lb])
                     / jnp.maximum(max_moist_l[..., lb] - resid_mm[..., lb],
                                   1e-10))
        frac = dsmax_hr * ds / ws
        base = frac * rel_moist
        over_ws = jnp.clip((rel_moist - ws) / jnp.maximum(1.0 - ws, 1e-10),
                           0.0, None)
        base = base + jnp.where(
            rel_moist > ws,
            dsmax_hr * (1.0 - ds / ws) * jnp.power(over_ws, c_expt), 0.0)
        base = jnp.maximum(base, 0.0)

        liq_l[lb] = liq_l[lb] + q12[lb - 1] - (evap_hr[..., lb] + base)

        # bottom-layer bounds (runoff.c:650-700)
        deficit = jnp.minimum(liq_l[lb] + ice[..., lb] - resid_mm[..., lb], 0.0)
        base = base + deficit          # may drive baseflow negative
        liq_l[lb] = jnp.maximum(liq_l[lb], resid_mm[..., lb] - ice[..., lb])

        over = jnp.maximum(liq_l[lb] + ice[..., lb] - max_moist_l[..., lb], 0.0)
        liq_l[lb] = jnp.minimum(liq_l[lb], max_moist_l[..., lb] - ice[..., lb])
        tmp_moist = over
        for up in range(lb - 1, -1, -1):
            liq_l[up] = liq_l[up] + tmp_moist
            over_u = jnp.maximum(
                liq_l[up] + ice[..., up] - max_moist_l[..., up], 0.0)
            liq_l[up] = jnp.minimum(
                liq_l[up], max_moist_l[..., up] - ice[..., up])
            tmp_moist = over_u
        runoff_h = runoff_h + tmp_moist

        liq_new = jnp.stack(liq_l, axis=-1)
        return liq_new, runoff_acc + runoff_h, baseflow_acc + base

    zeros = jnp.zeros(moist.shape[:-1], moist.dtype)
    # unroll=8 measured best on v5e; full unroll regresses ~20% (fusion
    # bloat) and rolled costs ~5% of the whole model step
    liq_f, runoff_extra, baseflow = jax.lax.fori_loop(
        0, dt_hours, hour_body, (liq0, zeros, zeros), unroll=8)

    runoff = runoff0 + runoff_extra

    # negative total baseflow reduces bottom-layer evap (runoff.c:704-707)
    evap_out = layer_evap.at[..., -1].add(jnp.minimum(baseflow, 0.0))
    baseflow = jnp.maximum(baseflow, 0.0)

    moist_f = liq_f + ice
    asat, _ = compute_runoff_and_asat(moist_f, max_moist_l, b_infilt,
                                      jnp.zeros_like(ppt))
    return RunoffResult(moist=moist_f, runoff=runoff, baseflow=baseflow,
                        asat=asat, layer_evap=evap_out)
