"""Host-side preparation: Domain -> device-ready dense parameter arrays.

Pre-gathers all per-HRU static parameters (veg library rows indexed by each
HRU's veg class, band factors indexed by each HRU's band) into `[n_cell,
max_hru(, ...)]` arrays so the jitted step function contains no host logic and
only one monthly index gather. This replaces the reference's pointer-chasing
through `veg_con -> veg_lib` (full_energy.c:216-354).
"""
from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np

from .params import Domain


def _pytreeify(cls):
    flds = [f.name for f in fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in flds), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytreeify
@dataclass
class DeviceParams:
    """Static per-HRU/per-cell parameters on device. [c,h] = [n_cell, max_hru]."""
    # HRU structure
    mask: jnp.ndarray            # [c,h] bool
    weight: jnp.ndarray          # [c,h] HRU cell share (put_data.c:789 Cv;
    #                              cv*AreaFract for classic replicated tiles)
    cv: jnp.ndarray
    is_glacier: jnp.ndarray
    is_bare: jnp.ndarray
    root: jnp.ndarray            # [c,h,nl]
    # band structure per HRU
    band: jnp.ndarray            # [c,h] int32 elevation band index
    tfactor: jnp.ndarray         # [c,h] additive temperature lapse
    pfactor: jnp.ndarray         # [c,h] precip multiplier
    # blowing-snow veg params (read_vegparam.c:113-116)
    sigma_slope: jnp.ndarray     # [c,h]
    lag_one: jnp.ndarray
    fetch: jnp.ndarray
    # veg (monthly [c,h,12] or static [c,h])
    overstory: jnp.ndarray       # bool
    lai_m: jnp.ndarray           # [c,h,12]
    wdmax_m: jnp.ndarray         # [c,h,12]
    albedo_m: jnp.ndarray        # [c,h,12]
    roughness_m: jnp.ndarray     # [c,h,12]
    displacement_m: jnp.ndarray  # [c,h,12]
    rmin: jnp.ndarray
    rarc: jnp.ndarray
    rgl: jnp.ndarray
    rad_atten: jnp.ndarray
    wind_atten: jnp.ndarray
    trunk_ratio: jnp.ndarray
    wind_h: jnp.ndarray
    veg_height: jnp.ndarray      # from max displacement (calc_veg_params)
    # soil, per cell broadcast to [c,1(,l)] at use
    elevation: jnp.ndarray       # [c]
    lat: jnp.ndarray
    b_infilt: jnp.ndarray
    ds: jnp.ndarray
    dsmax: jnp.ndarray
    ws: jnp.ndarray
    c_expt: jnp.ndarray
    expt: jnp.ndarray            # [c,nl]
    ksat: jnp.ndarray            # [c,nl]
    depth: jnp.ndarray           # [c,nl]
    max_moist: jnp.ndarray       # [c,nl]
    resid_moist: jnp.ndarray     # [c,nl]
    wcr: jnp.ndarray             # [c,nl]
    wpwp: jnp.ndarray            # [c,nl]
    bubble: jnp.ndarray          # [c,nl]
    quartz: jnp.ndarray          # [c,nl]
    organic: jnp.ndarray         # [c,nl]
    bulk_density: jnp.ndarray    # [c,nl]
    soil_density: jnp.ndarray    # [c,nl]
    bulk_dens_min: jnp.ndarray   # [c,nl]
    soil_dens_min: jnp.ndarray   # [c,nl]
    dp: jnp.ndarray              # [c]
    avg_temp: jnp.ndarray        # [c]
    rough: jnp.ndarray           # [c]
    snow_rough: jnp.ndarray      # [c]
    fs_active: jnp.ndarray       # [c] bool
    max_infil: jnp.ndarray       # [c]
    annual_prec: jnp.ndarray     # [c]
    cell_area: jnp.ndarray       # [c]
    # PCIC per-cell snow/rain/glacier params [c]
    new_snow_alb: jnp.ndarray
    snow_alb_accum_a: jnp.ndarray
    snow_alb_accum_b: jnp.ndarray
    snow_alb_thaw_a: jnp.ndarray
    snow_alb_thaw_b: jnp.ndarray
    min_rain_temp: jnp.ndarray
    max_snow_temp: jnp.ndarray
    padj_r: jnp.ndarray
    padj_s: jnp.ndarray
    glac_surf_thick: jnp.ndarray
    glac_surf_we: jnp.ndarray
    glac_kmin: jnp.ndarray
    glac_dk: jnp.ndarray
    glac_a: jnp.ndarray
    glac_albedo: jnp.ndarray
    glac_rough: jnp.ndarray
    depth_full_snow_cover: jnp.ndarray  # [c]
    band_elev: jnp.ndarray       # [c,h] elevation of each HRU's band

    @property
    def n_cell(self):
        return self.mask.shape[0]

    @property
    def max_hru(self):
        return self.mask.shape[1]


def prepare_domain(domain: Domain, gp, dtype=jnp.float32,
                   above_treeline: np.ndarray = None) -> DeviceParams:
    """above_treeline: optional [n_cell, n_band] bool (compute_treeline):
    overstory HRUs in above-treeline bands are excluded from the mosaic and
    remaining weights in those bands are rescaled by the TreeAdjustFactor
    1/(1 - sum(Cv_excluded)) (put_data.c:196-211, read_vegparam.c:301)."""
    hru, soil, lib, bands = domain.hru, domain.soil, domain.veglib, domain.bands
    vi = hru.veg_idx
    ci = np.arange(soil.n_cell)[:, None]

    def gm(a):  # gather monthly [n_class,12] -> [c,h,12]
        return jnp.asarray(a[vi], dtype)

    def gs(a):  # gather static [n_class] -> [c,h]
        return jnp.asarray(a[vi], dtype)

    band_gather = lambda a: jnp.asarray(
        np.take_along_axis(a, hru.band, axis=1), dtype)

    # Cell-aggregation weight of each HRU (put_data.c:789: AreaFactor =
    # Cv * mu * TreeAdjust * lakefactor — NO AreaFract factor; band
    # AreaFract only gates participation, put_data.c:282-289 and
    # full_energy.c:389).  Explicit-bandIndex (PCIC) HRUs carry their full
    # cell share in cv; classic replicated tiles carry cv*AreaFract[band].
    band_af = np.take_along_axis(bands.area_fract, hru.band, axis=1)
    explicit = (hru.band_explicit if hru.band_explicit is not None
                else np.zeros_like(hru.mask))
    weight = hru.cv * np.where(explicit, 1.0, band_af)
    weight = np.where(hru.mask & (band_af > 0.0), weight, 0.0)
    mask = hru.mask & (band_af > 0.0)

    if above_treeline is not None:
        overstory_hru = np.where(hru.is_bare | hru.is_glacier, False,
                                 lib.overstory[vi])
        hru_above = np.take_along_axis(np.asarray(above_treeline), hru.band,
                                       axis=1)
        excluded = overstory_hru & hru_above & mask
        if excluded.any():
            # TreeAdjustFactor per band: 1/(1 - sum Cv_excluded_in_band)
            n_band = bands.area_fract.shape[1]
            for b in range(n_band):
                in_band = (hru.band == b) & mask
                cv_excl = np.where(excluded & in_band, hru.cv, 0.0).sum(1)
                adj = 1.0 / np.maximum(1.0 - cv_excl, 1e-10)
                keep = in_band & ~excluded
                weight = np.where(keep, weight * adj[:, None], weight)
            weight = np.where(excluded, 0.0, weight)
            mask = mask & ~excluded

    # veg height from displacement (calc_veg_params.c: height = displ/0.67)
    displ = lib.displacement[vi]
    veg_height = displ.max(-1) / 0.67

    A = lambda a: jnp.asarray(a, dtype)
    no_veg = hru.is_bare | hru.is_glacier
    lai_m = np.where(no_veg[..., None], 0.0, hru.lai_vegparam)
    wdmax_m = np.where(no_veg[..., None], 0.0, hru.wdmax)

    return DeviceParams(
        mask=jnp.asarray(mask),
        weight=A(weight), cv=A(hru.cv),
        is_glacier=jnp.asarray(hru.is_glacier),
        is_bare=jnp.asarray(hru.is_bare),
        root=A(hru.root),
        band=jnp.asarray(hru.band),
        tfactor=band_gather(bands.tfactor),
        pfactor=band_gather(bands.pfactor),
        sigma_slope=A(hru.sigma_slope), lag_one=A(hru.lag_one),
        fetch=A(hru.fetch),
        overstory=jnp.asarray(np.where(no_veg, False, lib.overstory[vi])),
        lai_m=A(lai_m), wdmax_m=A(wdmax_m),
        albedo_m=gm(lib.albedo), roughness_m=gm(lib.roughness),
        displacement_m=gm(lib.displacement),
        rmin=gs(lib.rmin), rarc=gs(lib.rarc), rgl=gs(lib.rgl),
        rad_atten=gs(lib.rad_atten), wind_atten=gs(lib.wind_atten),
        trunk_ratio=gs(lib.trunk_ratio), wind_h=gs(lib.wind_h),
        veg_height=A(veg_height),
        elevation=A(soil.elevation), lat=A(soil.lat),
        b_infilt=A(soil.b_infilt), ds=A(soil.ds), dsmax=A(soil.dsmax),
        ws=A(soil.ws), c_expt=A(soil.c_expt), expt=A(soil.expt),
        ksat=A(soil.ksat), depth=A(soil.depth), max_moist=A(soil.max_moist),
        resid_moist=A(soil.resid_moist), wcr=A(soil.wcr), wpwp=A(soil.wpwp),
        bubble=A(soil.bubble), quartz=A(soil.quartz), organic=A(soil.organic),
        bulk_density=A(soil.bulk_density), soil_density=A(soil.soil_density),
        bulk_dens_min=A(soil.bulk_density), soil_dens_min=A(soil.soil_density),
        dp=A(soil.dp), avg_temp=A(soil.avg_temp), rough=A(soil.rough),
        snow_rough=A(soil.snow_rough), fs_active=jnp.asarray(soil.fs_active),
        max_infil=A(soil.max_infil), annual_prec=A(soil.annual_prec),
        cell_area=A(soil.cell_area),
        new_snow_alb=A(soil.new_snow_alb),
        snow_alb_accum_a=A(soil.snow_alb_accum_a),
        snow_alb_accum_b=A(soil.snow_alb_accum_b),
        snow_alb_thaw_a=A(soil.snow_alb_thaw_a),
        snow_alb_thaw_b=A(soil.snow_alb_thaw_b),
        min_rain_temp=A(soil.min_rain_temp),
        max_snow_temp=A(soil.max_snow_temp),
        padj_r=A(soil.padj_r), padj_s=A(soil.padj_s),
        glac_surf_thick=A(soil.glac_surf_thick),
        glac_surf_we=A(soil.glac_surf_we),
        glac_kmin=A(soil.glac_kmin), glac_dk=A(soil.glac_dk),
        glac_a=A(soil.glac_a), glac_albedo=A(soil.glac_albedo),
        glac_rough=A(soil.glac_rough),
        depth_full_snow_cover=A(soil.depth_full_snow_cover),
        band_elev=band_gather(bands.band_elev),
    )
