"""SPATIAL_SNOW: depletion-curve partial coverage (calc_snow_coverage.c) and
advected sensible heat to snow patches (advected_sensible_heat.c)."""
import jax
import jax.numpy as jnp
import numpy as np

from vic_tpu.config import GlobalParams
from vic_tpu.model import make_forcing_stack, make_step, run
from vic_tpu.physics.snow import advected_sensible_heat, calc_snow_coverage
from vic_tpu.prepare import prepare_domain
from vic_tpu.state import initial_state
from vic_tpu.testing import synthetic_domain, synthetic_forcing
from vic_tpu.timeaxis import make_time_axis


class TestCalcSnowCoverage:
    """Unit tests of the masked state machine vs the reference's branch tree
    (calc_snow_coverage.c:44-150). Scalars via 1-element arrays; all m."""

    def _call(self, **kw):
        base = dict(store_snow=False, dfsc=0.10, old_coverage=1.0,
                    swq=0.05, old_swq=0.05, depth=0.2, old_depth=0.2,
                    melt_m=0.0, max_swq=0.0, snowfall_mm=0.0,
                    store_swq=0.0, swq_slope=0.0, store_coverage=1.0)
        base.update(kw)
        arr = {k: jnp.asarray([v], jnp.float32) if not isinstance(v, bool)
               else jnp.asarray([v]) for k, v in base.items()}
        r = calc_snow_coverage(**arr)
        return jax.tree_util.tree_map(lambda a: float(np.asarray(a)[0]), r)

    def test_accumulation_full_cover(self):
        r = self._call(snowfall_mm=5.0, old_coverage=0.4, depth=0.01,
                       swq=0.055, old_swq=0.050)
        assert r.coverage == 1.0          # fresh snow covers everything
        assert r.store_snow == 1.0        # distribution memory retained
        assert r.store_swq > 0.0

    def test_deep_accumulation_erases_memory(self):
        r = self._call(snowfall_mm=5.0, store_snow=True, store_swq=0.01,
                       depth=0.06, dfsc=0.10)  # depth >= dfsc/2
        assert r.coverage == 1.0
        assert r.store_snow == 0.0
        assert r.store_swq == 0.0
        assert r.swq_slope == 0.0
        assert r.store_coverage == 1.0

    def test_melt_reduces_coverage_along_slope(self):
        # deep old pack: slope anchored at -dfsc; coverage = 2*depth/dfsc
        r = self._call(melt_m=0.01, old_depth=0.2, depth=0.03, dfsc=0.10,
                       swq=0.01, old_swq=0.02)
        assert abs(r.coverage - min(2 * 0.03 / 0.10, 1.0)) < 1e-6
        assert abs(r.swq_slope - (-0.10)) < 1e-6
        assert abs(r.max_swq - 2 * 0.03) < 1e-6

    def test_melting_thin_new_snow_restores_buried_coverage(self):
        # stored new snow melts off: buried coverage must come back
        r = self._call(melt_m=0.005, store_swq=0.004, swq=0.040,
                       old_swq=0.050, store_coverage=0.35,
                       old_coverage=1.0, swq_slope=-0.10,
                       max_swq=0.3, depth=0.15, old_depth=0.16)
        # store cleared (0.004 - 0.010 <= 0); coverage derived from the
        # restored distribution: max_swq=2*depth vs old max -> reduction
        assert r.store_swq == 0.0
        assert r.store_coverage == 1.0
        assert r.coverage <= 1.0

    def test_rain_on_melting_pack_keeps_coverage(self):
        # swq rose (rain absorbed), melt_m>0: coverage unchanged
        r = self._call(melt_m=0.001, swq=0.06, old_swq=0.05,
                       depth=0.25, old_depth=0.2, dfsc=0.1,
                       swq_slope=-0.1, max_swq=0.3, old_coverage=0.8)
        assert abs(r.coverage - 0.8) < 1e-6

    def test_no_change_branch(self):
        r = self._call(old_coverage=0.55)
        assert abs(r.coverage - 0.55) < 1e-6


class TestAdvectedSensible:
    def test_marsh_fs_piecewise(self):
        cov = jnp.asarray([0.1, 0.3, 0.55, 0.8])
        q = advected_sensible_heat(cov, 1.2, 5.0, 0.0, 50.0)
        q = np.asarray(q)
        assert (q > 0.0).all()            # warm air over cold ground
        # Fs: 0.01 / 10^(5.6667*0.3-3.1333) / 10^(3*0.55-1.8) / 1.0
        qbare = 1.2 * 1004.0 * 5.0 / 50.0  # with Cp from constants ~1004
        assert q[3] < qbare                # (1-cov)/cov damping at 0.8

    def test_zero_when_fully_covered_or_bare(self):
        q = advected_sensible_heat(jnp.asarray([0.0]), 1.2, 5.0, 0.0, 50.0)
        assert float(q[0]) == 0.0


def _build(n_rec=120, n_cell=4, **kw):
    gp = GlobalParams(dt=24, snow_step=24, nlayer=3, startyear=1994,
                      startmonth=10, startday=1, nrecs=n_rec,
                      full_energy=True, spatial_snow=True, **kw)
    domain = synthetic_domain(n_cell=n_cell)
    params = prepare_domain(domain, gp)
    ax = make_time_axis(1994, 10, 1, 0, n_rec, 24)
    forc = synthetic_forcing(n_rec, n_cell, start_doy=274)
    stack = make_forcing_stack(forc, ax)
    state = initial_state(domain, gp)
    return gp, params, stack, state


class TestSpatialSnowModel:
    def test_seasonal_hysteresis_and_adv_sens(self):
        """Oct->Jan run: accumulate -> partial melt -> re-cover; coverage must
        leave {0,1}, OUT_ADV_SENS must be nonzero under partial cover, and
        water closure must hold."""
        gp, params, stack, state = _build()
        _, outs = jax.jit(lambda s, f: run(s, f, params, gp))(state, stack)
        cov = np.asarray(outs["OUT_SNOW_COVER"])
        assert np.isfinite(cov).all()
        assert cov.max() > 0.9            # full cover happens
        partial = (cov > 0.02) & (cov < 0.9)
        assert partial.any(), "no partial coverage ever produced"
        adv = np.asarray(outs["OUT_ADV_SENS"])
        assert np.abs(adv[partial]).max() > 0.0
        assert np.abs(np.asarray(outs["OUT_WATER_ERROR"])).max() <= 1e-2

    def test_recover_after_melt(self):
        """Fresh snowfall over a partially melted pack restores full cover
        (hysteresis: re-cover, not linear-depth response)."""
        gp, params, stack, state = _build(n_rec=60)
        final, outs = jax.jit(lambda s, f: run(s, f, params, gp))(state,
                                                                  stack)
        cov = np.asarray(outs["OUT_SNOW_COVER"])
        snowf = np.asarray(outs["OUT_SNOWF"])
        # find a step where partial cover is followed by snowfall
        hit = False
        for t in range(1, len(cov)):
            m = (cov[t - 1] > 0.02) & (cov[t - 1] < 0.85) & (snowf[t] > 1.0)
            if m.any():
                assert (cov[t][m] > cov[t - 1][m] - 1e-6).all()
                hit = True
        assert hit, "no partial-cover->snowfall transition in the run"
