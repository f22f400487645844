import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vic_tpu.config import GlobalParams
from vic_tpu.physics.lake import (LakeState, area_from_depth,
                                  depth_from_volume, eddy_diffusivity,
                                  freezing_point, initial_lake_state,
                                  lake_step, lkdrag, make_grid,
                                  make_lake_params, icerad,
                                  volume_from_depth, water_density)
from vic_tpu.testing import synthetic_domain


def _replace(st: LakeState, **kw) -> LakeState:
    return dataclasses.replace(st, **kw)


@pytest.fixture(scope="module")
def setup():
    gp = GlobalParams(dt=24)
    dom = synthetic_domain(n_cell=3)
    lp = make_lake_params(dom.soil, gp)
    st = initial_lake_state(lp, dom.soil.avg_temp)
    return gp, dom, lp, st


def met_kwargs(dom, n=3, *, tair, sw, lw, vp=400.0, snow_mm=0.0,
               rain_mm=0.0, runoff=500.0, baseflow=100.0):
    return dict(
        tair=jnp.full(n, tair), wind=jnp.full(n, 3.0),
        sw_in=jnp.full(n, sw), lw_in=jnp.full(n, lw),
        vp_air=jnp.full(n, vp), vpd=jnp.full(n, 100.0),
        pressure=jnp.full(n, 95000.0), air_density=jnp.full(n, 1.2),
        rainfall_mm=jnp.full(n, rain_mm), snowfall_mm=jnp.full(n, snow_mm),
        runoff_in_m3=jnp.full(n, runoff), baseflow_in_m3=jnp.full(n, baseflow),
        lat=jnp.asarray(dom.soil.lat, jnp.float32),
        day_in_year=jnp.full(n, 30),
        wind_h=jnp.full(n, 10.0), snow_rough=jnp.full(n, 0.03),
        new_snow_alb=jnp.full(n, 0.85), alb_accum_a=jnp.full(n, 0.94),
        alb_accum_b=jnp.full(n, 0.58), alb_thaw_a=jnp.full(n, 0.82),
        alb_thaw_b=jnp.full(n, 0.46),
        ds=jnp.asarray(dom.soil.ds, jnp.float32),
        dsmax=jnp.asarray(dom.soil.dsmax, jnp.float32),
        ws_arno=jnp.asarray(dom.soil.ws, jnp.float32),
        dt_sec=86400.0)


WARM = dict(tair=15.0, sw=250.0, lw=330.0, vp=1000.0)
COLD = dict(tair=-15.0, sw=30.0, lw=180.0, vp=100.0, snow_mm=2.0)


class TestGeometry:
    def test_volume_depth_roundtrip(self, setup):
        gp, dom, lp, st = setup
        for frac in (0.2, 0.5, 0.9):
            d = jnp.asarray(lp.maxdepth * frac)
            v = volume_from_depth(lp, d)
            d2 = depth_from_volume(lp, v)
            np.testing.assert_allclose(np.asarray(d2), np.asarray(d),
                                       rtol=1e-3)

    def test_area_monotone(self, setup):
        gp, dom, lp, st = setup
        a1 = area_from_depth(lp, jnp.asarray(lp.maxdepth * 0.3))
        a2 = area_from_depth(lp, jnp.asarray(lp.maxdepth * 0.8))
        assert (np.asarray(a2) > np.asarray(a1)).all()

    def test_zero_depth(self, setup):
        gp, dom, lp, st = setup
        z = jnp.zeros(3)
        assert float(area_from_depth(lp, z).max()) == 0.0
        assert float(volume_from_depth(lp, z).max()) == 0.0

    def test_grid_layering(self, setup):
        """Variable activenod layering (water_balance, lakes.eb.c:2225-2262):
        surfdz <= MAX_SURFACE_LAKE, nodes reconstruct the depth."""
        gp, dom, lp, st = setup
        for d in (0.3, 0.9, 5.0, 10.0):
            g = make_grid(lp, jnp.full(3, d))
            nn = int(g.numnod[0])
            assert float(g.surfdz[0]) <= 0.6 + 1e-6
            depth_sum = float(g.surfdz[0]) + (nn - 1) * float(g.dz[0])
            assert depth_sum == pytest.approx(d, rel=1e-5)
            # areas decrease with node index over active range
            s = np.asarray(g.surface[0, :nn + 1])
            assert (np.diff(s) <= 1e-6).all()


class TestPhysicsPieces:
    def test_water_density_max_at_4c(self):
        t = jnp.array([0.0, 4.0, 10.0, 25.0])
        rho = water_density(t)
        assert float(rho[1]) == max(float(r) for r in rho)

    def test_freezing_point(self):
        assert freezing_point(0.0) == pytest.approx(0.0)

    def test_eddy_positive(self, setup):
        gp, dom, lp, st = setup
        g = make_grid(lp, jnp.full(3, 5.0))
        de = eddy_diffusivity(jnp.ones(3, bool), jnp.full(3, 5.0),
                              jnp.full((3, st.temp.shape[-1]), 10.0),
                              jnp.full(3, 50.0), g)
        assert bool((de > 0).all())

    def test_lkdrag_stability(self):
        """Unstable (warm surface) drag exceeds stable drag
        (lkdrag, lakes.eb.c:1263-1320)."""
        warm = float(lkdrag(jnp.array([285.0]), jnp.array([275.0]),
                            jnp.array([3.0]), 0.0045, 10.0)[0])
        cold = float(lkdrag(jnp.array([270.0]), jnp.array([280.0]),
                            jnp.array([3.0]), 0.0045, 10.0)[0])
        assert warm > cold > 0.0

    def test_icerad_partition(self):
        """Patterson & Hamblin: a thicker snow+ice slab absorbs more SW
        within it (icerad's SW_under_ice is the absorbed qf-qo,
        lakes.eb.c:1138-1147), and the combined thermal resistance
        avgcond grows with thickness."""
        rthin, _, thin = icerad(jnp.array([100.0]), jnp.array([0.1]),
                                jnp.array([0.0]))
        rthick, _, thick = icerad(jnp.array([100.0]), jnp.array([1.0]),
                                  jnp.array([0.5]))
        assert 0.0 <= float(thin[0]) < float(thick[0]) <= 100.0
        assert float(rthick[0]) > float(rthin[0]) > 0.0


class TestLakeStep:
    def test_warm_step_finite_and_conserves(self, setup):
        gp, dom, lp, st = setup
        kw = met_kwargs(dom, **WARM)
        res = jax.jit(lambda s: lake_step(lp, s, **kw))(st)
        assert bool(jnp.isfinite(res.state.volume).all())
        assert bool(jnp.isfinite(res.state.temp).all())
        assert bool((res.state.volume >= 0).all())
        # the step's own closure telemetry must be tight
        assert float(jnp.abs(res.water_error_mm).max()) < 1e-2
        assert float(jnp.abs(res.energy_error).max()) < 2.0

    def test_overflow_weir(self, setup):
        gp, dom, lp, st = setup
        full = _replace(st,
                        volume=jnp.asarray(lp.maxvolume, jnp.float32) * 0.999)
        kw = met_kwargs(dom, **WARM)
        res = jax.jit(lambda s: lake_step(lp, s, **kw))(full)
        assert float(res.runoff_out_m3.min()) > 0.0  # weir spills when full

    def test_summer_warms_surface(self, setup):
        gp, dom, lp, st = setup
        cold_start = _replace(st, temp=jnp.full_like(st.temp, 5.0))
        kw = met_kwargs(dom, **WARM)
        step = jax.jit(lambda s: lake_step(lp, s, **kw).state)
        s = cold_start
        for _ in range(10):
            s = step(s)
        assert float(s.temp[:, 0].min()) > 5.0
        # stratification: surface warmer than bottom in summer
        assert float((s.temp[:, 0] - s.temp[:, -1]).min()) >= -0.1


class TestSeasonalIceCycle:
    """Freeze-over -> snow-on-ice -> ice-out, with the lake water budget
    residual gated at <=1e-2 mm every step (VERDICT round-1 item 2)."""

    def test_freeze_snow_melt_cycle(self, setup):
        gp, dom, lp, st = setup
        kw_cold = met_kwargs(dom, **COLD)
        kw_warm = met_kwargs(dom, tair=12.0, sw=280.0, lw=360.0, vp=1000.0)
        step_c = jax.jit(lambda s: lake_step(lp, s, **kw_cold))
        step_w = jax.jit(lambda s: lake_step(lp, s, **kw_warm))

        s = st
        max_err = 0.0
        for _ in range(30):
            r = step_c(s)
            s = r.state
            max_err = max(max_err, float(jnp.abs(r.water_error_mm).max()))
        # full freeze-over with a real snowpack riding on the ice
        assert float(r.ice_fract.min()) > 0.9
        assert float(s.ice_height.min()) > 0.05
        assert float(s.swe.min()) > 0.01
        assert float(s.ice_water_eq.min()) > 0.0
        # ice surface temperature is a real sub-freezing slab temperature
        assert float(s.tempi.max()) < 0.0

        ice_out = False
        for _ in range(60):
            r = step_w(s)
            s = r.state
            max_err = max(max_err, float(jnp.abs(r.water_error_mm).max()))
            if float(r.ice_fract.max()) == 0.0 and float(s.swe.max()) == 0.0:
                ice_out = True
                break
        assert ice_out, "lake never lost its ice under warm forcing"
        assert float(s.ice_water_eq.max()) == 0.0
        assert max_err <= 1e-2, f"lake water residual {max_err} mm"

    def test_snow_albedo_state_evolves(self, setup):
        gp, dom, lp, st = setup
        kw = met_kwargs(dom, **COLD)
        step = jax.jit(lambda s: lake_step(lp, s, **kw))
        s = st
        for _ in range(15):
            s = step(s).state
        # fresh snowfall every step pins last_snow at 1 and albedo high
        assert float(s.last_snow.max()) == 1.0
        assert float(s.salbedo.min()) > 0.7

    def test_lakeice_bottom_melt_and_freeze(self):
        """lakeice (lakes.eb.c:1153): energy_ice_melt_bot = qf - qw; a large
        under-ice water flux melts the pack bottom, a cold conductive slab
        grows it, and growth is capped by the available liquid."""
        from vic_tpu.physics.lake import lakeice
        one = jnp.ones(1)
        # melt: water delivers 60 W/m2, slab conducts little away
        melt = lakeice(sw_ice=20.0 * one, fracprv=one, dt_sec=86400.0,
                       snowflux=5.0 * one, qw=60.0 * one,
                       sw_absorbed=10.0 * one, ice_water_eq=1000.0 * one,
                       volume=5000.0 * one, sarea=100.0 * one)
        assert float(melt.energy_ice_melt_bot[0]) < 0.0
        assert float(melt.ice_water_eq[0]) < 1000.0
        # freeze: strong conduction, no under-ice supply
        frz = lakeice(sw_ice=5.0 * one, fracprv=one, dt_sec=86400.0,
                      snowflux=60.0 * one, qw=2.0 * one,
                      sw_absorbed=1.0 * one, ice_water_eq=1000.0 * one,
                      volume=5000.0 * one, sarea=100.0 * one)
        assert float(frz.energy_ice_melt_bot[0]) > 0.0
        assert float(frz.ice_water_eq[0]) > 1000.0
        # freezing never exceeds the available liquid
        cap = lakeice(sw_ice=5.0 * one, fracprv=one, dt_sec=86400.0,
                      snowflux=500.0 * one, qw=0.0 * one,
                      sw_absorbed=0.0 * one, ice_water_eq=1000.0 * one,
                      volume=1000.5 * one, sarea=100.0 * one)
        assert float(cap.ice_water_eq[0]) <= 1000.5 + 1e-3
