import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vic_tpu.config import GlobalParams
from vic_tpu.physics.lake import (LakeState, area_from_depth,
                                  depth_from_volume, eddy_diffusivity,
                                  freezing_point, initial_lake_state,
                                  lake_step, make_lake_params,
                                  volume_from_depth, water_density)
from vic_tpu.testing import synthetic_domain


@pytest.fixture(scope="module")
def setup():
    gp = GlobalParams(dt=24)
    dom = synthetic_domain(n_cell=3)
    lp = make_lake_params(dom.soil, gp)
    st = initial_lake_state(lp, dom.soil.avg_temp)
    return gp, dom, lp, st


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


class TestPhysicsPieces:
    def test_water_density_max_at_4c(self):
        t = jnp.array([0.0, 4.0, 10.0, 25.0])
        rho = water_density(t)
        assert float(rho[1]) == max(float(r) for r in rho)

    def test_freezing_point(self):
        assert freezing_point(0.0) == pytest.approx(0.0)

    def test_eddy_positive(self):
        de = eddy_diffusivity(jnp.full((2,), 5.0),
                              jnp.full((2, 10), 10.0),
                              jnp.full((2,), 50.0),
                              jnp.full((2,), 0.5), jnp.full((2,), 0.5),
                              jnp.zeros(2, bool))
        assert bool((de > 0).all())


class TestLakeStep:
    def kwargs(self, dom, warm=True):
        n = 3
        t = 15.0 if warm else -15.0
        return dict(
            tair=jnp.full(n, t), wind=jnp.full(n, 3.0),
            sw_in=jnp.full(n, 250.0 if warm else 30.0),
            lw_in=jnp.full(n, 330.0 if warm else 200.0),
            vp_air=jnp.full(n, 1000.0 if warm else 100.0),
            pressure=jnp.full(n, 90000.0),
            prec_mm=jnp.full(n, 2.0), snowfall_mm=jnp.zeros(n),
            runoff_in_m3=jnp.full(n, 500.0), baseflow_in_m3=jnp.full(n, 100.0),
            lat=jnp.asarray(dom.soil.lat, jnp.float32),
            elevation=jnp.asarray(dom.soil.elevation, jnp.float32),
            ds=jnp.asarray(dom.soil.ds, jnp.float32),
            dsmax=jnp.asarray(dom.soil.dsmax, jnp.float32),
            ws_arno=jnp.asarray(dom.soil.ws, jnp.float32),
            c_arno=jnp.asarray(dom.soil.c_expt, jnp.float32),
            dt_sec=86400.0)

    def test_warm_step_finite_and_conserves(self, setup):
        gp, dom, lp, st = setup
        res = jax.jit(lambda s: lake_step(lp, s, **self.kwargs(dom)))(st)
        assert bool(jnp.isfinite(res.state.volume).all())
        assert bool(jnp.isfinite(res.state.temp).all())
        assert bool((res.state.volume >= 0).all())
        # volume budget: dV = in + P - E - Rout - Bout
        kw = self.kwargs(dom)
        dv = np.asarray(res.state.volume - st.volume)
        expected = (np.asarray(kw["runoff_in_m3"])
                    + np.asarray(kw["baseflow_in_m3"])
                    + 2.0 / 1000.0 * np.asarray(res.sarea)
                    - np.asarray(res.evap_m3)
                    - np.asarray(res.runoff_out_m3)
                    - np.asarray(res.baseflow_out_m3))
        np.testing.assert_allclose(dv, expected, rtol=1e-3, atol=1.0)

    def test_cold_run_forms_ice(self, setup):
        gp, dom, lp, st = setup
        # chill the column near freezing first
        st_cold = LakeState(volume=st.volume,
                            temp=jnp.full_like(st.temp, 0.5),
                            ice_water_eq=st.ice_water_eq,
                            ice_area=st.ice_area,
                            ice_height=st.ice_height, swe=st.swe)
        step = jax.jit(lambda s: lake_step(lp, s, **self.kwargs(dom,
                                                                warm=False)))
        s = st_cold
        for _ in range(20):
            s = step(s).state
        assert float(s.ice_water_eq.max()) > 0.0

    def test_overflow_weir(self, setup):
        gp, dom, lp, st = setup
        full = LakeState(volume=jnp.asarray(lp.maxvolume, jnp.float32) * 0.999,
                         temp=st.temp, ice_water_eq=st.ice_water_eq * 0,
                         ice_area=st.ice_area * 0, ice_height=st.ice_height * 0,
                         swe=st.swe * 0)
        res = jax.jit(lambda s: lake_step(lp, s, **self.kwargs(dom)))(full)
        assert float(res.runoff_out_m3.min()) > 0.0  # weir spills when full

    def test_summer_warms_surface(self, setup):
        gp, dom, lp, st = setup
        cold_start = LakeState(volume=st.volume,
                               temp=jnp.full_like(st.temp, 5.0),
                               ice_water_eq=st.ice_water_eq * 0,
                               ice_area=st.ice_area * 0,
                               ice_height=st.ice_height * 0, swe=st.swe * 0)
        step = jax.jit(lambda s: lake_step(lp, s, **self.kwargs(dom)))
        s = cold_start
        for _ in range(10):
            s = step(s).state
        assert float(s.temp[:, 0].min()) > 5.0
        # stratification: surface warmer than bottom in summer
        assert float((s.temp[:, 0] - s.temp[:, -1]).min()) >= -0.1
