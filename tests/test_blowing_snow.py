import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vic_tpu.config import GlobalParams
from vic_tpu.model import make_forcing_stack, run
from vic_tpu.physics.blowing_snow import (calc_blowing_snow, get_prob,
                                          get_thresh, solve_shear)
from vic_tpu.prepare import prepare_domain
from vic_tpu.state import initial_state
from vic_tpu.testing import synthetic_domain, synthetic_forcing
from vic_tpu.timeaxis import make_time_axis


class TestPieces:
    def test_prob_increases_with_wind(self):
        p_lo = get_prob(jnp.array(-10.0), jnp.array(24.0), jnp.array(0.0),
                        jnp.array(5.0))
        p_hi = get_prob(jnp.array(-10.0), jnp.array(24.0), jnp.array(0.0),
                        jnp.array(20.0))
        assert float(p_hi) > float(p_lo)
        assert 0.0 <= float(p_lo) <= 1.0

    def test_wet_snow_harder_to_blow(self):
        dry = get_prob(jnp.array(-5.0), jnp.array(24.0), jnp.array(0.0),
                       jnp.array(12.0))
        wet = get_prob(jnp.array(-5.0), jnp.array(24.0), jnp.array(0.01),
                       jnp.array(12.0))
        assert float(dry) > float(wet)

    def test_threshold_positive(self):
        ut = get_thresh(jnp.array(-10.0), jnp.array(0.0), jnp.array(0.0005))
        assert 0.1 < float(ut) < 1.0

    def test_shear_solution(self):
        u10 = jnp.array([15.0])
        ut = get_thresh(jnp.array([-10.0]), jnp.array([0.0]),
                        jnp.array([0.0005]))
        ushear, zo = solve_shear(u10, jnp.array([0.0005]), ut)
        assert float(ushear[0]) > float(ut[0])  # strong wind saltates
        assert float(zo[0]) > 0

    def test_flux_zero_without_snow(self):
        n = 2
        f, t = calc_blowing_snow(
            dt_sec=86400.0, tair=jnp.full(n, -10.0),
            last_snow=jnp.full(n, 1.0), surf_water_m=jnp.zeros(n),
            wind_2m=jnp.full(n, 10.0), ls=jnp.full(n, 2.838e6),
            air_dens=jnp.full(n, 1.2), pressure=jnp.full(n, 90000.0),
            eact=jnp.full(n, 100.0), z0_snow=jnp.full(n, 0.0005),
            zrh=2.0, snowdepth=jnp.zeros(n), lag_one=jnp.full(n, 0.95),
            sigma_slope=jnp.full(n, 0.005), tsnow=jnp.full(n, -10.0),
            is_bare=jnp.zeros(n, bool), fetch=jnp.full(n, 2500.0),
            displacement=jnp.full(n, 0.2), roughness=jnp.full(n, 0.03))
        np.testing.assert_allclose(np.asarray(f), 0.0)

    def test_flux_negative_when_windy_dry(self):
        """Strong wind over dry cold snow with subsaturated air: mass loss."""
        n = 2
        f, t = calc_blowing_snow(
            dt_sec=86400.0, tair=jnp.full(n, -15.0),
            last_snow=jnp.full(n, 1.0), surf_water_m=jnp.zeros(n),
            wind_2m=jnp.full(n, 15.0), ls=jnp.full(n, 2.838e6),
            air_dens=jnp.full(n, 1.2), pressure=jnp.full(n, 90000.0),
            eact=jnp.full(n, 50.0),     # very dry air
            z0_snow=jnp.full(n, 0.0005), zrh=2.0,
            snowdepth=jnp.full(n, 0.5), lag_one=jnp.full(n, 0.95),
            sigma_slope=jnp.full(n, 0.005), tsnow=jnp.full(n, -15.0),
            is_bare=jnp.zeros(n, bool), fetch=jnp.full(n, 2500.0),
            displacement=jnp.full(n, 0.2), roughness=jnp.full(n, 0.03))
        assert bool(jnp.isfinite(f).all())
        assert float(f.max()) <= 0.0       # sublimation = loss
        assert float(f.min()) >= -5.0e-5   # reference floor


class TestBlowingRun:
    def test_model_with_blowing(self):
        gp = GlobalParams(dt=24, startyear=1995, nrecs=30, full_energy=True,
                          blowing=True)
        dom = synthetic_domain(n_cell=3)
        params = prepare_domain(dom, gp)
        ax = make_time_axis(1995, 1, 1, 0, 30, 24)
        forc = synthetic_forcing(30, 3)
        forc["wind"] += 8.0  # windy winter
        stack = make_forcing_stack(forc, ax)
        st = initial_state(dom, gp)
        fs, outs = jax.jit(lambda s, f: run(s, f, params, gp))(st, stack)
        assert bool(jnp.isfinite(outs["OUT_SWE"]).all())
        assert "OUT_SUB_BLOWING" in outs
        assert bool(jnp.isfinite(outs["OUT_SUB_BLOWING"]).all())
        assert float(jnp.abs(outs["OUT_WATER_ERROR"]).max()) < 0.01
