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


def test_golden_replay_against_c_trace():
    """Four CalcBlowingSnow calls traced from the instrumented C binary
    (blowing oracle scenario, round 5) replayed through calc_blowing_snow.
    Pins the Laplace conditional-mean branch selection (C selects by
    lower >= Uo / upper <= Uo, CalcBlowingSnow.c:230-237 — NOT by the
    p index; round-5 fix) and the fetch-normalized saltation+suspension
    transport (CalcSubFlux:731-739). Full 1,360-call replay: flux r=0.999,
    transport r=0.997; residue is the fixed log-trapezoid quadrature vs
    the reference's adaptive Romberg."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vic_tpu.physics.blowing_snow import calc_blowing_snow

    # columns: Dt(h) Tair LastSnow SurfWater Wind Ls AirDens Press EactAir
    #          ZO Zrh snowdepth lag_one sigma_slope Tsnow isBare fe disp rough
    IN = np.array([
        [3.0, -6.8024, 2, 0.0, 4.270211179, 2841189.91, 1.249317108,
         95500.0, 232.9, 0.0012, 2.0012, 0.08672765232, 0.8999999762, 1.0,
         -22.95073692, 0, 2000.0, 0.3, 0.05],
        [3.0, 4.8308, 13, 0.0, 1.462055485, 2835101.533, 1.197034519,
         95500.0, 548.5, 0.0012, 2.0012, 0.4442905796, 0.8999999762, 1.0,
         -2.176682735, 0, 2000.0, 0.3, 0.05],
        [3.0, -5.8216, 0, 0.0, 6.031728762, 2841002.687, 1.244733493,
         95500.0, 215.0, 0.0012, 2.0012, 0.2213331431, 0.8999999762, 1.0,
         -22.31191621, 0, 2000.0, 0.3, 0.05],
        [3.0, -8.9738, 0, 0.0, 4.660892522, 2840084.814, 1.259585887,
         95500.0, 144.6, 0.0012, 2.0012, 0.04553707334, 0.8999999762, 1.0,
         -19.18005409, 1, 2000.0, 0.05422764228, 0.01],
    ])
    REF_FLUX = np.array([-5e-05, -5.765686753e-07, -5e-05, 0.0])
    REF_TRANS = np.array([2.620188773e-05, 1.100971098e-07,
                          0.0005068262193, 0.0])

    B = lambda i: jnp.asarray(IN[:, i], jnp.float64)
    with jax.enable_x64(True):
        flux, trans = calc_blowing_snow(
            dt_sec=B(0) * 3600.0, tair=B(1), last_snow=B(2),
            surf_water_m=B(3), wind_2m=B(4), ls=B(5), air_dens=B(6),
            pressure=B(7), eact=B(8), z0_snow=B(9), zrh=B(10),
            snowdepth=B(11), lag_one=B(12), sigma_slope=B(13), tsnow=B(14),
            is_bare=B(15).astype(bool), fetch=B(16), displacement=B(17),
            roughness=B(18))
    np.testing.assert_allclose(np.asarray(flux), REF_FLUX,
                               rtol=0.15, atol=2e-7)
    np.testing.assert_allclose(np.asarray(trans), REF_TRANS,
                               rtol=0.15, atol=2e-8)
