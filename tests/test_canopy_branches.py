"""Round-4 canopy/pack branch semantics (snow_intercept.c:324-361,
func_canopy_energy_bal.c:40-111, snow_melt.c:322-376)."""
import jax.numpy as jnp
import numpy as np

from vic_tpu import constants as c
from vic_tpu.physics.canopy_snow import canopy_energy_terms, snow_intercept
from vic_tpu.physics.snow import snow_melt


def _intercept(n=4, **over):
    kw = dict(
        snowfall_mm=jnp.zeros(n), rainfall_mm=jnp.full(n, 2.0),
        int_snow_m=jnp.zeros(n), int_rain_m=jnp.full(n, 0.0004),
        tfoliage_old=jnp.full(n, -2.0), temp_int_storage=jnp.zeros(n),
        lai=jnp.full(n, 4.0), wdmax_mm=jnp.full(n, 0.8),
        air_dens=jnp.full(n, 1.2), vp_air=jnp.full(n, 400.0),
        vpd=jnp.full(n, 120.0), pressure=jnp.full(n, 95500.0),
        le=jnp.full(n, 2.5e6), tcanopy=jnp.full(n, -1.5),
        net_short_over=jnp.full(n, 15.0),
        long_over_in=jnp.full(n, 250.0), long_under_out=jnp.full(n, 310.0),
        ra_overstory=jnp.full(n, 20.0), wind_over=jnp.full(n, 1.5),
        z_ref=jnp.full(n, 17.0), displacement=jnp.full(n, 10.2),
        roughness=jnp.full(n, 1.8), dt_sec=10800.0, max_iter=40)
    kw.update(over)
    return snow_intercept(**kw)


def liquid_evap_stub(net_rad):
    """Mass-conserving liquid closure: evaporate 10% of dew, no spill."""
    wdew0 = 0.4
    prec = 2.0
    cevap = jnp.full_like(net_rad, 0.1 * wdew0)
    thru = jnp.full_like(net_rad, prec)
    wnew = jnp.full_like(net_rad, wdew0 - 0.1 * wdew0)
    return cevap, cevap, thru, wnew


class TestSnowFreeCanopyBranch:
    def test_liquid_branch_outputs(self):
        res = _intercept(liquid_evap=liquid_evap_stub,
                         net_short_over_nosnow=jnp.full(4, 80.0))
        # no canopy snow + no snowfall => the liquid branch results stick
        np.testing.assert_allclose(np.asarray(res.int_snow), 0.0)
        np.testing.assert_allclose(np.asarray(res.canopy_evap_mm), 0.04,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(res.int_rain),
                                   0.36 / 1000.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(res.rain_throughfall),
                                   2.0 / 1000.0, rtol=1e-6)
        # no pack sublimation bookkeeping on the liquid branch
        np.testing.assert_allclose(np.asarray(res.vapor_flux), 0.0)

    def test_snow_branch_keeps_snow_machinery(self):
        res = _intercept(int_snow_m=jnp.full(4, 0.004),
                         liquid_evap=liquid_evap_stub,
                         net_short_over_nosnow=jnp.full(4, 80.0))
        assert np.all(np.asarray(res.canopy_evap_mm) == 0.0)
        assert np.all(np.asarray(res.int_snow) > 0.0)

    def test_snow_branch_bracket_upper_is_zero(self):
        """A cold canopy still admits roots up to 0 C
        (snow_intercept.c:344-348 Tupper = 0 always)."""
        # strongly warming inputs: the EB root sits just below 0 even
        # though Tfol_old - SNOW_DT + SNOW_DT < 0
        res = _intercept(int_snow_m=jnp.full(4, 0.004),
                         tfoliage_old=jnp.full(4, -12.0),
                         tcanopy=jnp.full(4, -0.5),
                         long_over_in=jnp.full(4, 330.0),
                         long_under_out=jnp.full(4, 330.0),
                         net_short_over=jnp.full(4, 120.0))
        # the old capped bracket [-17, -7] could never reach this root
        assert np.all(np.asarray(res.tfoliage) > -7.0)

    def test_ar406_full_no_stability(self):
        """The snow-branch resistance is exactly ra*10 — no Richardson
        correction (func_canopy_energy_bal.c:54-70, AR_406_FULL)."""
        t = canopy_energy_terms(
            jnp.full(3, -5.0), dt=10800.0, lai_ra_over=jnp.full(3, 200.0),
            air_dens=jnp.full(3, 1.2), vp_air=jnp.full(3, 400.0),
            pressure=jnp.full(3, 95500.0), le=jnp.full(3, 2.5e6),
            tcanopy=jnp.full(3, -1.0), vpd=jnp.full(3, 100.0),
            rainfall_m=jnp.zeros(3), net_short_over=jnp.full(3, 10.0),
            long_over_in=jnp.full(3, 250.0),
            long_under_out=jnp.full(3, 300.0),
            int_rain=jnp.zeros(3),
            # stability inputs that WOULD change a corrected ra:
            wind_over=jnp.asarray([0.5, 2.0, 8.0]),
            z_ref=jnp.full(3, 17.0), displacement=jnp.full(3, 10.2),
            roughness=jnp.full(3, 1.8))
        expected = 1.2 * c.CP * (-1.0 - (-5.0)) / 200.0
        np.testing.assert_allclose(np.asarray(t["sensible"]),
                                   expected, rtol=1e-6)


class TestThinPackIncludeSnow:
    def test_thin_pack_flagged(self):
        n = 2
        swq = jnp.asarray([0.0005, 0.05])      # 0.5 mm vs 50 mm WE
        res = snow_melt(
            swq=swq, surf_temp=jnp.full(n, -3.0),
            pack_temp=jnp.zeros(n), surf_water=jnp.zeros(n),
            pack_water=jnp.zeros(n), snow_depth=swq * 5.0,
            snow_density=jnp.full(n, 200.0), coldcontent=jnp.zeros(n),
            rainfall_mm=jnp.zeros(n), snowfall_mm=jnp.zeros(n),
            air_temp=jnp.full(n, -6.0), tcanopy=jnp.full(n, -6.0),
            tgrnd=jnp.full(n, -1.0), wind=jnp.full(n, 2.0),
            vp_air=jnp.full(n, 300.0), vpd=jnp.full(n, 100.0),
            air_dens=jnp.full(n, 1.2), pressure=jnp.full(n, 95500.0),
            longwave_in=jnp.full(n, 200.0), net_short=jnp.full(n, 20.0),
            lv=jnp.full(n, 2.5e6), ra=jnp.full(n, 50.0),
            displacement=jnp.zeros(n), z_ref=jnp.full(n, 2.0),
            roughness=jnp.full(n, 0.001), dt_sec=10800.0)
        inc = np.asarray(res.include_snow)
        assert inc[0] and not inc[1]
        # thin lane: accumulation-only pass-through (no EB fluxes)
        assert float(res.terms.sensible[0]) == 0.0
        assert float(res.vapor_flux[0]) == 0.0
        # fat lane solved normally
        assert float(res.surf_temp[1]) < 0.0
