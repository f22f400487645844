import numpy as np
import pytest

from vic_tpu.config import GlobalParams
from vic_tpu.forcing.disagg import (build_model_forcing, calc_longwave,
                                    hourly_temperature, pressure_density,
                                    set_max_min_hour)
from vic_tpu.forcing.mtclim import (atm_pres, effective_annual_precip,
                                    mtclim_run, pulled_boxcar, solar_geometry,
                                    svp_mtclim)
from vic_tpu.testing import synthetic_domain
from vic_tpu.timeaxis import make_time_axis


class TestSolarGeometry:
    def test_daylength_seasonality(self):
        lat = np.array([49.0])
        elev = np.array([500.0])
        geo = solar_geometry(lat, elev, 24)
        dayl_h = geo["daylength"][0] / 3600.0
        # at 49N: June days much longer than December days
        assert dayl_h[171] > 15.5        # ~June 21
        assert dayl_h[354] < 8.5         # ~Dec 21
        # equinox ~12h
        assert abs(dayl_h[79] - 12.0) < 0.7

    def test_radfract_sums_to_one(self):
        geo = solar_geometry(np.array([49.0]), np.array([500.0]), 24)
        s = geo["radfract"][0].sum(-1)
        np.testing.assert_allclose(s[:365], 1.0, atol=1e-6)

    def test_radfract_zero_at_night(self):
        geo = solar_geometry(np.array([49.0]), np.array([0.0]), 24)
        # midnight hours have no radiation in mid-latitudes
        assert geo["radfract"][0, 100, 0] == 0.0
        assert geo["radfract"][0, 100, 12] > 0.05

    def test_ttmax_elevation_effect(self):
        geo_lo = solar_geometry(np.array([49.0]), np.array([0.0]), 24)
        geo_hi = solar_geometry(np.array([49.0]), np.array([3000.0]), 24)
        # thinner atmosphere -> higher clear-sky transmittance
        assert geo_hi["ttmax0"][0, 180] > geo_lo["ttmax0"][0, 180]


class TestMtclimPieces:
    def test_pulled_boxcar(self):
        x = np.arange(10.0)[None, :]
        sm = pulled_boxcar(x, 3)
        assert sm[0, 0] == 0.0
        assert sm[0, 2] == pytest.approx(1.0)
        assert sm[0, 9] == pytest.approx(8.0)

    def test_atm_pres(self):
        assert atm_pres(0.0) == pytest.approx(101325.0, rel=1e-6)
        assert 60000 < atm_pres(4000.0) < 70000

    def test_effective_annual_precip_floor(self):
        p = np.zeros((1, 100))
        eff = effective_annual_precip(p)
        assert (eff >= 8.0).all()


class TestMtclimRun:
    def test_outputs_physical(self):
        n_cell, n_day = 3, 365
        rng = np.random.default_rng(0)
        ax = make_time_axis(1995, 1, 1, 0, n_day, 24)
        doy = ax.day_in_year
        seas = np.cos(2 * np.pi * (doy - 200) / 365.0)
        tmax = 8.0 + 12.0 * seas + rng.normal(0, 2, (n_cell, n_day))
        tmin = tmax - 8.0 - rng.uniform(0, 4, (n_cell, n_day))
        prcp = np.where(rng.random((n_cell, n_day)) < 0.3, 5.0, 0.0)
        lat = np.full(n_cell, 50.0)
        elev = np.full(n_cell, 800.0)
        mt = mtclim_run(lat, elev, doy, prcp, tmax, tmin)
        assert mt["srad"].shape == (n_cell, n_day)
        assert (mt["srad"] >= 0).all() and (mt["srad"] < 1400).all()
        # summer daylight-average radiation should beat winter
        assert mt["srad"][:, 150:210].mean() > 2 * mt["srad"][:, 0:30].mean()
        assert (mt["pva"] > 0).all() and (mt["pva"] < 5000).all()
        assert (mt["tskc"] >= 0).all() and (mt["tskc"] <= 1).all()
        # rain days cloudier than dry days on average
        rain = prcp > 0
        assert mt["tskc"][rain].mean() > mt["tskc"][~rain].mean()


class TestDisagg:
    def test_hourly_temperature_preserves_extrema(self):
        tmin = np.array([[-5.0, -3.0]])
        tmax = np.array([[7.0, 9.0]])
        tmin_h = np.array([[5, 5]])
        tmax_h = np.array([[15, 15]])
        hourly = hourly_temperature(tmin, tmax, tmin_h, tmax_h, 24)
        assert hourly.shape == (1, 48)
        assert hourly.max() <= 9.0 + 1e-6
        assert hourly.min() >= -5.0 - 1e-6
        # at the knots, exact values
        assert hourly[0, 5] == pytest.approx(-5.0, abs=1e-6)
        assert hourly[0, 15] == pytest.approx(7.0, abs=1e-6)

    def test_longwave_options_physical(self):
        for lw_type in range(6):
            for lw_cloud in (0, 1):
                lw = calc_longwave(np.array(0.5), np.array(10.0),
                                   np.array(1000.0), lw_type, lw_cloud)
                assert 150 < float(lw) < 500, (lw_type, lw_cloud, lw)

    def test_pressure_density(self):
        p, d = pressure_density(np.array(15.0), np.array(1000.0))
        assert 85000 < float(p) < 95000
        assert 0.9 < float(d) < 1.3

    def test_set_max_min_hour(self):
        rf = np.zeros((1, 1, 24))
        rf[0, 0, 6:19] = 1.0  # sun 6..18
        tmin_h, tmax_h = set_max_min_hour(rf)
        assert tmin_h[0, 0] == 5
        assert 13 <= tmax_h[0, 0] <= 15


class TestBuildModelForcing:
    def test_daily_mtclim_pipeline(self):
        gp = GlobalParams(dt=24, nrecs=120, startyear=1995)
        dom = synthetic_domain(n_cell=3)
        ax = make_time_axis(1995, 4, 1, 0, 120, 24)
        rng = np.random.default_rng(1)
        n_day = 120
        tmax = 15.0 + rng.normal(0, 3, (n_day, 3))
        tmin = tmax - 9.0
        prec = np.where(rng.random((n_day, 3)) < 0.3, 6.0, 0.0)
        forc = build_model_forcing(
            {"TMAX": tmax, "TMIN": tmin, "PREC": prec}, gp, dom, ax)
        for k in ("prec", "air_temp", "wind", "shortwave", "longwave",
                  "pressure", "vp", "density"):
            assert forc[k].shape == (120, 3), k
            assert np.isfinite(forc[k]).all(), k
        # air temp between tmin and tmax
        assert (forc["air_temp"] <= tmax + 0.5).all()
        assert (forc["air_temp"] >= tmin - 0.5).all()

    def test_subdaily_pipeline(self):
        gp = GlobalParams(dt=3, nrecs=8 * 30, startyear=1995)
        dom = synthetic_domain(n_cell=2)
        ax = make_time_axis(1995, 6, 1, 0, 8 * 30, 3)
        n_day = 30
        rng = np.random.default_rng(2)
        tmax = 20.0 + rng.normal(0, 2, (n_day, 2))
        tmin = tmax - 10.0
        prec = np.where(rng.random((n_day, 2)) < 0.3, 4.0, 0.0)
        forc = build_model_forcing(
            {"TMAX": tmax, "TMIN": tmin, "PREC": prec}, gp, dom, ax)
        assert forc["air_temp"].shape == (240, 2)
        # diurnal cycle present: intra-day range close to tmax-tmin
        day0 = forc["air_temp"][:8, 0]
        assert day0.max() - day0.min() > 5.0
        # shortwave zero at night sub-steps, positive midday
        sw_day0 = forc["shortwave"][:8, 0]
        assert sw_day0[0] < 1.0 and sw_day0.max() > 100.0
        # daily precip conserved
        np.testing.assert_allclose(forc["prec"][:8, 0].sum(), prec[0, 0],
                                   rtol=1e-6)


def test_forcing_stats():
    from vic_tpu.forcing.ingest import forcing_stats
    f = {"prec": np.array([[0.0, 2.0], [4.0, 2.0]])}
    s = forcing_stats(f)
    assert s["prec"]["mean"] == 2.0
    assert s["prec"]["max"] == 4.0


def test_off_gmt_hours_to_degrees(tmp_path):
    """The soil file stores off_gmt in HOURS; the reader must convert to
    time_zone_lng in degrees (read_soilparam.c:564,1121). A realistic file
    (off_gmt=-8 h, lng=-120) must give hour_offset = 0, not an 8-h shift."""
    from vic_tpu.config import GlobalParams
    from vic_tpu.io.soil import read_soil_file
    cols = [1, 1, 51.0, -120.0, 0.2, 0.05, 15.0, 0.9, 2.0]
    cols += [10.0] * 3 + [500.0] * 3 + [-999] * 3 + [150.0] * 3
    cols += [1000.0, 0.1, 0.5, 1.0, 2.0, 4.0]
    cols += [20.0] * 3 + [0.5] * 3 + [1400.0] * 3 + [2685.0] * 3
    cols += [-8.0]                                   # off_gmt in HOURS
    cols += [0.42] * 3 + [0.25] * 3 + [0.01, 0.0005, 800.0]
    cols += [0.02] * 3 + [1]
    (tmp_path / "soil.txt").write_text(
        " ".join(str(c) for c in cols) + "\n")
    gp = GlobalParams(nlayer=3)
    soil = read_soil_file(str(tmp_path / "soil.txt"), gp,
                          glacier_format=False)
    np.testing.assert_allclose(soil.off_gmt, [-120.0])   # degrees
    hour_offset = np.rint((soil.off_gmt - soil.lng) * 24.0 / 360.0)
    assert hour_offset[0] == 0


class TestLocalSolarTimeShift:
    """hour_offset = (time_zone_lng - lng)*24/360 (initialize_atmos.c:125):
    the disaggregated diurnal cycle is generated in local solar time and
    sampled on the forcing-time-zone model axis."""

    def _forc(self, lng_off_deg):
        import dataclasses
        gp = GlobalParams(dt=1, nrecs=24 * 10, startyear=1995)
        dom = synthetic_domain(n_cell=2)
        soil = dom.soil
        # cell 0 at the time-zone center; cell 1 lng_off_deg west of it
        lng = np.array([-120.0, -120.0 + lng_off_deg])
        soil = dataclasses.replace(soil, lng=lng,
                                   lat=np.array([51.0, 51.0]),
                                   elevation=np.array([1000.0, 1000.0]),
                                   off_gmt=np.array([-120.0, -120.0]))
        dom = dataclasses.replace(dom, soil=soil)
        ax = make_time_axis(1995, 6, 1, 0, 24 * 10, 1)
        n_day = 10
        tmax = np.full((n_day, 2), 25.0)
        tmin = np.full((n_day, 2), 10.0)
        prec = np.zeros((n_day, 2))
        return build_model_forcing(
            {"TMAX": tmax, "TMIN": tmin, "PREC": prec}, gp, dom, ax)

    def test_sw_peak_shifts_with_longitude(self):
        # 90 degrees east of the zone center -> hour_offset = +6.  The
        # reference DOUBLE-shifts radiation: mtclim_to_vic samples radfract
        # at (local_hour - offset) (mtclim_wrapper.c:195-215) and the atmos
        # fill shifts by the integer offset again -> the solar-noon peak
        # moves ~2*hour_offset on the forcing clock (quirk replicated)
        forc = self._forc(+90.0)
        day = slice(24 * 5, 24 * 6)
        peak0 = int(np.argmax(forc["shortwave"][day, 0]))
        peak1 = int(np.argmax(forc["shortwave"][day, 1]))
        assert (peak0 - peak1) % 24 == 12

    def test_zero_offset_cells_match(self):
        forc = self._forc(0.0)
        np.testing.assert_allclose(forc["shortwave"][:, 0],
                                   forc["shortwave"][:, 1], rtol=1e-6)
        np.testing.assert_allclose(forc["air_temp"][:, 0],
                                   forc["air_temp"][:, 1], rtol=1e-6)

    def test_daily_precip_conserved_under_shift(self):
        import dataclasses
        gp = GlobalParams(dt=3, nrecs=8 * 10, startyear=1995)
        dom = synthetic_domain(n_cell=2)
        soil = dataclasses.replace(
            dom.soil, lng=np.array([-120.0, -75.0]),
            lat=np.array([51.0, 51.0]),
            elevation=np.array([1000.0, 1000.0]),
            off_gmt=np.array([-120.0, -120.0]))
        dom = dataclasses.replace(dom, soil=soil)
        ax = make_time_axis(1995, 6, 1, 0, 8 * 10, 3)
        rng = np.random.default_rng(7)
        prec = np.where(rng.random((10, 2)) < 0.5, 5.0, 0.0)
        tmax = np.full((10, 2), 20.0)
        forc = build_model_forcing(
            {"TMAX": tmax, "TMIN": tmax - 10.0, "PREC": prec}, gp, dom, ax)
        # total precip conserved over the run; day boundaries shift by the
        # 3-hour offset (local days start earlier on the forcing clock for
        # a cell east of the zone center), so only the totals line up
        np.testing.assert_allclose(
            forc["prec"][:, 1].sum(), prec[:, 1].sum(), rtol=1e-5)
        np.testing.assert_allclose(
            forc["prec"][:, 0].sum(), prec[:, 0].sum(), rtol=1e-5)
        # the shifted cell's daily boxes no longer match the file days
        daily_model = forc["prec"][:, 1].reshape(10, 8).sum(1)
        assert not np.allclose(daily_model, prec[:, 1])
