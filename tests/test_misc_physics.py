import jax.numpy as jnp
import numpy as np
import pytest

from vic_tpu.config import GlobalParams
from vic_tpu.physics.gmb import GmbAccumulator, fit_gmb_polynomials
from vic_tpu.physics.hydrology_misc import (build_zwt_curves, compute_treeline,
                                            compute_zwt, correct_precip,
                                            july_avg_temperature)
from vic_tpu.testing import synthetic_domain
from vic_tpu.timeaxis import make_time_axis


class TestGmbFit:
    def test_quadratic_exact(self):
        # points on an exact parabola recover coefficients
        z = np.array([[1000.0, 1500.0, 2000.0, 2500.0]])
        b0t, b1t, b2t = -5.0, 0.004, -1e-6
        y = b0t + b1t * z + b2t * z * z
        res = fit_gmb_polynomials(y, z, np.ones_like(z, bool))
        assert res.b0[0] == pytest.approx(b0t, rel=1e-4)
        assert res.b1[0] == pytest.approx(b1t, rel=1e-4)
        assert res.b2[0] == pytest.approx(b2t, rel=1e-4)
        assert res.fit_error[0] < 1e-8

    def test_two_points_line(self):
        z = np.array([[1000.0, 2000.0]])
        y = np.array([[-2.0, 4.0]])
        res = fit_gmb_polynomials(y, z, np.ones_like(z, bool))
        assert res.b1[0] == pytest.approx(0.006)
        assert res.b2[0] == 0.0

    def test_one_point_horizontal(self):
        res = fit_gmb_polynomials(np.array([[3.0]]), np.array([[1500.0]]),
                                  np.array([[True]]))
        assert res.b0[0] == 3.0 and res.b1[0] == 0.0

    def test_no_glacier(self):
        res = fit_gmb_polynomials(np.zeros((2, 3)), np.ones((2, 3)),
                                  np.zeros((2, 3), bool))
        assert (res.n_points == 0).all()

    def test_duplicate_elevations_summed(self):
        z = np.array([[1000.0, 1000.0, 2000.0]])
        y = np.array([[1.0, 2.0, 9.0]])
        res = fit_gmb_polynomials(y, z, np.ones_like(z, bool))
        # merged point (1000, 3): slope = 6/1000
        assert res.b1[0] == pytest.approx(0.006)

    def test_accumulator_schedule(self):
        gp = GlobalParams(glacier_id=99, glacier_accum_start_year=1995,
                          glacier_accum_start_month=10,
                          glacier_accum_start_day=1,
                          glacier_accum_interval=1)
        acc = GmbAccumulator(gp)
        ax = make_time_axis(1995, 9, 28, 0, 400, 24)
        boundaries = [r + 1 for r in range(399)
                      if acc.boundary(int(ax.year[r + 1]),
                                      int(ax.month[r + 1]),
                                      int(ax.day[r + 1]))]
        # one boundary: 1996-10-01
        assert len(boundaries) == 1
        r = boundaries[0]
        assert (ax.year[r], ax.month[r], ax.day[r]) == (1996, 10, 1)


class TestZwt:
    def test_curves_monotonic(self):
        dom = synthetic_domain(n_cell=2)
        curves = build_zwt_curves(dom.soil)
        # moisture decreases as water table deepens
        assert (np.diff(curves["moist"], axis=-1) <= 1e-9).all()
        assert (np.diff(curves["zwt"], axis=-1) <= 1e-9).all()

    def test_lookup_saturated_and_dry(self):
        dom = synthetic_domain(n_cell=1)
        curves = build_zwt_curves(dom.soil)
        cz = jnp.asarray(curves["zwt"])[:, 0]     # layer 0 curve [c, 11]
        cm = jnp.asarray(curves["moist"])[:, 0]
        # saturated: zwt at top of curve (wettest)
        sat = compute_zwt(cm[:, 0], cz, cm)
        np.testing.assert_allclose(np.asarray(sat), np.asarray(cz[:, 0]),
                                   atol=1e-5)
        # dry: deepest
        dry = compute_zwt(cm[:, -1] * 0.5, cz, cm)
        np.testing.assert_allclose(np.asarray(dry), np.asarray(cz[:, -1]),
                                   atol=1e-5)
        # intermediate moisture: between
        mid = compute_zwt((cm[:, 3] + cm[:, 4]) / 2, cz, cm)
        assert float(cz[0, 4]) <= float(mid[0]) <= float(cz[0, 3])


class TestGauge:
    def test_correction_increases_with_wind(self):
        r1, s1 = correct_precip(jnp.array(1.0), 10.0, 0.01, 0.0005)
        r2, s2 = correct_precip(jnp.array(6.0), 10.0, 0.01, 0.0005)
        assert float(r2) > float(r1) >= 1.0 * 0.99
        assert float(s2) > float(s1)
        # snow undercatch worse than rain at same wind
        assert float(s2) > float(r2)


class TestTreeline:
    def test_bands_above(self):
        july = np.array([12.0, 8.0])
        tf = np.array([[0.0, -3.0], [0.0, -3.0]])  # higher band colder
        above = compute_treeline(july, tf)
        assert not above[0, 0] and above[0, 1]
        assert above[1].all()

    def test_july_avg(self):
        months = np.array([6, 7, 7, 8])
        at = np.array([[10.0], [20.0], [22.0], [15.0]])
        assert july_avg_temperature(at, months)[0] == pytest.approx(21.0)
