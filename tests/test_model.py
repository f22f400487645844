import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vic_tpu.config import GlobalParams
from vic_tpu.model import make_forcing_stack, make_step, run
from vic_tpu.prepare import prepare_domain
from vic_tpu.state import initial_state
from vic_tpu.testing import synthetic_domain, synthetic_forcing
from vic_tpu.timeaxis import make_time_axis


def build(n_cell=4, n_rec=30, **gp_kw):
    gp = GlobalParams(dt=24, nlayer=3, startyear=1995, startmonth=1,
                      startday=1, nrecs=n_rec, **gp_kw)
    domain = synthetic_domain(n_cell=n_cell,
                              with_glacier=gp_kw.get("glacier_id", -1) > 0)
    params = prepare_domain(domain, gp)
    ax = make_time_axis(1995, 1, 1, 0, n_rec, 24)
    forc = synthetic_forcing(n_rec, n_cell)
    stack = make_forcing_stack(forc, ax)
    state = initial_state(domain, gp)
    return gp, domain, params, stack, state


class TestWaterBalanceMode:
    def test_step_runs_and_is_finite(self):
        gp, domain, params, stack, state = build()
        step = make_step(params, gp)
        forc0 = jax.tree_util.tree_map(lambda a: a[0], stack)
        new_state, out = jax.jit(step)(state, forc0)
        for name, v in out.items():
            assert bool(jnp.isfinite(v).all()), f"{name} not finite"
        assert bool(jnp.isfinite(new_state.moist).all())

    def test_scan_runs(self):
        gp, domain, params, stack, state = build(n_rec=60)
        final_state, outs = jax.jit(
            lambda s, f: run(s, f, params, gp))(state, stack)
        assert outs["OUT_EVAP"].shape == (60, 4)
        assert bool(jnp.isfinite(outs["OUT_RUNOFF"]).all())
        # some water must move over 60 days of forcing
        assert float(outs["OUT_PREC"].sum()) > 0
        assert float(outs["OUT_RUNOFF"].sum() + outs["OUT_BASEFLOW"].sum()) > 0

    def test_water_balance_closure(self):
        gp, domain, params, stack, state = build(n_rec=90)
        _, outs = jax.jit(lambda s, f: run(s, f, params, gp))(state, stack)
        # per-step closure residual should be tiny relative to precip
        max_err = float(jnp.abs(outs["OUT_WATER_ERROR"]).max())
        assert max_err < 0.01, f"water balance error {max_err} mm/step"

    def test_snow_accumulates_in_winter(self):
        gp, domain, params, stack, state = build(n_rec=60)
        _, outs = jax.jit(lambda s, f: run(s, f, params, gp))(state, stack)
        # Jan/Feb at 51N with lapsed temps: some SWE must appear
        assert float(outs["OUT_SWE"].max()) > 0

    def test_soil_moisture_bounded(self):
        gp, domain, params, stack, state = build(n_rec=90)
        fs, outs = jax.jit(lambda s, f: run(s, f, params, gp))(state, stack)
        mx = jnp.asarray(domain.soil.max_moist)[:, None, :]
        assert bool((fs.moist <= mx * 1.001).all())
        assert bool((fs.moist >= -1e-5).all())


class TestFullEnergyMode:
    def test_full_energy_step(self):
        gp, domain, params, stack, state = build(n_rec=10, full_energy=True)
        final_state, outs = jax.jit(
            lambda s, f: run(s, f, params, gp))(state, stack)
        assert bool(jnp.isfinite(outs["OUT_SURF_TEMP"]).all())
        # surface temp should track air temp within tens of degrees
        assert float(jnp.abs(outs["OUT_SURF_TEMP"]).max()) < 60.0


class TestGlacierMode:
    def test_glacier_hru(self):
        gp, domain, params, stack, state = build(
            n_rec=40, glacier_id=99, full_energy=True)
        assert bool(params.is_glacier.any())
        final_state, outs = jax.jit(
            lambda s, f: run(s, f, params, gp))(state, stack)
        assert bool(jnp.isfinite(outs["OUT_GLAC_MELT"]).all())
        assert bool(jnp.isfinite(outs["OUT_GLAC_OUTFLOW"]).all())
        assert bool(jnp.isfinite(outs["OUT_GLAC_ACCUM"]).all())
        assert bool(jnp.isfinite(outs["OUT_GLAC_IMBAL"]).all())

    def test_firn_to_ice_conversion(self):
        """Dense pack snow on a glacier lane converts to ice
        (snow_melt_glac.c:110-131) and leaves the snowpack water budget."""
        from vic_tpu.physics.snow import snow_melt
        import vic_tpu.constants as c

        two = lambda v: jnp.full((2,), v)
        is_glacier = jnp.array([True, False])
        res = snow_melt(
            swq=two(2.0), surf_temp=two(-2.0), pack_temp=two(-2.0),
            surf_water=two(0.0), pack_water=two(0.0),
            snow_depth=two(4.0), snow_density=two(600.0),
            coldcontent=two(0.0), rainfall_mm=two(0.0), snowfall_mm=two(0.0),
            air_temp=two(-5.0), tcanopy=two(-5.0), tgrnd=two(0.0),
            wind=two(2.0), vp_air=two(300.0), vpd=two(100.0),
            air_dens=two(1.2), pressure=two(95000.0),
            longwave_in=two(220.0), net_short=two(30.0), lv=two(2.501e6),
            ra=two(100.0), displacement=two(0.0), z_ref=two(2.0),
            roughness=two(0.01), dt_sec=86400.0,
            is_glacier=is_glacier)
        firn = np.asarray(res.firn_to_ice)
        # linear-profile firn depth: zco = 480*(4/2)/250 = 3.84 m < depth
        # -> firn = (850+830)/2000 * (4-3.84) = 0.1344 m
        assert firn[0] == pytest.approx(0.1344, rel=1e-3)
        assert firn[1] == 0.0
        # firn mass leaves the pack: glacier lane ends lighter by exactly
        # the firn amount relative to the non-glacier lane
        swq = np.asarray(res.swq)
        assert swq[1] - swq[0] == pytest.approx(firn[0], rel=1e-5)


class TestBandOutputs:
    def test_band_resolved(self):
        gp = GlobalParams(dt=24, nlayer=3, startyear=1995, nrecs=15,
                          full_energy=True, snow_band=3)
        domain = synthetic_domain(n_cell=3, n_band=3)
        params = prepare_domain(domain, gp)
        ax = make_time_axis(1995, 1, 1, 0, 15, 24)
        stack = make_forcing_stack(synthetic_forcing(15, 3), ax)
        state = initial_state(domain, gp)
        _, outs = jax.jit(lambda s, f: run(s, f, params, gp))(state, stack)
        assert outs["OUT_SWE_BAND"].shape == (15, 3, 3)
        # higher (colder) bands accumulate at least as much snow on average
        swe_b = np.asarray(outs["OUT_SWE_BAND"][-1])
        assert np.isfinite(swe_b).all()
        assert bool((outs["OUT_AREA_BAND"].sum(-1) > 0.99).all())


class TestSpatialSnow:
    def test_partial_coverage(self):
        # run through the spring melt: the depletion curve only produces
        # partial cover during melt-out (calc_snow_coverage.c — coverage
        # stays 1 while accumulating, unlike a naive depth ramp)
        gp, domain, params, stack, state = build(n_rec=180,
                                                 spatial_snow=True)
        _, outs = jax.jit(lambda s, f: run(s, f, params, gp))(state, stack)
        cov = np.asarray(outs["OUT_SNOW_COVER"])
        assert np.isfinite(cov).all()
        assert cov.max() <= 1.0 + 1e-6
        # thin melting packs must show partial cover at some point
        assert ((cov > 0.01) & (cov < 0.95)).any()
        assert float(np.abs(outs["OUT_WATER_ERROR"]).max()) < 0.01


class TestEnergyClosure:
    def test_energy_error_small_full_energy(self):
        """In full-energy mode the surface EB residual at the accepted Ts
        (OUT_ENERGY_ERROR) should be near zero wherever the Brent solve
        converged (TFALLBACK lanes may carry residual)."""
        gp, domain, params, stack, state = build(n_rec=20, full_energy=True)
        fs, outs = jax.jit(lambda s, f: run(s, f, params, gp))(state, stack)
        err = np.asarray(outs["OUT_ENERGY_ERROR"])
        fb = np.asarray(outs["OUT_SURFT_FBFLAG"])
        converged = fb < 1e-6
        assert np.isfinite(err).all()
        # median absolute closure under 5 W/m^2 on converged steps
        vals = np.abs(err[converged]) if converged.any() else np.abs(err)
        assert np.median(vals) < 5.0, np.median(vals)


class TestOutvarPruning:
    def test_outvars_subset(self):
        """make_step(outvars=...) returns only the requested variables plus
        the closure telemetry, and their values match the unpruned step."""
        gp, domain, params, stack, state = build(n_rec=5)
        forc0 = jax.tree_util.tree_map(lambda a: a[0], stack)
        full_step = jax.jit(make_step(params, gp))
        pruned_step = jax.jit(make_step(
            params, gp, outvars=["OUT_EVAP", "OUT_RUNOFF"]))
        _, full = full_step(state, forc0)
        _, pruned = pruned_step(state, forc0)
        assert set(pruned) == {"OUT_EVAP", "OUT_RUNOFF", "OUT_WATER_ERROR"}
        for k in pruned:
            np.testing.assert_allclose(np.asarray(pruned[k]),
                                       np.asarray(full[k]), rtol=1e-6)


class TestGlacierFluxComposition:
    def test_glacier_lane_fluxes_exclude_soil_eb(self):
        """Glacier lanes never run the soil EB in the reference: their
        reported GRND_FLUX/LATENT/SENSIBLE come from the glacier slab EB
        (solve_glacier.c:94) or the pack EB (solve_snow_glac.c:151) alone,
        and deltaH/fusion stay 0 there (round-5 fix: bands GRND_FLUX mean
        was biased 14.7 vs 9.4 W/m2 by the soil EB's terms). A pure-glacier
        domain (every lane glacier, Cv=1) must therefore report
        OUT_DELTAH == OUT_FUSION == 0 exactly."""
        gp, domain, params, stack, state = build(
            n_rec=10, glacier_id=99, full_energy=True)
        import dataclasses
        # make EVERY lane a glacier lane: weight only the glacier HRU
        isg = np.asarray(params.is_glacier)
        assert isg.any()
        w = np.where(isg, 1.0, 0.0)
        w = w / np.maximum(w.sum(-1, keepdims=True), 1e-9)
        params2 = dataclasses.replace(
            params, weight=jnp.asarray(w, jnp.float32))
        final_state, outs = jax.jit(
            lambda s, f: run(s, f, params2, gp))(state, stack)
        np.testing.assert_allclose(np.asarray(outs["OUT_DELTAH"]), 0.0,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(outs["OUT_FUSION"]), 0.0,
                                   atol=1e-6)
        assert np.isfinite(np.asarray(outs["OUT_GRND_FLUX"])).all()
        assert np.isfinite(np.asarray(outs["OUT_LATENT"])).all()
