import jax
import jax.numpy as jnp
import numpy as np

from vic_tpu.config import GlobalParams
from vic_tpu.model import make_forcing_stack, run
from vic_tpu.prepare import prepare_domain
from vic_tpu.state import initial_state
from vic_tpu.testing import synthetic_domain, synthetic_forcing
from vic_tpu.timeaxis import make_time_axis


def run_case(dist, n_rec=60, seed=3):
    gp = GlobalParams(dt=24, startyear=1995, startmonth=6, nrecs=n_rec,
                      dist_prcp=dist, prec_expt=0.6)
    dom = synthetic_domain(n_cell=3)
    params = prepare_domain(dom, gp)
    ax = make_time_axis(1995, 6, 1, 0, n_rec, 24)
    forc = synthetic_forcing(n_rec, 3, start_doy=152, seed=seed)
    forc["air_temp"] += 10.0     # keep it snow-free so mu < 1 paths engage
    stack = make_forcing_stack(forc, ax)
    st = initial_state(dom, gp)
    return jax.jit(lambda s, f: run(s, f, params, gp))(st, stack)


def test_storm_tracking_state():
    fs, outs = run_case(dist=True)
    mu = np.asarray(fs.mu)
    assert np.isfinite(mu).all()
    assert (mu > 0).all() and (mu <= 1.0).all()
    # some HRUs should have experienced partial-area storms (mu < 1)
    assert (mu < 0.999).any()


def test_dist_increases_surface_runoff():
    """Concentrating precip over a wet fraction must generate >= the uniform
    surface runoff (infiltration-excess intensification)."""
    _, outs_d = run_case(dist=True)
    _, outs_u = run_case(dist=False)
    ro_d = float(np.asarray(outs_d["OUT_RUNOFF"]).sum())
    ro_u = float(np.asarray(outs_u["OUT_RUNOFF"]).sum())
    assert ro_d >= ro_u - 1e-3


def test_closure_with_dist():
    fs, outs = run_case(dist=True)
    assert float(np.abs(np.asarray(outs["OUT_WATER_ERROR"])).max()) < 0.01


def test_mu_one_when_snow():
    gp = GlobalParams(dt=24, startyear=1995, nrecs=40, dist_prcp=True)
    dom = synthetic_domain(n_cell=2)
    params = prepare_domain(dom, gp)
    ax = make_time_axis(1995, 1, 1, 0, 40, 24)
    forc = synthetic_forcing(40, 2)
    forc["air_temp"] -= 15.0   # snowy
    stack = make_forcing_stack(forc, ax)
    st = initial_state(dom, gp)
    fs, _ = jax.jit(lambda s, f: run(s, f, params, gp))(st, stack)
    # snow lanes must have mu == 1 (dist_prec.c: mu=1 when ANY_SNOW)
    swq = np.asarray(fs.swq)
    mu = np.asarray(fs.mu)
    assert (mu[swq > 0] > 0.999).all()


def test_storm_transfer_conserves_mass():
    """Both storm transfers must conserve mu-weighted water
    (initialize_new_storm.c / redistribute_during_storm.c)."""
    from vic_tpu.physics.dist_prcp import (average_for_storm,
                                           redistribute_for_storm)
    rng = np.random.default_rng(0)
    wet = jnp.asarray(rng.uniform(5, 80, (64,)))
    dry = jnp.asarray(rng.uniform(5, 80, (64,)))
    mu_old = jnp.asarray(rng.uniform(0.05, 0.95, (64,)))
    mu_new = jnp.asarray(rng.uniform(0.05, 0.95, (64,)))
    max_val = jnp.full((64,), 200.0)

    aw, ad = average_for_storm(wet, dry, mu_old)
    np.testing.assert_allclose(np.asarray(aw), np.asarray(ad))
    np.testing.assert_allclose(
        np.asarray(mu_new * aw + (1 - mu_new) * ad),
        np.asarray(mu_old * wet + (1 - mu_old) * dry), rtol=1e-6)

    rw, rd = redistribute_for_storm(wet, dry, max_val, mu_old, mu_new)
    np.testing.assert_allclose(
        np.asarray(mu_new * rw + (1 - mu_new) * rd),
        np.asarray(mu_old * wet + (1 - mu_old) * dry), rtol=1e-6)


def test_wet_dry_lanes_diverge():
    """During a partial-area storm the wet column must be wetter than the
    dry column (precip falls only on the wet fraction)."""
    fs, _ = run_case(dist=True)
    wet = np.asarray(fs.moist).sum(-1)
    dry = np.asarray(fs.moist_dry).sum(-1)
    mu = np.asarray(fs.mu)
    part = mu < 0.999
    assert part.any()
    assert (wet[part] >= dry[part] - 1e-6).all()
    assert (wet[part] > dry[part] + 1e-3).any()


def test_dist_off_leaves_dry_lane_untouched():
    """Without DIST_PRCP the dry columns are inert pass-through carries
    (never read: mu stays 1 and a storm-onset averaging would overwrite
    them before first use)."""
    gp = GlobalParams(dt=24, startyear=1995, startmonth=6, nrecs=30,
                      dist_prcp=False)
    dom = synthetic_domain(n_cell=3)
    params = prepare_domain(dom, gp)
    ax = make_time_axis(1995, 6, 1, 0, 30, 24)
    forc = synthetic_forcing(30, 3, start_doy=152, seed=3)
    st0 = initial_state(dom, gp)
    fs, _ = jax.jit(lambda s, f: run(s, f, params, gp))(
        st0, make_forcing_stack(forc, ax))
    np.testing.assert_allclose(np.asarray(fs.moist_dry),
                               np.asarray(st0.moist_dry))
    assert float(np.asarray(fs.mu).min()) == 1.0
