"""CLOSE_ENERGY canopy-air energy balance (calc_atmos_energy_bal.c,
surface_fluxes.c:455-656 overstory iteration)."""
import jax
import jax.numpy as jnp
import numpy as np

from vic_tpu.config import GlobalParams
from vic_tpu.model import make_forcing_stack, run
from vic_tpu.prepare import prepare_domain
from vic_tpu.state import initial_state
from vic_tpu.testing import synthetic_domain, synthetic_forcing
from vic_tpu.timeaxis import make_time_axis


def _run(close, n_rec=40, n_cell=2):
    gp = GlobalParams(dt=24, startyear=1995, nrecs=n_rec, full_energy=True,
                      close_energy=close)
    dom = synthetic_domain(n_cell=n_cell)
    params = prepare_domain(dom, gp)
    ax = make_time_axis(1995, 1, 1, 0, n_rec, 24)
    forc = synthetic_forcing(n_rec, n_cell, seed=7)
    forc["air_temp"] -= 12.0     # wintry: overstory lanes carry snow
    st = initial_state(dom, gp)
    return jax.jit(lambda s, f: run(s, f, params, gp))(
        st, make_forcing_stack(forc, ax))


def test_calc_atmos_energy_bal_kernel():
    from vic_tpu.physics.canopy_air import calc_atmos_energy_bal
    tair = jnp.asarray([5.0, 5.0, 5.0])
    dens = jnp.asarray([1.2, 1.2, 1.2])
    ra = jnp.asarray([50.0, 50.0, 50.0])
    # small InSensible -> in-bracket root; huge -> TFALLBACK to Tair
    ins = jnp.asarray([10.0, -10.0, 5000.0])
    r = calc_atmos_energy_bal(ins, tair, dens, ra)
    assert not bool(r.fbflag[0]) and not bool(r.fbflag[1])
    assert bool(r.fbflag[2])
    np.testing.assert_allclose(np.asarray(r.tcanopy[2]), 5.0)
    # residual closes exactly where converged
    np.testing.assert_allclose(np.asarray(r.error[:2]), 0.0, atol=1e-4)
    # warmer canopy air when it must export heat
    assert float(r.tcanopy[0]) < 5.0 and float(r.tcanopy[1]) > 5.0


def test_close_energy_runs_and_conserves():
    fs, outs = _run(close=True)
    assert np.isfinite(np.asarray(outs["OUT_SWE"])).all()
    assert float(np.abs(np.asarray(outs["OUT_WATER_ERROR"])).max()) < 0.01
    tc = np.asarray(outs["OUT_TCANOPY"])
    assert np.isfinite(tc).all()


def test_close_energy_changes_overstory_fluxes():
    _, o_on = _run(close=True)
    _, o_off = _run(close=False)
    # canopy-air temperature must deviate from Tair somewhere when snow is
    # held in an overstory canopy
    d = np.abs(np.asarray(o_on["OUT_TCANOPY"])
               - np.asarray(o_on["OUT_AIR_TEMP"]))
    assert d.max() > 1e-4
    # and the off path must be Tcanopy == Tair (OUT_AIR_TEMP is the raw
    # cell-level echo per put_data.c:227 while OUT_TCANOPY is the f32
    # HRU-weight aggregate, so allow aggregation rounding)
    d0 = np.abs(np.asarray(o_off["OUT_TCANOPY"])
                - np.asarray(o_off["OUT_AIR_TEMP"]))
    assert d0.max() < 1e-4
