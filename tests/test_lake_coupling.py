import jax
import jax.numpy as jnp
import numpy as np

from vic_tpu.config import GlobalParams
from vic_tpu.model import make_forcing_stack, run
from vic_tpu.physics.lake import make_lake_params
from vic_tpu.prepare import prepare_domain
from vic_tpu.state import initial_state
from vic_tpu.testing import synthetic_domain, synthetic_forcing
from vic_tpu.timeaxis import make_time_axis


def test_lake_coupled_run():
    gp = GlobalParams(dt=24, startyear=1995, nrecs=60, full_energy=True,
                      lakes=True)
    dom = synthetic_domain(n_cell=3)
    params = prepare_domain(dom, gp)
    lp = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if np.asarray(a).dtype.kind == "f" else jnp.asarray(a),
        make_lake_params(dom.soil, gp))
    ax = make_time_axis(1995, 5, 1, 0, 60, 24)
    forc = synthetic_forcing(60, 3, start_doy=121)
    stack = make_forcing_stack(forc, ax)
    st = initial_state(dom, gp, lake_params=lp)

    fs, outs = jax.jit(lambda s, f: run(s, f, params, gp,
                                        lake_params=lp))(st, stack)
    assert "OUT_LAKE_DEPTH" in outs
    assert bool(jnp.isfinite(outs["OUT_LAKE_DEPTH"]).all())
    assert bool(jnp.isfinite(fs.lake_volume).all())
    assert bool((fs.lake_volume >= 0).all())
    assert bool(jnp.isfinite(outs["OUT_RUNOFF"]).all())
    # lake surface temp follows a sane range
    t = np.asarray(outs["OUT_LAKE_SURF_TEMP"])
    assert t.min() > -1.0 and t.max() < 40.0


def test_wetland_recharge():
    """Lake growth saturates the flooded wetland fringe from lake water
    (water_balance, lakes.eb.c:2016-2096): recharge > 0 in wet spells,
    wetland soil gains it, and the land-column closure stays tight."""
    gp = GlobalParams(dt=24, startyear=1995, nrecs=50, full_energy=True,
                      lakes=True)
    dom = synthetic_domain(n_cell=3)
    params = prepare_domain(dom, gp)
    lp = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if np.asarray(a).dtype.kind == "f" else jnp.asarray(a),
        make_lake_params(dom.soil, gp))
    ax = make_time_axis(1995, 5, 1, 0, 50, 24)
    forc = synthetic_forcing(50, 3, start_doy=121, seed=9)
    forc["prec"] = forc["prec"] * 6.0 + 8.0   # very wet: lake must grow
    forc["air_temp"] += 8.0
    stack = make_forcing_stack(forc, ax)
    st = initial_state(dom, gp, lake_params=lp)
    fs, outs = jax.jit(lambda s, f: run(s, f, params, gp,
                                        lake_params=lp))(st, stack)
    rch = np.asarray(outs["OUT_LAKE_RCHRG"])
    assert np.isfinite(rch).all()
    assert rch.max() > 0.0, "no recharge despite growing lake"
    # water balance error still bounded with the recharge influx credit
    assert float(np.abs(np.asarray(outs["OUT_WATER_ERROR"])).max()) < 0.01


def test_lakefactor_displaces_wetland():
    """Open-water area displaces the wetland tile in cell aggregates
    (put_data.c:282-330 lakefactor): with a lake present, the land-area
    weighting drops below 1 and new-vs-old lake diagnostics stay coherent."""
    gp = GlobalParams(dt=24, startyear=1995, nrecs=40, full_energy=True,
                      lakes=True)
    dom = synthetic_domain(n_cell=3)
    params = prepare_domain(dom, gp)
    lp = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if np.asarray(a).dtype.kind == "f" else jnp.asarray(a),
        make_lake_params(dom.soil, gp))
    ax = make_time_axis(1995, 5, 1, 0, 40, 24)
    stack = make_forcing_stack(synthetic_forcing(40, 3, start_doy=121), ax)
    st = initial_state(dom, gp, lake_params=lp)
    fs, outs = jax.jit(lambda s, f: run(s, f, params, gp,
                                        lake_params=lp))(st, stack)
    frac = np.asarray(outs["OUT_LAKE_AREA_FRAC"])
    assert np.isfinite(frac).all() and frac.max() > 0.0
    # the band-area echo still sums to 1 (static mosaic), while land
    # aggregates use the reduced weights: PREC over land is scaled by
    # <= 1 - displaced fraction relative to the static aggregate
    prec = np.asarray(outs["OUT_PREC"])
    assert np.isfinite(prec).all()
    # volumetric budget diagnostics are self-consistent
    dstor = np.asarray(outs["OUT_LAKE_DSTOR_V"])
    vol = np.asarray(outs["OUT_LAKE_VOLUME"])
    recon = vol[1:] - vol[:-1]
    assert np.allclose(dstor[1:], recon, atol=max(1.0, 1e-4 * vol.max()))


def test_wetland_inflow_scaled_by_dynamic_lakefrac():
    """The wetland tile's lake-inflow share carries the DYNAMIC land factor
    Cv*(1 - lakefrac_pre) (full_energy.c:239-242 mutates Cv before the
    inflow sum at :740-767): a nearly-full lake must receive a smaller
    wetland inflow contribution than a nearly-empty one under identical
    weather. The round-4 static-Cv weighting inflated the lake inflow by
    1/(1-lakefrac) and collapsed depth parity to r=0.43 (round-5 fix)."""
    from vic_tpu.physics.lake import initial_lake_state

    gp = GlobalParams(dt=24, startyear=1995, nrecs=10, full_energy=True,
                      lakes=True)
    dom = synthetic_domain(n_cell=2)
    params = prepare_domain(dom, gp)

    def run_with_depth(depth_in):
        lp = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32)
            if np.asarray(a).dtype.kind == "f" else jnp.asarray(a),
            make_lake_params(dom.soil, gp, depth_in=depth_in))
        ax = make_time_axis(1995, 5, 1, 0, 10, 24)
        forc = synthetic_forcing(10, 2, start_doy=121, seed=3)
        forc["prec"] = forc["prec"] + 10.0   # steady rain -> steady runoff
        stack = make_forcing_stack(forc, ax)
        st = initial_state(dom, gp, lake_params=lp)
        fs, outs = jax.jit(lambda s, f: run(s, f, params, gp,
                                            lake_params=lp))(st, stack)
        return (np.asarray(outs["OUT_LAKE_RO_IN_V"])
                + np.asarray(outs["OUT_LAKE_BF_IN_V"]))

    # deep lake: lakefrac_pre ~ 0.9+ -> wetland land share ~ 0
    inflow_deep = run_with_depth(9.5)
    # shallow lake: lakefrac_pre small -> full wetland share
    inflow_shallow = run_with_depth(0.6)
    assert np.isfinite(inflow_deep).all() and np.isfinite(inflow_shallow).all()
    # same weather, same soils: on the FIRST step (before the lake->soil
    # recharge feedback diverges the columns) the deep lake's inflow must
    # be strictly smaller
    assert (inflow_shallow[0] > 0).all()
    assert (inflow_deep[0] < inflow_shallow[0]).all()
