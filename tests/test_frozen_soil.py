import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vic_tpu.config import GlobalParams
from vic_tpu.model import make_forcing_stack, run
from vic_tpu.physics.frozen_soil import (build_node_geometry,
                                         estimate_layer_ice,
                                         solve_t_profile_explicit,
                                         distribute_node_moisture)
from vic_tpu.physics.soil_thermal import maximum_unfrozen_water
from vic_tpu.prepare import prepare_domain
from vic_tpu.state import initial_state
from vic_tpu.testing import synthetic_domain, synthetic_forcing
from vic_tpu.timeaxis import make_time_axis


def test_node_geometry_quickflux():
    gp = GlobalParams(nlayer=3, nnode=3, quick_flux=True)
    dom = synthetic_domain(n_cell=3)
    geom = build_node_geometry(dom.soil, gp)
    np.testing.assert_allclose(geom.zsum[:, 0], 0.0)
    np.testing.assert_allclose(geom.zsum[:, 1], dom.soil.depth[:, 0])
    np.testing.assert_allclose(geom.zsum[:, 2], dom.soil.dp)


def test_node_geometry_fd():
    gp = GlobalParams(nlayer=3, nnode=10, quick_flux=False, frozen_soil=True)
    dom = synthetic_domain(n_cell=3)
    geom = build_node_geometry(dom.soil, gp)
    # monotonic, ends at damping depth
    assert (np.diff(geom.zsum, axis=1) > 0).all()
    np.testing.assert_allclose(geom.zsum[:, -1], dom.soil.dp, rtol=1e-6)
    # trapezoid weights integrate a constant exactly
    ones = np.ones_like(geom.samp_trap)
    np.testing.assert_allclose((geom.samp_trap * ones).sum(-1), 1.0,
                               atol=1e-6)


def test_layer_average_linear_profile():
    """Layer-averaging of a linear T(z) profile must be exact."""
    gp = GlobalParams(nlayer=3, nnode=8, quick_flux=False, frozen_soil=True)
    dom = synthetic_domain(n_cell=2)
    geom = build_node_geometry(dom.soil, gp)
    params = prepare_domain(dom, gp)
    slope, icept = 3.0, -5.0
    node_t = jnp.asarray(icept + slope * geom.zsum, jnp.float32)[:, None, :]
    node_t = jnp.tile(node_t, (1, 4, 1))
    moist = jnp.tile(jnp.asarray(dom.soil.init_moist, jnp.float32)[:, None, :],
                     (1, 4, 1))
    layer_t, _ = estimate_layer_ice(node_t, moist, geom, params, frozen=False)
    # analytic layer mean of linear profile = value at layer midpoint
    lsum = np.concatenate([np.zeros((2, 1)), np.cumsum(dom.soil.depth, 1)], 1)
    mid = (lsum[:, :-1] + lsum[:, 1:]) / 2
    np.testing.assert_allclose(np.asarray(layer_t[:, 0, :]),
                               icept + slope * mid, rtol=1e-4, atol=1e-3)


def test_explicit_profile_relaxes_toward_boundary():
    """Warm surface over cold column: profile must warm monotonically in time
    and stay bounded by [bottom, surface] temps."""
    gp = GlobalParams(nlayer=3, nnode=8, quick_flux=False, frozen_soil=True)
    dom = synthetic_domain(n_cell=2)
    geom = build_node_geometry(dom.soil, gp)
    params = prepare_domain(dom, gp)
    sh = (2, 3, 8)
    t0 = jnp.full(sh, -5.0)
    surf = jnp.full(sh[:2], 10.0)
    moist = jnp.tile(jnp.asarray(dom.soil.init_moist, jnp.float32)[:, None, :],
                     (1, 3, 1))
    nodep = distribute_node_moisture(moist, t0, geom, params, frozen=True)
    T = t0
    prev_mean = float(T.mean())
    for i in range(3):
        res = solve_t_profile_explicit(
            T, surf, nodep["kappa"], nodep["cs"], nodep["moist"],
            nodep["ice"], geom, params, 86400.0, noflux=False,
            exp_trans=False, frozen=True, ice_quirk=False)
        T = res.temp
        assert bool(jnp.isfinite(T).all())
        m = float(T.mean())
        if i == 0:
            assert m > prev_mean + 0.5  # first step must warm clearly
        else:
            assert m >= prev_mean - 1e-4  # then non-decreasing to equilibrium
        prev_mean = m
    assert float(T.max()) <= 10.0 + 1e-3
    assert float(T.min()) >= -5.0 - c_soil_dt_slack()


def c_soil_dt_slack():
    return 0.3  # root-solve bracket slack


def test_per_node_fallback_counts():
    """Forced non-convergence: an absurdly hot surface over a frozen column
    pushes the near-surface node's root outside the +-10C bisection bracket,
    tripping TFALLBACK there but NOT at depth — fbcount must vary by node
    (frozen_soil.c:404-418 counts Tfbcount per node)."""
    gp = GlobalParams(nlayer=3, nnode=8, quick_flux=False, frozen_soil=True)
    dom = synthetic_domain(n_cell=2)
    geom = build_node_geometry(dom.soil, gp)
    params = prepare_domain(dom, gp)
    sh = (2, 3, 8)
    t0 = jnp.full(sh, -5.0)
    surf = jnp.full(sh[:2], 300.0)   # absurd boundary -> unbracketable root
    moist = jnp.tile(jnp.asarray(dom.soil.init_moist, jnp.float32)[:, None, :],
                     (1, 3, 1))
    nodep = distribute_node_moisture(moist, t0, geom, params, frozen=True)
    res = solve_t_profile_explicit(
        t0, surf, nodep["kappa"], nodep["cs"], nodep["moist"],
        nodep["ice"], geom, params, 86400.0, noflux=False,
        exp_trans=False, frozen=True, ice_quirk=False)
    fb = np.asarray(res.fbcount)
    assert fb.shape == sh, "fbcount must be per-node"
    per_node = fb.sum(axis=(0, 1))
    assert per_node[1] > 0, "near-surface node must trip TFALLBACK"
    assert per_node[-1] == 0, "deep nodes must not trip"
    assert per_node.max() != per_node.min(), "flags must vary by node"


def test_unfrozen_water_curve():
    # colder -> less liquid; above 0 all liquid
    t = jnp.array([-10.0, -1.0, -0.1, 0.5])
    uf = maximum_unfrozen_water(t, 0.4, 10.0, 10.0)
    assert float(uf[3]) == pytest.approx(0.4)
    assert float(uf[0]) < float(uf[1]) < float(uf[2]) <= 0.4


class TestFrozenSoilMode:
    def test_full_fd_run(self):
        gp = GlobalParams(dt=24, nlayer=3, nnode=8, startyear=1995,
                          nrecs=40, full_energy=True, frozen_soil=True,
                          quick_flux=False)
        dom = synthetic_domain(n_cell=4)
        params = prepare_domain(dom, gp)
        geom = build_node_geometry(dom.soil, gp)
        ax = make_time_axis(1995, 1, 1, 0, 40, 24)
        forc = synthetic_forcing(40, 4)
        forc["air_temp"] -= 10.0  # push into freezing regime
        stack = make_forcing_stack(forc, ax)
        st = initial_state(dom, gp)
        fs, outs = jax.jit(lambda s, f: run(s, f, params, gp, geom))(st, stack)
        assert bool(jnp.isfinite(fs.node_temp).all())
        assert bool(jnp.isfinite(outs["OUT_RUNOFF"]).all())
        # some soil ice must form in a -10C-shifted winter
        assert float(fs.ice.max()) > 0.0
        # closure still holds (evap/ice interplay)
        assert float(jnp.abs(outs["OUT_WATER_ERROR"]).max()) < 0.05


class TestImplicitSolver:
    def test_implicit_matches_explicit_warming(self):
        from vic_tpu.physics.frozen_soil import solve_t_profile_implicit
        gp = GlobalParams(nlayer=3, nnode=8, quick_flux=False,
                          frozen_soil=True)
        dom = synthetic_domain(n_cell=2)
        geom = build_node_geometry(dom.soil, gp)
        params = prepare_domain(dom, gp)
        sh = (2, 3, 8)
        t0 = jnp.full(sh, -4.0)
        surf = jnp.full(sh[:2], 8.0)
        moist = jnp.tile(
            jnp.asarray(dom.soil.init_moist, jnp.float32)[:, None, :],
            (1, 3, 1))
        nodep = distribute_node_moisture(moist, t0, geom, params, frozen=True)
        imp = solve_t_profile_implicit(
            t0, surf, nodep["kappa"], nodep["cs"], nodep["moist"],
            nodep["ice"], geom, params, 86400.0, noflux=False,
            exp_trans=False, frozen=True)
        exp = solve_t_profile_explicit(
            t0, surf, nodep["kappa"], nodep["cs"], nodep["moist"],
            nodep["ice"], geom, params, 86400.0, noflux=False,
            exp_trans=False, frozen=True, ice_quirk=False)
        assert bool(jnp.isfinite(imp.temp).all())
        # both schemes integrate the same equation: agree within tolerance
        d = np.abs(np.asarray(imp.temp) - np.asarray(exp.temp))
        assert d.max() < 1.0, d.max()
        # implicit profile warms from the surface down
        assert float(imp.temp[..., 1].mean()) > -4.0

    def test_implicit_full_run(self):
        gp = GlobalParams(dt=24, nlayer=3, nnode=8, startyear=1995,
                          nrecs=20, full_energy=True, frozen_soil=True,
                          quick_flux=False, implicit=True)
        dom = synthetic_domain(n_cell=3)
        params = prepare_domain(dom, gp)
        geom = build_node_geometry(dom.soil, gp)
        ax = make_time_axis(1995, 1, 1, 0, 20, 24)
        forc = synthetic_forcing(20, 3)
        stack = make_forcing_stack(forc, ax)
        st = initial_state(dom, gp)
        fs, outs = jax.jit(lambda s, f: run(s, f, params, gp, geom))(st, stack)
        assert bool(jnp.isfinite(fs.node_temp).all())
        assert float(jnp.abs(outs["OUT_WATER_ERROR"]).max()) < 0.05


def test_spatial_frost_smooths_ice():
    """With a temperature spread, ice onset is gradual around 0C rather than
    a sharp switch: near-freezing layers hold less ice than the no-spread
    estimate at slightly-below-zero mean temps."""
    from vic_tpu.physics.frozen_soil import estimate_layer_ice
    gp = GlobalParams(nlayer=3, nnode=8, quick_flux=False, frozen_soil=True)
    dom = synthetic_domain(n_cell=2)
    geom = build_node_geometry(dom.soil, gp)
    params = prepare_domain(dom, gp)
    node_t = jnp.full((2, 3, 8), -0.05)   # just below freezing
    moist = jnp.tile(jnp.asarray(dom.soil.init_moist, jnp.float32)[:, None, :],
                     (1, 3, 1))
    _, ice_sharp = estimate_layer_ice(node_t, moist, geom, params, frozen=True)
    _, ice_spread = estimate_layer_ice(node_t, moist, geom, params,
                                       frozen=True, frost_subareas=10,
                                       frost_slope=2.0)
    assert bool(jnp.isfinite(ice_spread).all())
    # spread averages frozen and unfrozen subareas -> less ice than sharp
    assert float(ice_spread.sum()) < float(ice_sharp.sum())
    assert float(ice_spread.sum()) > 0.0


def test_find_zero_fronts():
    """Front depths are linear zero-crossing interpolations, scanned from the
    bottom node pair upward (soil_conduction.c:775 find_0_degree_fronts)."""
    from vic_tpu.physics.frozen_soil import find_zero_fronts
    # profile: +1 C at surface, -1 C at 1 m, back to +1 C at 3 m
    t = jnp.asarray([[1.0, -1.0, 1.0, 2.0]])
    z = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    tdepth, fdepth = find_zero_fronts(t, z)
    # thawing front (T>0 above, <=0 below) between nodes 0-1 at 0.5 m
    assert float(tdepth[0, 0]) == pytest.approx(0.5, abs=1e-6)
    # freezing front (T<0 above, >=0 below) between nodes 1-2 at 1.5 m
    assert float(fdepth[0, 0]) == pytest.approx(1.5, abs=1e-6)
    # no second fronts
    assert float(tdepth[0, 1]) == 0.0 and float(fdepth[0, 1]) == 0.0


def test_find_zero_fronts_order_and_cap():
    """Multiple crossings are collected bottom-up, capped at MAX_FRONTS=3."""
    from vic_tpu.physics.frozen_soil import find_zero_fronts
    t = jnp.asarray([[1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0]])
    z = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]])
    tdepth, fdepth = find_zero_fronts(t, z)
    # thaw crossings at 0.5, 2.5, 4.5, 6.5 -> bottom-up keeps 6.5, 4.5, 2.5
    assert [round(float(x), 3) for x in tdepth[0]] == [6.5, 4.5, 2.5]
    assert [round(float(x), 3) for x in fdepth[0]] == [7.5, 5.5, 3.5]


class TestReferenceIceQuirk:
    """frozen_soil.c:114-115 passes the per-LAYER max_moist/bubble/expt
    (mm units) into the node solve indexed BY NODE; the in-iteration ice
    content is therefore ~0 for shallow nodes and the E*(0-ice0) offset
    makes the root unbracketable whenever the node carries ice ->
    TFALLBACK pins sub-freezing shallow nodes in time (the dominant
    reference FROZEN_SOIL behaviour; see solve_t_profile_explicit)."""

    def _setup(self):
        gp = GlobalParams(nlayer=3, nnode=5, quick_flux=False,
                          frozen_soil=True)
        dom = synthetic_domain(n_cell=2)
        geom = build_node_geometry(dom.soil, gp)
        params = prepare_domain(dom, gp)
        sh = (2, 3, 5)
        t0 = jnp.full(sh, -2.0)
        # near-saturated column: the pin engages when rho_i*Lf*ice0 exceeds
        # the (A+C+D)*50.25 reach of root_brent's widest bracket — i.e. for
        # wet, strongly-frozen soils (ice0 >~ 0.33 here)
        moist = jnp.tile(
            jnp.asarray(dom.soil.max_moist, jnp.float32)[:, None, :],
            (1, 3, 1))
        nodep = distribute_node_moisture(moist, t0, geom, params, frozen=True)
        return gp, geom, params, t0, nodep

    def test_solver_arrays_alias_layers_then_nodes(self):
        gp, geom, params, _, _ = self._setup()
        # nodes 0..2: layer values in mm (hundreds); nodes >=3: node j-3's
        # volumetric values
        assert geom.solver_max_moist[0, 1] > 50.0
        np.testing.assert_allclose(geom.solver_max_moist[:, 3],
                                   geom.max_moist_node[:, 0])
        np.testing.assert_allclose(geom.solver_bubble[:, 4],
                                   geom.bubble_node[:, 1])

    def test_icy_subfreezing_nodes_pin(self):
        gp, geom, params, t0, nodep = self._setup()
        assert float(nodep["ice"].max()) > 0.0   # column carries ice
        surf = jnp.full((2, 3), 5.0)             # warm boundary
        res = solve_t_profile_explicit(
            t0, surf, nodep["kappa"], nodep["cs"], nodep["moist"],
            nodep["ice"], geom, params, 3600.0, noflux=False,
            exp_trans=False, frozen=True, ice_quirk=True)
        # node 2 (alpha=1.4m -> E*ice0 beyond the widest +-50.25 bracket):
        # pinned at its old temperature with fallback counted
        np.testing.assert_allclose(np.asarray(res.temp[..., 2]), -2.0)
        assert int(np.asarray(res.fbcount)[..., 2].min()) >= 1
        # node 1 brackets at +-40.25, cold-jumps to ~-32, and the post-sweep
        # runaway-cold-nose hack (frozen_soil.c:470-484) averages it to
        # 0.5*(T[0]+T[2]) = 1.5 — the full reference quirk chain
        np.testing.assert_allclose(np.asarray(res.temp[..., 1]), 1.5,
                                   atol=1e-5)
        assert int(np.asarray(res.fbcount)[..., 1].min()) >= 1
        # quirk-free solver DOES move the same nodes
        free = solve_t_profile_explicit(
            t0, surf, nodep["kappa"], nodep["cs"], nodep["moist"],
            nodep["ice"], geom, params, 10800.0, noflux=False,
            exp_trans=False, frozen=True, ice_quirk=False)
        assert float(jnp.abs(free.temp[..., 1] + 2.0).max()) > 1e-3
