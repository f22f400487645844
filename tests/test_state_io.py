import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vic_tpu.config import GlobalParams
from vic_tpu.io import native
from vic_tpu.io.state_io import (load_state, load_state_npz, save_state,
                                 save_state_npz)
from vic_tpu.model import make_forcing_stack, run
from vic_tpu.prepare import prepare_domain
from vic_tpu.state import initial_state
from vic_tpu.testing import synthetic_domain, synthetic_forcing
from vic_tpu.timeaxis import make_time_axis


def setup_run(n_rec=20, n_cell=3):
    gp = GlobalParams(dt=24, startyear=1995, nrecs=n_rec, full_energy=True)
    dom = synthetic_domain(n_cell=n_cell)
    params = prepare_domain(dom, gp)
    ax = make_time_axis(1995, 1, 1, 0, n_rec, 24)
    stack = make_forcing_stack(synthetic_forcing(n_rec, n_cell), ax)
    return gp, dom, params, stack


@pytest.mark.skipif(not native.available(), reason="no native netcdf")
def test_netcdf_state_roundtrip(tmp_path):
    gp, dom, params, stack = setup_run()
    st0 = initial_state(dom, gp)
    fs, _ = jax.jit(lambda s, f: run(s, f, params, gp))(st0, stack)
    path = str(tmp_path / "state.nc")
    save_state(path, fs, gp)
    restored = load_state(path, gp, template=st0)
    for k in ("moist", "swq", "node_temp", "wdew", "albedo"):
        np.testing.assert_allclose(np.asarray(getattr(restored, k)),
                                   np.asarray(getattr(fs, k)), rtol=1e-6)
    assert restored.melting.dtype == fs.melting.dtype
    assert restored.last_snow.dtype == fs.last_snow.dtype


def test_npz_state_roundtrip(tmp_path):
    gp, dom, params, stack = setup_run(n_rec=5)
    st0 = initial_state(dom, gp)
    path = str(tmp_path / "state.npz")
    save_state_npz(path, st0, gp)
    restored = load_state_npz(path, gp, template=st0)
    np.testing.assert_allclose(np.asarray(restored.moist),
                               np.asarray(st0.moist))


@pytest.mark.skipif(not native.available(), reason="no native netcdf")
def test_restart_is_exact(tmp_path):
    """Unlike the reference (restart documented non-reproducible), a vic-tpu
    checkpoint resume must be bit-exact vs the uninterrupted run."""
    gp, dom, params, stack = setup_run(n_rec=20)
    st0 = initial_state(dom, gp)
    runner = jax.jit(lambda s, f: run(s, f, params, gp))

    # uninterrupted
    fs_full, outs_full = runner(st0, stack)

    # split at rec 10 with a checkpoint in between
    half1 = {k: v[:10] for k, v in stack.items()}
    half2 = {k: v[10:] for k, v in stack.items()}
    fs_a, _ = runner(st0, half1)
    path = str(tmp_path / "mid.nc")
    save_state(path, fs_a, gp)
    fs_b = load_state(path, gp, template=st0)
    fs_resumed, outs_b = runner(fs_b, half2)

    np.testing.assert_allclose(np.asarray(fs_resumed.moist),
                               np.asarray(fs_full.moist), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(fs_resumed.swq),
                               np.asarray(fs_full.swq), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(outs_b["OUT_RUNOFF"][-1]),
                               np.asarray(outs_full["OUT_RUNOFF"][-1]),
                               rtol=0, atol=0)


@pytest.mark.parametrize("fmt", ["ASCII", "BINARY"])
def test_legacy_state_roundtrip(tmp_path, fmt):
    """Reference-format ASCII/BINARY state files (StateIOASCII.c /
    StateIOBinary.c / write_model_state.c) round-trip all prognostic
    fields."""
    gp, dom, params, stack = setup_run(n_rec=10)
    st0 = initial_state(dom, gp)
    fs, _ = jax.jit(lambda s, f: run(s, f, params, gp))(st0, stack)
    path = str(tmp_path / f"state_{fmt.lower()}")
    save_state(path, fs, gp, date=(1995, 1, 10), fmt=fmt, domain=dom)
    restored = load_state(path, gp, template=st0, domain=dom)
    for k in ("moist", "ice", "wdew", "swq", "surf_temp", "pack_temp",
              "surf_water", "pack_water", "density", "depth", "albedo",
              "cold_content", "node_temp", "tfoliage", "snow_canopy",
              "glac_water_storage", "glac_cum_mass_balance"):
        np.testing.assert_allclose(
            np.asarray(getattr(restored, k)), np.asarray(getattr(fs, k)),
            rtol=1e-6, atol=1e-9, err_msg=k)
    np.testing.assert_array_equal(np.asarray(restored.last_snow),
                                  np.asarray(fs.last_snow))
    np.testing.assert_array_equal(np.asarray(restored.melting),
                                  np.asarray(fs.melting))


@pytest.mark.parametrize("fmt", ["ASCII", "BINARY"])
def test_legacy_state_resume_matches(tmp_path, fmt):
    """Resuming from a legacy-format checkpoint reproduces the uninterrupted
    run closely. Not bit-exact: the reference state formats do not carry
    energy->LongUnderOut (the canopy-snow EB's below-canopy longwave), which
    is re-derived as sigma*T[0]^4 on warm start
    (initialize_model_state.c:291-293) — overstory-snow lanes therefore
    diverge slightly at the first resumed step, exactly as the reference
    does. vic-tpu's own NetCDF/npz checkpoints carry it and stay bit-exact
    (test_netcdf_state_roundtrip)."""
    gp, dom, params, stack = setup_run(n_rec=16)
    st0 = initial_state(dom, gp)
    runner = jax.jit(lambda s, f: run(s, f, params, gp))
    fs_full, _ = runner(st0, stack)
    half1 = {k: v[:8] for k, v in stack.items()}
    half2 = {k: v[8:] for k, v in stack.items()}
    fs_a, _ = runner(st0, half1)
    path = str(tmp_path / "legacy_mid")
    save_state(path, fs_a, gp, date=(1995, 1, 8), fmt=fmt, domain=dom)
    fs_b = load_state(path, gp, template=st0, domain=dom)
    fs_resumed, _ = runner(fs_b, half2)
    np.testing.assert_allclose(np.asarray(fs_resumed.moist),
                               np.asarray(fs_full.moist),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(fs_resumed.swq),
                               np.asarray(fs_full.swq), rtol=8e-2, atol=1e-3)


@pytest.mark.skipif(not native.available(), reason="no native netcdf")
def test_ref_netcdf_state_roundtrip(tmp_path):
    """Reference-schema NetCDF state (StateIONetCDF.c layout): write after a
    short run, read back, every prognostic field round-trips."""
    gp, dom, params, stack = setup_run()
    st0 = initial_state(dom, gp)
    fs, _ = jax.jit(lambda s, f: run(s, f, params, gp))(st0, stack)
    path = str(tmp_path / "state_ref.nc")
    save_state(path, fs, gp, domain=dom)        # domain => reference schema
    from vic_tpu.io.state_netcdf_ref import is_ref_netcdf_state
    assert is_ref_netcdf_state(path)
    restored = load_state(path, gp, template=st0, domain=dom)
    mask = np.asarray(dom.hru.mask)
    for k in ("moist", "swq", "node_temp", "wdew", "albedo", "density",
              "depth", "pack_water", "surf_water", "snow_canopy",
              "cold_content", "pack_temp", "surf_temp", "tfoliage",
              "glac_water_storage", "glac_surf_temp"):
        a = np.asarray(getattr(restored, k))
        b = np.asarray(getattr(fs, k))
        m = mask[..., None] if a.ndim == 3 else mask
        np.testing.assert_allclose(np.where(m, a, 0.0), np.where(m, b, 0.0),
                                   rtol=1e-6, atol=1e-10, err_msg=k)
    np.testing.assert_array_equal(
        np.where(mask, np.asarray(restored.melting), False),
        np.where(mask, np.asarray(fs.melting), False))
    np.testing.assert_array_equal(
        np.where(mask, np.asarray(restored.last_snow), 0),
        np.where(mask, np.asarray(fs.last_snow), 0))


@pytest.mark.skipif(not native.available(), reason="no native netcdf")
def test_ref_netcdf_state_schema(tmp_path):
    """The written file carries the StateIONetCDF.c dims/vars/attrs."""
    gp, dom, params, stack = setup_run(n_rec=2)
    st0 = initial_state(dom, gp)
    path = str(tmp_path / "state_ref.nc")
    save_state(path, st0, gp, domain=dom)
    with native.NetCDFFile(path, "r") as nc:
        for d, ln in [("bnds", 2), ("Nlayers", gp.nlayer),
                      ("frost_subareas", 10), ("lake_active_nodes", 21),
                      ("NgmbTerms", 4)]:
            assert nc.dim_len(d) == ln, d
        names = set(nc.var_names())
        for v in ("GRID_CELL", "VEG_TYPE_NUM", "NUM_BANDS", "LAYER_MOIST",
                  "LAYER_ICE_CONTENT", "HRU_VEG_VAR_WDEW", "ENERGY_T",
                  "SNOW_SWQ", "SOIL_DZ_NODE", "SOIL_ZSUM_NODE",
                  "GLAC_MASS_BALANCE_EQN_TERMS", "SNOW_MELTING",
                  "ENERGY_T_FBCOUNT"):
            assert v in names, v
        assert nc.dim_len("hru") >= 1
