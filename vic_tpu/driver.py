"""Top-level run driver: the TPU-native equivalent of the reference main
program (/root/reference/vicNl.c:36-654: init sequencing -> cell loop ->
time loop -> state save -> output write).

Sequencing mirrors vicNl.c: read global params -> veg library -> soil cells ->
veg/band params per cell -> forcing ingest -> initial state (cold or warm) ->
scan over records in chunks -> aggregate + write outputs -> save state.

The OpenMP cell loop becomes the batched jitted scan; chunked scanning bounds
HBM for long runs (the reference's DISAGG_WRITE_CHUNK_SIZE duality,
vicNl.c:463-480).
"""
from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .config import GlobalParams, parse_global_param_file
from .params import Domain
from .timeaxis import TimeAxis, time_axis_from_params


@dataclass
class RunResult:
    outputs: dict          # aggregated [n_out, n_cell(, k)] host arrays
    final_state: object
    timeaxis: TimeAxis
    elapsed_s: float
    cell_steps_per_s: float
    gmb_results: list = None   # GmbResult per accumulation interval


def load_domain(gp: GlobalParams) -> Domain:
    """Build the Domain from reference-format parameter files
    (vicNl.c:237-282 readSoilData + initializeCell)."""
    from .io.snowband import read_snowband_file, default_bands
    from .io.soil import read_soil_file
    from .io.veg import build_hru_params, read_veglib, read_vegparam_cell_tiles

    soil = read_soil_file(gp.soil_file, gp, max_cells=gp.max_cells)
    veglib = read_veglib(gp.veglib_file)
    tiles = read_vegparam_cell_tiles(gp.veg_file, gp)
    hru = build_hru_params(tiles, soil.gridcel, veglib, gp, soil.depth)
    if gp.snow_band > 1 and gp.snowband_file:
        bands = read_snowband_file(gp.snowband_file, soil, gp.snow_band)
    else:
        bands = default_bands(soil, 1)
    return Domain(soil=soil, veglib=veglib, hru=hru, bands=bands)


def load_forcing(gp: GlobalParams, domain: Domain, timeaxis: TimeAxis) -> dict:
    """Read per-cell forcing files into [n_rec, n_cell] arrays
    (read_forcing_data.c / read_atmos_data.c; file naming prefix_lat_lng from
    make_in_and_outfiles.c:13).

    Requires a fully-specified forcing set (PREC, AIR_TEMP, WIND, SHORTWAVE,
    LONGWAVE, PRESSURE, VP) at the model step; partially-specified daily sets
    go through the MTCLIM disaggregation path (vic_tpu.forcing)."""
    from .forcing.ingest import ingest_forcing
    return ingest_forcing(gp, domain, timeaxis)


def load_state_any(path: str, gp, domain, template):
    """Warm-start state loader dispatching on file format: vic-tpu's
    NetCDF schema (io/state_io.py), or the reference's legacy ASCII /
    binary formats (StateIOASCII.c / StateIOBinary.c). The reference
    selects the format from BINARY_STATE_FILE (get_global_param.c:549);
    we sniff the file header instead so any reference-written state file
    warm-starts without extra configuration."""
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic[:3] == b"CDF" or magic == b"\x89HDF":
        from .io.state_io import load_state
        return load_state(path, gp, template=template, domain=domain)
    from .io.state_legacy import load_state_legacy
    # legacy ASCII opens with the save date as text ("1990 1 5\n");
    # legacy binary with a raw little-endian int32 year
    is_ascii = all(c in b"0123456789 \t\r\n-" for c in magic)
    return load_state_legacy(path, gp, domain, template,
                             fmt="ASCII" if is_ascii else "BINARY")


def run_simulation(gp: GlobalParams, domain: Optional[Domain] = None,
                   forcing: Optional[dict] = None,
                   init_state_path: Optional[str] = None,
                   initial=None,
                   chunk_recs: int = 0, chunk_cells: int = 0,
                   write_output: bool = True,
                   progress: bool = True, devices=None) -> RunResult:
    """Execute the full simulation. domain/forcing default to file ingest per
    the global parameter settings.

    devices: explicit device list for the cell mesh; defaults to all of
    jax.devices(). With >1 device the cell axis of every state/parameter/
    forcing array is sharded over a 1-D mesh — the TPU-native equivalent of
    the reference's OpenMP cell loop (vicNl.c:514-517) — with weight-0 clone
    cells padding the axis to a device multiple.

    chunk_cells (or GlobalParams.cell_chunk / CELL_CHUNK): cap on the number
    of cells per jit call. Domains larger than the cap are streamed through
    the SAME compiled program block-by-block (the last block is padded with
    clone cells so shapes stay constant — one compile serves every block),
    the cell-axis analog of the reference's per-cell loop (vicNl.c:514-517).
    Lets any domain size run regardless of per-program device limits."""
    import jax
    from .model import make_forcing_stack, make_step
    from .output import aggregate_outputs
    from .prepare import prepare_domain
    from .state import initial_state

    # NF sub-stepping (SURVEY.md A.1): when SNOW_STEP < TIME_STEP the
    # reference runs snow/energy physics NF times per model step. vic-tpu
    # runs the WHOLE column at SNOW_STEP resolution (a superset: drainage and
    # runoff also see sub-daily forcing) and aggregates outputs back to the
    # requested OUT_STEP.
    if gp.snow_step < gp.dt:
        if gp.out_step < gp.dt:
            gp = gp.replace(out_step=gp.dt)
        nf = gp.dt // gp.snow_step
        gp = gp.replace(dt=gp.snow_step,
                        nrecs=(gp.nrecs * nf if gp.nrecs > 0 else gp.nrecs))

    timeaxis = time_axis_from_params(gp)
    if domain is None:
        domain = load_domain(gp)
    if forcing is None:
        forcing = load_forcing(gp, domain, timeaxis)
    else:
        n_have = len(next(iter(forcing.values())))
        if n_have != timeaxis.nrecs:
            raise ValueError(
                f"supplied forcing has {n_have} records but the time axis "
                f"needs {timeaxis.nrecs} (dt={gp.dt} h after NF "
                f"sub-stepping — pre-stacked forcing must be at SNOW_STEP "
                f"resolution, or set snow_step == dt)")

    if gp.output_force:
        # OUTPUT_FORCE disaggregation-only mode (vicNl.c:420-490): run the
        # forcing pipeline and write disaggregated forcings, skip the model.
        return write_disaggregated_forcings(gp, domain, forcing, timeaxis)

    above_treeline = None
    if gp.compute_treeline:
        from .physics.hydrology_misc import compute_treeline, \
            july_avg_temperature
        july_t = (domain.soil.avg_july_air_temp if gp.july_tavg_supplied
                  else july_avg_temperature(forcing["air_temp"],
                                            timeaxis.month))
        if np.isfinite(july_t).all():
            above_treeline = compute_treeline(july_t, domain.bands.tfactor)

    params = prepare_domain(domain, gp, above_treeline=above_treeline)
    geom = None
    if gp.frozen_soil or not gp.quick_flux:
        # the node profile drives the ground-heat method whenever QUICK_FLUX
        # is FALSE, frozen or not (func_surf_energy_bal.c:167-242)
        from .physics.frozen_soil import build_node_geometry
        geom = build_node_geometry(domain.soil, gp)
    from .physics.hydrology_misc import build_zwt_curves
    import jax.numpy as jnp
    zwt_curves = {k: jnp.asarray(v, jnp.float32)
                  for k, v in build_zwt_curves(domain.soil).items()}

    lake_params = None
    if gp.lakes:
        if gp.lakeparam_file and os.path.exists(gp.lakeparam_file):
            from .io.lakeparam import read_lakeparam_file
            lake_params = read_lakeparam_file(gp.lakeparam_file, domain.soil,
                                              gp)
        else:
            from .physics.lake import make_lake_params
            lake_params = make_lake_params(domain.soil, gp)
        lake_params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32)
            if np.asarray(a).dtype.kind == "f" else jnp.asarray(a),
            lake_params)

    # cold-start surface temperature = first-step air temperature, clamped
    # >= -1 C inside initial_state (initialize_model_state.c:138-147)
    air0 = np.asarray(forcing["air_temp"])[0] if "air_temp" in forcing \
        else None
    state = initial_state(domain, gp, surf_temp_init=air0,
                          lake_params=lake_params, geom=geom)
    if initial is not None:
        state = initial
    elif gp.init_state and (init_state_path or gp.init_state_file):
        state = load_state_any(init_state_path or gp.init_state_file, gp,
                               domain, state)

    # Pass the per-cell parameter pytrees through the jit boundary as
    # ARGUMENTS: a closed-over concrete array is baked into the HLO as a
    # constant, which bloats the program (and overflows the remote-compile
    # payload limit beyond ~50k cells).
    # Trace-time output pruning: with an explicit OUTVAR configuration only
    # the requested variables (+ closure telemetry) are returned, letting XLA
    # dead-code-eliminate unused diagnostics. The reference fills the whole
    # out_data table every step regardless (put_data.c).
    outvars = None
    if gp.outfiles:
        outvars = {v for of in gp.outfiles for v in of.varnames}

    def scan_chunk(st, forc_stack, prm, gm, zw, lkp):
        step = make_step(prm, gp, gm, zw, lkp, outvars=outvars)
        return jax.lax.scan(step, st, forc_stack)

    scan_jit = jax.jit(scan_chunk)
    n_rec = timeaxis.nrecs

    # glacier mass-balance accumulation schedule: chunk boundaries at each
    # accumulation-interval start so we can fit + reset (accumulateGlacier
    # MassBalance.c; SURVEY.md SS2.4)
    gmb_boundaries = set()
    use_gmb = gp.glacier_id >= 0 and gp.glacier_accum_start_year > 0
    if use_gmb:
        from .physics.gmb import GmbAccumulator
        probe = GmbAccumulator(gp)
        for r in range(n_rec - 1):
            if probe.boundary(int(timeaxis.year[r + 1]),
                              int(timeaxis.month[r + 1]),
                              int(timeaxis.day[r + 1])):
                gmb_boundaries.add(r + 1)

    chunk = chunk_recs if chunk_recs > 0 else n_rec
    starts = sorted(set(range(0, n_rec, chunk)) | gmb_boundaries)

    # ---- cell-axis chunking (vicNl.c:514-517 analog): cells are streamed
    # through ONE compiled program in blocks of <= cc; the last block is
    # padded to cc with clone cells so shapes stay constant. ----
    n_cell_real = domain.n_cell
    devs = list(devices) if devices is not None else jax.devices()
    cc = chunk_cells if chunk_cells > 0 else getattr(gp, "cell_chunk", 0)
    cc = n_cell_real if cc <= 0 else min(cc, n_cell_real)
    check_memory_budget(gp, domain, chunk, n_cell=cc, progress=progress)

    from .parallel import (cell_mesh, pad_cell_tree, pad_cells,
                           shard_cell_axis, shard_forcing, slice_cell_tree,
                           unpad_cell_tree)
    # ---- multi-device cell sharding (SURVEY.md SS2.9): the reference's
    # OpenMP-over-cells loop becomes a 1-D 'cell' mesh; each block's cell
    # axis is padded to a device multiple with clones of the last cell
    # (physics stays well-conditioned; outputs/state are un-padded below).
    mesh = cell_mesh(devices=devs) if len(devs) > 1 else None
    n_block_run = pad_cells(cc, len(devs)) if mesh is not None else cc
    if progress and mesh is not None:
        print(f"  cell mesh: {n_cell_real} cells over {len(devs)} devices "
              f"({cc} per block, +{n_block_run - cc} pad)", file=sys.stderr)
    if progress and cc < n_cell_real:
        print(f"  cell chunking: {n_cell_real} cells in blocks of {cc}",
              file=sys.stderr)

    def run_block(b0, b1, st):
        """All records for cells [b0:b1): returns (final state np tree,
        outs np dict [n_rec, b1-b0, ...], gmb results)."""
        nb = b1 - b0
        n_pad = n_block_run - nb
        trees = [slice_cell_tree(t, b0, b1, n_cell_real)
                 for t in (params, geom, zwt_curves, lake_params)]
        frc = slice_cell_tree(forcing, b0, b1, n_cell_real, axis=1)
        st = slice_cell_tree(st, b0, b1, n_cell_real)
        if n_pad > 0:
            trees = [pad_cell_tree(t, nb, n_pad) for t in trees]
            st = pad_cell_tree(st, nb, n_pad)
            frc = pad_cell_tree(frc, nb, n_pad, axis=1)
        if mesh is not None:
            trees = [shard_cell_axis(t, mesh) if t is not None else None
                     for t in trees]
            st = shard_cell_axis(st, mesh)
        prm, gm, zw, lkp = trees

        gmb = None
        if use_gmb:
            from .physics.gmb import GmbAccumulator
            gmb = GmbAccumulator(gp)
        all_outs = []
        for si, start in enumerate(starts):
            end = starts[si + 1] if si + 1 < len(starts) else n_rec
            sub_ax = TimeAxis(*[a[start:end] for a in
                                (timeaxis.year, timeaxis.month, timeaxis.day,
                                 timeaxis.hour, timeaxis.day_in_year)])
            stack = make_forcing_stack(
                {k: v[start:end] for k, v in frc.items()}, sub_ax)
            if mesh is not None:
                stack = shard_forcing(stack, mesh)
            st, outs = scan_jit(st, stack, prm, gm, zw, lkp)
            all_outs.append(jax.tree_util.tree_map(
                lambda a: np.asarray(a)[:, :nb]
                if a.ndim >= 2 and a.shape[1] == n_block_run
                else np.asarray(a), outs))
            if gmb is not None and end in gmb_boundaries | {n_rec}:
                res = gmb.maybe_emit(
                    timeaxis, end - 1,
                    np.asarray(st.glac_cum_mass_balance)[:nb],
                    np.asarray(prm.band_elev)[:nb],
                    np.asarray(prm.is_glacier)[:nb])
                if res is not None:
                    import dataclasses
                    st = dataclasses.replace(
                        st, glac_cum_mass_balance=jax.numpy.zeros_like(
                            st.glac_cum_mass_balance))
                    if progress:
                        print(f"  GMB fit at {res.date}: b0={res.b0}, "
                              f"b1={res.b1}, b2={res.b2}", file=sys.stderr)
            if progress:
                print(f"  cells {b0}..{b1} records {start}..{end} done",
                      file=sys.stderr)
        jax.block_until_ready(st.moist)
        st = unpad_cell_tree(jax.tree_util.tree_map(np.asarray, st),
                             n_block_run, nb)
        outs = {k: np.concatenate([o[k] for o in all_outs], axis=0)
                for k in all_outs[0]}
        return st, outs, gmb.results if gmb is not None else []

    t0 = time.perf_counter()
    block_states, block_outs, gmb_results = [], [], []
    for b0 in range(0, n_cell_real, cc):
        bst, bouts, bres = run_block(b0, min(b0 + cc, n_cell_real), state)
        block_states.append(bst)
        block_outs.append(bouts)
        gmb_results.extend(bres)
    elapsed = time.perf_counter() - t0

    if len(block_states) == 1:
        state = block_states[0]
        outs = block_outs[0]
    else:
        state = jax.tree_util.tree_map(
            lambda *xs: (np.concatenate(xs, axis=0)
                         if hasattr(xs[0], "ndim") and xs[0].ndim >= 1
                         else xs[0]), *block_states)
        outs = {k: np.concatenate([o[k] for o in block_outs], axis=1)
                for k in block_outs[0]}
    steps_per_out = max(1, gp.out_step // gp.dt)
    agg = aggregate_outputs(outs, steps_per_out, alma=gp.alma_output,
                            out_dt_sec=gp.out_step * 3600.0)

    if progress:
        try:
            stats = devs[0].memory_stats()
            if stats and "peak_bytes_in_use" in stats:
                print(f"  peak device memory: "
                      f"{stats['peak_bytes_in_use'] / 1e9:.2f} GB",
                      file=sys.stderr)
        except Exception:
            pass

    if write_output:
        write_outputs(gp, domain, timeaxis, agg, steps_per_out)

    if gp.save_state and gp.state_name:
        from .io.state_io import save_state
        date = (int(timeaxis.year[-1]), int(timeaxis.month[-1]),
                int(timeaxis.day[-1]))
        save_state(_state_path(gp, date), state, gp, date=date,
                   fmt=gp.state_format, domain=domain, geom=geom,
                   lake_params=lake_params)

    n_cell = domain.n_cell
    return RunResult(outputs=agg, final_state=state, timeaxis=timeaxis,
                     elapsed_s=elapsed,
                     cell_steps_per_s=n_cell * n_rec / max(elapsed, 1e-9),
                     gmb_results=gmb_results)


def write_disaggregated_forcings(gp, domain, forcing, timeaxis) -> RunResult:
    """OUTPUT_FORCE mode: emit the disaggregated forcing set
    (write_forcing_file.c), chunked over time (DISAGG_WRITE_CHUNK_SIZE)."""
    t0 = time.perf_counter()
    from .forcing.mtclim import svp_mtclim
    outs = {
        "OUT_PREC": forcing["prec"],
        "OUT_AIR_TEMP": forcing["air_temp"],
        "OUT_SHORTWAVE": forcing["shortwave"],
        "OUT_LONGWAVE": forcing["longwave"],
        "OUT_PRESSURE": forcing["pressure"] / 1000.0,
        "OUT_VP": forcing["vp"] / 1000.0,
        "OUT_DENSITY": forcing["density"],
        "OUT_WIND": forcing["wind"],
        "OUT_REL_HUMID": 100.0 * forcing["vp"]
        / np.maximum(svp_mtclim(forcing["air_temp"]), 1e-10),
    }
    lats, lons = domain.soil.lat, domain.soil.lng
    n_rec = timeaxis.nrecs
    if gp.output_format.upper() == "NETCDF":
        from .output import NetCDFOutputWriter
        path = os.path.join(gp.result_dir, gp.netcdf_output_filename)
        w = NetCDFOutputWriter(path, lats, lons, list(outs.keys()),
                               nlayer=gp.nlayer,
                               compress=5 if gp.compress else 0)
        chunk = max(1, gp.disagg_write_chunk_size)
        tvals = np.arange(n_rec, dtype=float) * (gp.dt / 24.0)
        for start in range(0, n_rec, chunk):
            end = min(start + chunk, n_rec)
            sub = {k: v[start:end] for k, v in outs.items()}
            w.write_all(sub, tvals[start:end])
        w.close()
    else:
        from .output import AsciiOutputWriter
        w = AsciiOutputWriter(gp.result_dir, "full_data", lats, lons,
                              list(outs.keys()),
                              grid_decimal=gp.grid_decimal,
                              compress=gp.compress)
        w.write_all(outs, timeaxis)
        w.close()
    elapsed = time.perf_counter() - t0
    return RunResult(outputs=outs, final_state=None, timeaxis=timeaxis,
                     elapsed_s=elapsed,
                     cell_steps_per_s=domain.n_cell * n_rec
                     / max(elapsed, 1e-9), gmb_results=[])


def _state_path(gp, date):
    y, m, d = date
    suffix = f"_{y:04d}{m:02d}{d:02d}"
    base = gp.state_name
    if gp.state_format.upper() == "NETCDF" and not base.endswith(".nc"):
        return base + suffix + ".nc"
    return base + suffix


def check_memory_budget(gp, domain, chunk_recs, n_cell=None, progress=True):
    """HBM/RAM budget estimate (vicNl.c:218-235 MAX_MEMORY governor).

    The reference warns when cells * 96 kB exceeds MAX_MEMORY GB. Here the
    dominant terms are the scan carry (state pytree), the device-resident
    forcing chunk, and the stacked per-chunk outputs; a 2x factor covers XLA
    temporaries. Warns (never aborts) with a suggested --chunk, and checks
    against the accelerator's HBM when discoverable. n_cell overrides the
    domain cell count (cell-axis chunking budgets per block)."""
    if n_cell is None:
        n_cell = domain.n_cell
    max_hru = domain.hru.mask.shape[1]
    nl, nn = gp.nlayer, max(gp.nnode, 3)
    state_b = n_cell * max_hru * (4 * (30 + 6 * nl + nn))
    forcing_b = chunk_recs * n_cell * 9 * 4
    outputs_b = chunk_recs * n_cell * (90 + 3 * nl + nn) * 4
    est_gb = 2.0 * (state_b + forcing_b + outputs_b) / 1e9

    budget_gb = gp.max_memory if gp.max_memory > 0 else None
    if budget_gb is None:
        try:
            import jax
            stats = jax.devices()[0].memory_stats()
            if stats and "bytes_limit" in stats:
                budget_gb = stats["bytes_limit"] / 1e9
        except Exception:
            pass
    if budget_gb and est_gb > budget_gb and progress:
        good_chunk = max(1, int(chunk_recs * budget_gb / max(est_gb, 1e-9)))
        print(f"WARNING: estimated device memory {est_gb:.2f} GB exceeds "
              f"budget {budget_gb:.2f} GB "
              f"(MAX_MEMORY governor, vicNl.c:218-235); "
              f"consider --chunk {good_chunk}", file=sys.stderr)
    return est_gb


def write_outputs(gp, domain, timeaxis, agg, steps_per_out):
    """Dispatch to the configured output format (WriteOutputContext.c)."""
    var_names = list(agg.keys())
    if gp.outfiles:
        sel = [v for of in gp.outfiles for v in of.varnames]
        var_names = [v for v in var_names if v in sel] or var_names
    lats, lons = domain.soil.lat, domain.soil.lng

    # output-interval timestamps (days since simulation start)
    n_out = len(next(iter(agg.values())))
    tvals = np.arange(n_out, dtype=float) * (gp.out_step / 24.0)

    if gp.output_format.upper() == "NETCDF":
        from .io import native
        if not native.available():
            raise RuntimeError("NETCDF output requested but libnetcdf missing")
        path = os.path.join(gp.result_dir, gp.netcdf_output_filename)
        import jax
        n_shards = max(gp.output_shards, jax.process_count())
        sel = {v: agg[v] for v in var_names}
        if n_shards > 1:
            # per-host sharded output (parallel/io_shards.py): each process
            # writes its cell blocks; merge offline with
            # tools/merge_output_shards.py
            from .parallel.io_shards import write_sharded_netcdf
            write_sharded_netcdf(
                path, lats, lons, sel, tvals, n_shards,
                nlayer=gp.nlayer, nnode=max(gp.nnode, 3),
                nband=max(gp.snow_band, 1),
                global_attrs=dict(gp.netcdf_attributes),
                compress=5 if gp.compress else 0)
        else:
            from .output import NetCDFOutputWriter
            w = NetCDFOutputWriter(
                path, lats, lons, var_names, nlayer=gp.nlayer,
                nnode=max(gp.nnode, 3), nband=max(gp.snow_band, 1),
                global_attrs=dict(gp.netcdf_attributes),
                compress=5 if gp.compress else 0)
            w.write_all(agg, tvals)
            w.close()
    elif gp.output_format.upper() == "BINARY":
        from .output import BinaryOutputWriter
        n_out2 = len(next(iter(agg.values())))
        out_ax = TimeAxis(*[a[::steps_per_out][:n_out2] for a in
                            (timeaxis.year, timeaxis.month, timeaxis.day,
                             timeaxis.hour, timeaxis.day_in_year)])
        w = BinaryOutputWriter(gp.result_dir, "fluxes", lats, lons, var_names,
                               grid_decimal=gp.grid_decimal, nrecs=n_out2,
                               out_dt=gp.out_step if gp.out_step else gp.dt,
                               start_date=(int(out_ax.year[0]),
                                           int(out_ax.month[0]),
                                           int(out_ax.day[0]),
                                           int(out_ax.hour[0])),
                               alma_output=gp.alma_output,
                               outvar_specs=gp.outvar_specs)
        w.write_all(agg, out_ax)
        w.close()
        return
    else:
        from .output import AsciiOutputWriter
        w = AsciiOutputWriter(gp.result_dir, "fluxes", lats, lons, var_names,
                              grid_decimal=gp.grid_decimal,
                              compress=gp.compress)
        out_ax = TimeAxis(*[a[::steps_per_out][:n_out] for a in
                            (timeaxis.year, timeaxis.month, timeaxis.day,
                             timeaxis.hour, timeaxis.day_in_year)])
        w.write_all(agg, out_ax)
        w.close()


def main(argv=None):
    """CLI entry (cmd_proc.c: vicNl -g <global-file>)."""
    import argparse
    ap = argparse.ArgumentParser(
        prog="vic-tpu",
        description="TPU-native VIC-GL hydrologic model")
    ap.add_argument("-g", "--global-file",
                    help="global parameter file (reference grammar)")
    ap.add_argument("-o", "--options", action="store_true",
                    help="print run options and exit (display_current_settings)")
    ap.add_argument("-v", "--version", action="store_true")
    ap.add_argument("--chunk", type=int, default=0,
                    help="records per scan chunk (memory bound)")
    ap.add_argument("--cell-chunk", type=int, default=0,
                    help="max cells per jit call (program-size bound); "
                         "larger domains stream block-by-block")
    args = ap.parse_args(argv)

    if args.version:
        from . import __version__
        print(f"vic-tpu {__version__}")
        return 0
    if not args.global_file:
        ap.error("the following arguments are required: -g/--global-file")
    gp = parse_global_param_file(args.global_file)
    if args.options:
        for k, v in sorted(vars(gp).items()):
            print(f"{k:32s} {v}")
        return 0
    res = run_simulation(gp, chunk_recs=args.chunk,
                         chunk_cells=args.cell_chunk)
    print(f"Model execution time: {res.elapsed_s:.3f} s "
          f"({res.cell_steps_per_s:.0f} cell-steps/s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
