"""Benchmark: grid-cells x timesteps / second on one chip.

Runs the flagship configuration (full-energy + snow + glacier physics,
multi-band HRU mosaic) over a synthetic domain and measures steady-state
throughput of the scanned step. The metric matches BASELINE.md's north star:
grid-cells x timesteps / second per chip. vs_baseline is reported against the
C reference's single-host multithreaded throughput once measured; until then
we report vs the documented OpenMP-desktop scale estimate (see BASELINE.md —
the reference publishes no numbers, so 1.0 = placeholder parity).
"""
import json
import time

import jax
import numpy as np

# Persistent compilation cache: first compile via the axon remote-compile
# tunnel takes minutes; cached reruns are seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from __graft_entry__ import _build
    from vic_tpu.model import run

    n_cell = 4096
    n_rec = 30
    gp, params, stack, state = _build(n_cell=n_cell, n_rec=n_rec,
                                      full_energy=True, glacier=True)

    fn = jax.jit(lambda s, f: run(s, f, params, gp))
    # compile + warmup
    s1, outs = fn(state, stack)
    jax.block_until_ready(outs["OUT_EVAP"])

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        s1, outs = fn(state, stack)
        jax.block_until_ready(outs["OUT_EVAP"])
    dt = (time.perf_counter() - t0) / reps

    cell_steps_per_s = n_cell * n_rec / dt
    # Reference baseline: no published numbers exist (BASELINE.md). We use a
    # measured-order-of-magnitude estimate for multithreaded C VIC full-energy
    # mode on a desktop CPU: ~2e4 cell-steps/s. Re-derive when the C oracle
    # binary is built.
    baseline_estimate = 2.0e4
    print(json.dumps({
        "metric": "grid-cell-timesteps/s per chip (full-energy+snow+glacier)",
        "value": round(cell_steps_per_s, 1),
        "unit": "cell-steps/s",
        "vs_baseline": round(cell_steps_per_s / baseline_estimate, 2),
    }))


if __name__ == "__main__":
    main()
