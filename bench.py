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
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from vic_tpu.model import run

    n_cell = 32768
    n_rec = 60
    gp, params, stack, state = _build(n_cell=n_cell, n_rec=n_rec,
                                      full_energy=True, glacier=True)

    # params passed as a jit ARGUMENT (closed-over arrays would be baked
    # into the HLO as constants and overflow the remote-compile payload
    # at production domain sizes)
    def fwd(s, f, p):
        s1, outs = run(s, f, p, gp)
        # scalar digest: on the tunneled "axon" platform block_until_ready
        # does not actually block, so fetching a value that depends on
        # every output is the only honest completion barrier
        dig = sum(jnp.sum(v) for v in outs.values()) + jnp.sum(s1.moist)
        return s1, outs, dig

    fn = jax.jit(fwd)
    # compile + warmup
    s1, outs, dig = fn(state, stack, params)
    float(dig)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        s1, outs, dig = fn(state, stack, params)
        float(dig)
    dt = (time.perf_counter() - t0) / reps

    cell_steps_per_s = n_cell * n_rec / dt
    # Reference baseline: no published numbers exist (BASELINE.md), so we
    # measured it — the C reference built on this host runs 77.7k
    # cell-steps/s with OpenMP across the available cores (58.6k single
    # thread), tools/oracle.py FULL_ENERGY config.
    baseline_estimate = 7.77e4
    print(json.dumps({
        "metric": "grid-cell-timesteps/s per chip (full-energy+snow+glacier)",
        "value": round(cell_steps_per_s, 1),
        "unit": "cell-steps/s",
        "vs_baseline": round(cell_steps_per_s / baseline_estimate, 2),
    }))


if __name__ == "__main__":
    main()
