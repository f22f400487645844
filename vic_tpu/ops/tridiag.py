"""Batched tridiagonal (Thomas) solver.

TPU-native replacement for the reference's dense Newton–Raphson + LU solve of the
implicit soil-heat system (/root/reference/newt_raph_func_fast.c:52-220, system of
<=20 unknowns per column). The heat-equation Jacobian is tridiagonal, so each NR
step reduces to a batched Thomas solve over the node axis; batching across
(cell x HRU) lanes turns the per-column scalar recurrences into full-width VPU
sweeps with the node axis unrolled by `lax.scan`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def thomas_solve(dl: jnp.ndarray, d: jnp.ndarray, du: jnp.ndarray,
                 b: jnp.ndarray) -> jnp.ndarray:
    """Solve tridiagonal systems along the LAST axis.

    dl: sub-diagonal   [..., n] (dl[..., 0] ignored)
    d : main diagonal  [..., n]
    du: super-diagonal [..., n] (du[..., n-1] ignored)
    b : right-hand side [..., n]

    All leading axes are batch. Forward elimination + back substitution as two
    `lax.scan`s over the node axis (n is small — <= MAX_NODES=50 — so the scan
    carries only [batch] vectors; every step is a fused VPU op over the batch).
    """
    n = d.shape[-1]
    # move node axis to front for scan: [n, batch...]
    dl_t = jnp.moveaxis(dl, -1, 0)
    d_t = jnp.moveaxis(d, -1, 0)
    du_t = jnp.moveaxis(du, -1, 0)
    b_t = jnp.moveaxis(b, -1, 0)

    # standard Thomas algorithm carrying the modified coefficients (c', d'):
    def forward(carry, x):
        cp_prev, dp_prev = carry
        dl_i, d_i, du_i, b_i = x
        m = d_i - dl_i * cp_prev
        cp_i = du_i / m
        dp_i = (b_i - dl_i * dp_prev) / m
        return (cp_i, dp_i), (cp_i, dp_i)

    zeros = jnp.zeros_like(d_t[0])
    (_, _), (cp, dp) = jax.lax.scan(forward, (zeros, zeros),
                                    (dl_t, d_t, du_t, b_t))

    def backward(carry, x):
        x_next = carry
        cp_i, dp_i = x
        x_i = dp_i - cp_i * x_next
        return x_i, x_i

    _, xs_rev = jax.lax.scan(backward, zeros, (cp, dp), reverse=True)
    return jnp.moveaxis(xs_rev, 0, -1)
