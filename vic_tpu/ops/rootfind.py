"""Batched scalar root-finding for energy-balance solves.

TPU-native replacement for the reference's scalar `RootBrent` functor machinery
(/root/reference/root_brent.c:97-280: MAXTRIES=5 bracket expansions of TSTEP=10,
then Brent iteration with tol = 2*eps*|b| + T, T=1e-7). One batched solver serves
all seven energy-balance residuals (surface, snowpack, canopy, atmos, lake-ice,
glacier, soil-node) — each lane of the batch carries its own bracket, its own
convergence flag, and its own fallback (the reference's TFALLBACK semantics become
`jnp.where(ok, root, fallback)` at the call site).

Design notes (pallas_guide.md):
- the residual is evaluated on the *whole* batch each iteration (VPU-friendly,
  no divergence); iteration count is bounded and the `lax.while_loop` exits as
  soon as every lane has converged, so typical cost is max-lane iterations;
- all branching inside the iteration is `jnp.where` masking — no data-dependent
  control flow reaches XLA.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Reference constants (root_brent.c:32-36)
MAXTRIES = 5       # bracket-expansion attempts
TSTEP = 10.0       # bracket expansion step
T_TOL = 1e-7       # absolute convergence tolerance addend


class RootResult(NamedTuple):
    root: jnp.ndarray       # solution (or best iterate) per lane
    converged: jnp.ndarray  # bool per lane: tolerance met
    bracketed: jnp.ndarray  # bool per lane: a sign change was found
    iterations: jnp.ndarray  # scalar int32: iterations used (max over lanes)


def _machine_eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps)


def expand_brackets(f: Callable, lo: jnp.ndarray, hi: jnp.ndarray,
                    max_tries: int = MAXTRIES, tstep: float = TSTEP,
                    active=None):
    """Vectorized bracket expansion (root_brent.c:183-244).

    Lanes whose [lo, hi] already brackets a sign change are left alone; others
    are symmetrically expanded by `tstep` up to `max_tries` times. `active`
    masks the lanes whose root actually matters (padding lanes / melt-branch
    lanes never bracket and would otherwise force every expansion pass); the
    while_loop exits as soon as every active lane brackets — the common case
    costs zero extra residual evaluations. Returns
    (lo, hi, f_lo, f_hi, bracketed).
    """
    # TPU strategy: a while_loop that exits as soon as every ACTIVE lane
    # brackets — the common case pays only the two endpoint evaluations.
    # (A single wide 2*(max_tries+1)-candidate probe was measured 3.6x
    # SLOWER on v5e: it always pays the full fan-out while this loop
    # almost always exits immediately.)
    f_lo = f(lo)
    f_hi = f(hi)
    act = jnp.ones(jnp.shape(f_lo), bool) if active is None else active

    def need_of(f_lo, f_hi):
        return jnp.logical_and(f_lo * f_hi >= 0.0, act)

    def cond(carry):
        i, lo, hi, f_lo, f_hi = carry
        return jnp.logical_and(i < max_tries, jnp.any(need_of(f_lo, f_hi)))

    def body(carry):
        i, lo, hi, f_lo, f_hi = carry
        need = need_of(f_lo, f_hi)
        new_lo = jnp.where(need, lo - tstep, lo)
        new_hi = jnp.where(need, hi + tstep, hi)
        new_f_lo = jnp.where(need, f(new_lo), f_lo)
        new_f_hi = jnp.where(need, f(new_hi), f_hi)
        return i + 1, new_lo, new_hi, new_f_lo, new_f_hi

    _, lo, hi, f_lo, f_hi = jax.lax.while_loop(
        cond, body, (jnp.int32(0), lo, hi, f_lo, f_hi))
    bracketed = f_lo * f_hi < 0.0
    if active is not None:
        bracketed = jnp.logical_and(bracketed, active)
    return lo, hi, f_lo, f_hi, bracketed


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def batched_brent(f: Callable, lo: jnp.ndarray, hi: jnp.ndarray,
                  max_iter: int = 60, max_tries: int = MAXTRIES,
                  tol: float = None, active=None) -> RootResult:
    """Find roots of ``f`` lane-wise on [lo, hi] with Brent's method.

    ``f`` maps an array of candidate points (same shape as lo/hi) to residuals;
    it must be total (return finite values) — the reference's ERROR-walking
    (root_brent.c:135-160) is instead handled by callers clamping their residuals.

    Matches root_brent.c convergence: |0.5*(c-b)| <= 2*eps*|b| + tol, or f(b)==0.
    Non-bracketed lanes return the midpoint with converged=False so callers can
    apply TFALLBACK.
    """
    lo = jnp.asarray(lo)
    dtype = lo.dtype
    eps = _machine_eps(dtype)
    if tol is None:
        # reference tol (root_brent.c:33) is 1e-7 in double; in float32 an
        # absolute 1e-7 C sits below the step quantization around |T|~10 C,
        # so tail lanes would spin to max_iter every solve. 1e-4 C is still
        # 4 orders below SURF_DT/SNOW_DT and any physical signal.
        tol = T_TOL if dtype == jnp.float64 else 1e-4

    # inactive lanes are treated as unbracketed from the start; their result
    # is the unconverged midpoint and the caller's TFALLBACK takes over
    a, b, fa, fb, bracketed = expand_brackets(f, lo, hi, max_tries,
                                              active=active)

    # Brent state per lane: a (contrapoint), b (best), c (previous best),
    # d/e (step history). Initialize c=a per classic formulation.
    c, fc = a, fa
    d = b - a
    e = b - a
    done0 = jnp.zeros_like(bracketed)

    def cond(carry):
        i, _, _, _, _, _, _, _, _, done = carry
        return jnp.logical_and(i < max_iter, ~jnp.all(done))

    def body(carry):
        i, a, b, c, fa, fb, fc, d, e, done = carry

        # Re-arrange so that b is the best iterate and [b, c] brackets the root
        # (root_brent.c:249-263).
        same_side = fb * fc > 0.0
        c = jnp.where(same_side, a, c)
        fc = jnp.where(same_side, fa, fc)
        d = jnp.where(same_side, b - a, d)
        e = jnp.where(same_side, d, e)

        swap = jnp.abs(fc) < jnp.abs(fb)
        a2 = jnp.where(swap, b, a)
        b2 = jnp.where(swap, c, b)
        c2 = jnp.where(swap, b, c)
        fa2 = jnp.where(swap, fb, fa)
        fb2 = jnp.where(swap, fc, fb)
        fc2 = jnp.where(swap, fb, fc)
        a, b, c, fa, fb, fc = a2, b2, c2, fa2, fb2, fc2

        tol_i = 2.0 * eps * jnp.abs(b) + tol
        m = 0.5 * (c - b)
        newly_done = jnp.logical_or(jnp.abs(m) <= tol_i, fb == 0.0)
        done = jnp.logical_or(done, newly_done)

        # Secant / inverse-quadratic step (root_brent.c Brent core), masked.
        use_bisect = jnp.logical_or(jnp.abs(e) < tol_i, jnp.abs(fa) <= jnp.abs(fb))
        s = fb / jnp.where(fa == 0.0, 1.0, fa)
        # secant (a == c) vs inverse quadratic interpolation
        is_secant = a == c
        p_sec = 2.0 * m * s
        q_sec = 1.0 - s
        q_iq = fa / jnp.where(fc == 0.0, 1.0, fc)
        r_iq = fb / jnp.where(fc == 0.0, 1.0, fc)
        p_iq = s * (2.0 * m * q_iq * (q_iq - r_iq) - (b - a) * (r_iq - 1.0))
        q_iq2 = (q_iq - 1.0) * (r_iq - 1.0) * (s - 1.0)
        p = jnp.where(is_secant, p_sec, p_iq)
        q = jnp.where(is_secant, q_sec, q_iq2)
        q = jnp.where(p > 0.0, -q, q)
        p = jnp.abs(p)

        interp_ok = jnp.logical_and(
            2.0 * p < 3.0 * m * q - jnp.abs(tol_i * q),
            p < jnp.abs(0.5 * e * q))
        take_interp = jnp.logical_and(~use_bisect, interp_ok)
        e_new = jnp.where(take_interp, d, m)
        d_new = jnp.where(take_interp,
                          p / jnp.where(q == 0.0, 1.0, q),
                          m)

        a_next = b
        fa_next = fb
        step = jnp.where(jnp.abs(d_new) > tol_i, d_new,
                         jnp.where(m > 0.0, tol_i, -tol_i))
        b_next = b + step
        fb_next = f(b_next)

        # Frozen lanes (done, or never bracketed) keep their state.
        frozen = jnp.logical_or(done, ~bracketed)
        a = jnp.where(frozen, a, a_next)
        b = jnp.where(frozen, b, b_next)
        fa = jnp.where(frozen, fa, fa_next)
        fb = jnp.where(frozen, fb, fb_next)
        d = jnp.where(frozen, d, d_new)
        e = jnp.where(frozen, e, e_new)
        return i + 1, a, b, c, fa, fb, fc, d, e, done

    init = (jnp.int32(0), a, b, c, fa, fb, fc, d, e,
            jnp.logical_or(done0, ~bracketed))
    i, a, b, c, fa, fb, fc, d, e, done = jax.lax.while_loop(cond, body, init)

    # Final convergence check for lanes that exited via the loop bound.
    tol_f = 2.0 * eps * jnp.abs(b) + tol
    converged = jnp.logical_and(
        bracketed,
        jnp.logical_or(jnp.abs(0.5 * (c - b)) <= tol_f, fb == 0.0))
    root = jnp.where(bracketed, b, 0.5 * (lo + hi))
    return RootResult(root=root, converged=converged, bracketed=bracketed,
                      iterations=i)


@partial(jax.jit, static_argnums=(0, 3))
def batched_bisection(f: Callable, lo: jnp.ndarray, hi: jnp.ndarray,
                      n_iter: int = 40) -> RootResult:
    """Plain fixed-budget bisection (cheap fallback / used for soil-node roots
    where the reference runs Brent on SoilThermalEqn, frozen_soil.c:397-404).
    Assumes [lo, hi] brackets a sign change per lane; lanes that do not bracket
    return the midpoint with converged=False."""
    f_lo = f(lo)
    f_hi = f(hi)
    bracketed = f_lo * f_hi < 0.0

    def body(_, carry):
        lo, hi, f_lo = carry
        mid = 0.5 * (lo + hi)
        f_mid = f(mid)
        go_left = f_lo * f_mid <= 0.0  # f_mid == 0: shrink hi onto the root
        new_lo = jnp.where(go_left, lo, mid)
        new_f_lo = jnp.where(go_left, f_lo, f_mid)
        new_hi = jnp.where(go_left, mid, hi)
        return new_lo, new_hi, new_f_lo

    lo_f, hi_f, _ = jax.lax.fori_loop(0, n_iter, body, (lo, hi, f_lo))
    root = 0.5 * (lo_f + hi_f)
    return RootResult(root=root, converged=bracketed, bracketed=bracketed,
                      iterations=jnp.int32(n_iter))
