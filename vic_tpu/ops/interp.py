"""Interpolation utilities.

- Hermite cubic interpolation for sub-daily air temperature, matching the reference
  (/root/reference/calc_air_temperature.c:20-69 `hermite`/`hermint`).
- linear/exponential interpolation helpers (/root/reference/modify_Ksat.c:7-15
  `linear_interp`/`exp_interp`).

All functions are shape-polymorphic jnp ops usable inside jit/vmap.
"""
from __future__ import annotations

import jax.numpy as jnp


def hermite(x: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
            y1: jnp.ndarray, y2: jnp.ndarray,
            dy1: jnp.ndarray, dy2: jnp.ndarray) -> jnp.ndarray:
    """Cubic Hermite basis interpolation between (x1,y1,dy1) and (x2,y2,dy2)
    (calc_air_temperature.c:20-44)."""
    h = x2 - x1
    t = (x - x1) / h
    t2 = t * t
    t3 = t2 * t
    h01 = -2.0 * t3 + 3.0 * t2
    h00 = 1.0 - h01
    h10 = t3 - 2.0 * t2 + t
    h11 = t3 - t2
    return h00 * y1 + h01 * y2 + h * (h10 * dy1 + h11 * dy2)


def linear_interp(x, lx, ux, ly, uy):
    """(modify_Ksat.c linear_interp)"""
    return (x - lx) / (ux - lx) * (uy - ly) + ly


def exp_interp(x, lx, ux, ly, uy):
    """Exponential interpolation used for cold-start soil temperature profiles
    (modify_Ksat.c exp_interp)."""
    ly = jnp.asarray(ly)
    safe_ly = jnp.where(ly == 0.0, 1e-12, ly)
    return ly * jnp.exp((x - lx) / (ux - lx) * jnp.log(uy / safe_ly))
