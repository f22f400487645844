"""Frozen-soil finite-difference thermal solver on the node profile.

Batched re-expression of /root/reference/frozen_soil.c and the node plumbing in
/root/reference/soil_conduction.c:

- node geometry (initialize_model_state.c:505-660): QUICK_FLUX 3-node,
  linear ([0, d0, 2*d0, ..., dp]) and EXP_TRANS (Zsum = exp(b*i)-1) spacings;
- set_node_parameters / distribute_node_moisture_properties
  (soil_conduction.c:142-440): node->layer parameter gathers, node moisture/
  ice/conductivity/heat capacity;
- solve_T_profile explicit scheme (frozen_soil.c:105-230 coefficient setup,
  305-430 Gauss-Seidel sweep; Cherkauer & Lettenmaier 1999 eq. 8) with the
  per-node root solve for sub-freezing nodes (SoilThermalEqn,
  soil_thermal_eqn.c) and TFALLBACK;
- solve_T_profile_implicit (frozen_soil.c:229-300 + fda_heat_eqn residual):
  Newton-Raphson over the node system with a batched tridiagonal Jacobian
  solve (replacing newt_raph_func_fast.c's dense LU);
- estimate_layer_ice_content (soil_conduction.c:444-616): layer-average T and
  ice from node temperatures.

TPU-first structure: everything data-dependent about the node/layer mapping
(which layer a node falls in, the trapezoid sample points for layer averaging)
is PRECOMPUTED host-side per cell into gather-index/weight arrays
(`NodeGeometry`), so the device kernels are pure batched gathers + arithmetic.
The Gauss-Seidel sweep runs under `lax.while_loop` with a max-diff convergence
predicate; sub-freezing nodes use fixed-budget bisection on [T0-SOIL_DT,
T0+SOIL_DT] instead of scalar Brent.
"""
from __future__ import annotations

from dataclasses import dataclass, fields
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from .soil_thermal import (maximum_unfrozen_water, soil_conductivity,
                           volumetric_heat_capacity)


def _pytreeify(cls):
    flds = [f.name for f in fields(cls)]
    jax.tree_util.register_pytree_node(
        cls, lambda o: (tuple(getattr(o, n) for n in flds), None),
        lambda _, ch: cls(*ch))
    return cls


@_pytreeify
@dataclass
class NodeGeometry:
    """Static node-profile geometry, [n_cell, n_node] unless noted."""
    zsum: np.ndarray          # node depth (m)
    dz: np.ndarray            # node thickness (m)
    alpha: np.ndarray         # Zsum[j+1]-Zsum[j-1] (padded; soil_conduction.c:266)
    beta: np.ndarray          # Zsum[j]-Zsum[j-1]
    gamma: np.ndarray         # Zsum[j+1]-Zsum[j]
    node_layer: np.ndarray    # int32: soil layer containing each node
    on_boundary: np.ndarray   # bool: node exactly on a layer interface
    max_moist_node: np.ndarray  # mm/mm
    expt_node: np.ndarray
    bubble_node: np.ndarray
    # layer-averaging samples: [n_cell, n_layer, ns]
    samp_i0: np.ndarray       # int32 lower node index
    samp_w: np.ndarray        # weight of node i0+1 (1-w on i0)
    samp_trap: np.ndarray     # trapezoid weight / layer depth
    bexp: np.ndarray          # [n_cell] EXP_TRANS exponent (0 if unused)
    # REFERENCE QUIRK ARRAYS (see solve_t_profile_explicit docstring):
    # frozen_soil.c:114-115 passes the per-LAYER soil_con->max_moist (mm),
    # bubble and expt arrays to the node solver, indexed BY NODE.  For node
    # j < MAX_LAYERS(=3) that reads layer j's values in the wrong units
    # (mm where mm/mm is expected); for j >= 3 the out-of-bounds read lands
    # deterministically in the *_node array declared right after it in
    # soil_con_struct (vicNl_def.h:919-940), i.e. node j-3's volumetric
    # values.  These arrays reproduce that aliasing exactly.
    solver_max_moist: np.ndarray = None   # [n_cell, nn]
    solver_bubble: np.ndarray = None
    solver_expt: np.ndarray = None

    @property
    def n_node(self):
        return self.zsum.shape[1]


def build_node_geometry(soil, gp) -> NodeGeometry:
    """Host-side construction (initialize_model_state.c:505-660 +
    set_node_parameters + the layer-averaging sample maps)."""
    n_cell = soil.n_cell
    nn = max(gp.nnode, 3)
    nl = gp.nlayer
    depth = np.asarray(soil.depth, np.float64)
    dp = np.asarray(soil.dp, np.float64)

    zsum = np.zeros((n_cell, nn))
    dz = np.zeros((n_cell, nn))
    bexp = np.zeros(n_cell)

    if gp.quick_flux:
        # QUICK_FLUX 3-node geometry (initialize_model_state.c:507-513)
        zsum[:, 0] = 0.0
        zsum[:, 1] = depth[:, 0]
        zsum[:, 2] = dp
        dz[:, 0] = depth[:, 0]
        dz[:, 1] = depth[:, 0]
        dz[:, 2] = 2.0 * (dp - 1.5 * depth[:, 0])
        for j in range(3, nn):
            zsum[:, j] = dp  # unused nodes pinned at damping depth
    elif gp.exp_trans:
        bexp = np.log(dp + 1.0) / (nn - 1)
        for j in range(nn):
            zsum[:, j] = np.exp(bexp * j) - 1.0
        dz[:, :-1] = np.diff(zsum, axis=1)
        dz[:, -1] = dz[:, -2]
    else:
        # linear-ish spacing (initialize_model_state.c:560-600)
        d0 = depth[:, 0]
        zsum[:, 0] = 0.0
        zsum[:, 1] = d0
        zsum[:, 2] = 2.0 * d0
        dz[:, 0] = d0
        dz[:, 1] = d0
        dz[:, 2] = d0
        tmpdp = dp - d0 * 2.5
        tmpadj = 3.5
        z = 2.0 * d0
        for j in range(3, nn - 1):
            dz[:, j] = tmpdp / (nn - tmpadj)
            z = z + (dz[:, j] + dz[:, j - 1]) / 2.0
            zsum[:, j] = z
        dz[:, nn - 1] = (dp - z - dz[:, nn - 2] / 2.0) * 2.0
        zsum[:, nn - 1] = z + (dz[:, nn - 2] + dz[:, nn - 1]) / 2.0

    # finite-difference spacings (soil_conduction.c:262-275)
    alpha = np.zeros((n_cell, nn))
    beta = np.zeros((n_cell, nn))
    gamma = np.zeros((n_cell, nn))
    for j in range(1, nn - 1):
        alpha[:, j] = zsum[:, j + 1] - zsum[:, j - 1]
        beta[:, j] = zsum[:, j] - zsum[:, j - 1]
        gamma[:, j] = zsum[:, j + 1] - zsum[:, j]
    # NOFLUX bottom-node spacings (soil_conduction.c:272-274)
    alpha[:, nn - 1] = 2.0 * (zsum[:, nn - 1] - zsum[:, nn - 2])
    beta[:, nn - 1] = zsum[:, nn - 1] - zsum[:, nn - 2]
    gamma[:, nn - 1] = zsum[:, nn - 1] - zsum[:, nn - 2]
    alpha = np.maximum(alpha, 1e-6)
    beta = np.maximum(beta, 1e-6)
    gamma = np.maximum(gamma, 1e-6)

    # node -> layer mapping: the reference's walk (set_node_parameters /
    # distribute_node_moisture_properties, soil_conduction.c:91-118,370-435)
    # advances the layer index at the END of each node iteration, checking
    # Zsum_node[nidx] > Lsum + depth[lidx] — so a node strictly below a
    # layer boundary still reads the layer ABOVE it (e.g. with depths
    # [0.1,0.3,1.0] and nodes [0,0.1,0.2,...], node 2 at z=0.2 reads layer
    # 0, not layer 1).  This lag shifts node moisture/kappa/max_moist and
    # is load-bearing for FROZEN_SOIL parity; replicated literally.
    lsum = np.concatenate([np.zeros((n_cell, 1)), np.cumsum(depth, 1)], 1)
    node_layer = np.zeros((n_cell, nn), np.int32)
    on_boundary = np.zeros((n_cell, nn), bool)
    for ci in range(n_cell):
        lidx = 0
        cum = 0.0
        past_bottom = False
        for j in range(nn):
            z = zsum[ci, j]
            if (j != 0 and lidx != nl - 1
                    and abs(z - (cum + depth[ci, lidx])) < 1e-12):
                on_boundary[ci, j] = True
            node_layer[ci, j] = lidx
            if z > cum + depth[ci, lidx] + 1e-12 and not past_bottom:
                cum += depth[ci, lidx]
                lidx += 1
                if lidx == nl:
                    past_bottom = True
                    lidx = nl - 1

    gidx = np.arange(n_cell)[:, None]
    max_moist_vol = np.asarray(soil.max_moist) / (depth * 1000.0)
    max_moist_node = max_moist_vol[gidx, node_layer]
    expt_node = np.asarray(soil.expt)[gidx, node_layer]
    bubble_node = np.asarray(soil.bubble)[gidx, node_layer]
    # boundary nodes average the two adjacent layers (set_node_parameters)
    nl_up = np.maximum(node_layer - 0, 0)
    nl_dn = np.minimum(node_layer + 1, nl - 1)
    for arr, src in ((max_moist_node, max_moist_vol),
                     (expt_node, np.asarray(soil.expt)),
                     (bubble_node, np.asarray(soil.bubble))):
        avg = (src[gidx, nl_up] + src[gidx, nl_dn]) / 2.0
        arr[on_boundary] = avg[on_boundary]

    # layer-averaging trapezoid samples (estimate_layer_ice_content)
    ns = nn + 2
    samp_i0 = np.zeros((n_cell, nl, ns), np.int32)
    samp_w = np.zeros((n_cell, nl, ns))
    samp_trap = np.zeros((n_cell, nl, ns))
    for ci in range(n_cell):
        for l in range(nl):
            z_top, z_bot = lsum[ci, l], lsum[ci, l + 1]
            zs = zsum[ci]
            inner = [j for j in range(nn) if z_top < zs[j] < z_bot]
            pts = [z_top] + [zs[j] for j in inner] + [z_bot]
            m = len(pts)
            # interp coefficients for each point
            for k, z in enumerate(pts):
                j = int(np.clip(np.searchsorted(zs, z, "right") - 1, 0, nn - 2))
                w = (z - zs[j]) / max(zs[j + 1] - zs[j], 1e-12)
                samp_i0[ci, l, k] = j
                samp_w[ci, l, k] = np.clip(w, 0.0, 1.0)
            # trapezoid weights
            for k in range(m):
                left = pts[k] - pts[k - 1] if k > 0 else 0.0
                right = pts[k + 1] - pts[k] if k < m - 1 else 0.0
                samp_trap[ci, l, k] = 0.5 * (left + right) / max(
                    z_bot - z_top, 1e-12)

    # reference-quirk solver arrays (frozen_soil.c:114-115 layer-array
    # aliasing; see NodeGeometry field comments).  MAX_LAYERS=3 upstream
    # (user_def.h:95): node j<3 reads soil layer j's mm-units values, node
    # j>=3 reads the volumetric *_node[j-3] entries via the struct-layout
    # overrun (vicNl_def.h:939-940).
    max_moist_mm = np.asarray(soil.max_moist)            # [c, nl] in mm
    bubble_l = np.asarray(soil.bubble)
    expt_l = np.asarray(soil.expt)
    solver_max_moist = np.zeros((n_cell, nn))
    solver_bubble = np.zeros((n_cell, nn))
    solver_expt = np.zeros((n_cell, nn))
    for j in range(nn):
        if j < 3:
            li = min(j, nl - 1)
            solver_max_moist[:, j] = max_moist_mm[:, li]
            solver_bubble[:, j] = bubble_l[:, li]
            solver_expt[:, j] = expt_l[:, li]
        else:
            solver_max_moist[:, j] = max_moist_node[:, j - 3]
            solver_bubble[:, j] = bubble_node[:, j - 3]
            solver_expt[:, j] = expt_node[:, j - 3]

    return NodeGeometry(
        zsum=zsum, dz=dz, alpha=alpha, beta=beta, gamma=gamma,
        node_layer=node_layer, on_boundary=on_boundary,
        max_moist_node=max_moist_node, expt_node=expt_node,
        bubble_node=bubble_node, samp_i0=samp_i0, samp_w=samp_w,
        samp_trap=samp_trap, bexp=bexp,
        solver_max_moist=solver_max_moist, solver_bubble=solver_bubble,
        solver_expt=solver_expt)


def _gather_layer(arr_l, node_layer):
    """arr_l [c, nl] -> [c, 1, nn] per-node values via layer index."""
    return jnp.take_along_axis(arr_l, node_layer, axis=-1)


def distribute_node_moisture(moist_mm, node_temp, geom: NodeGeometry, params,
                             frozen: bool):
    """Node moisture/ice/kappa/Cs from layer moisture
    (soil_conduction.c:304-440).

    moist_mm: [c, h, nl]; node_temp: [c, h, nn]. Returns dict of [c, h, nn].
    """
    nl_idx = geom.node_layer[:, None, :]  # [c,1,nn]
    depth = params.depth[:, None, :]      # [c,1,nl]
    moist_vol = moist_mm / (depth * 1000.0)

    def g(a):  # layer array [c,1,nl] -> per node [c,h,nn]
        return jnp.take_along_axis(
            jnp.broadcast_to(a, moist_vol.shape[:2] + (a.shape[-1],)),
            jnp.broadcast_to(nl_idx, moist_vol.shape[:2] + (nl_idx.shape[-1],)),
            axis=-1)

    moist_node = g(moist_vol)
    # boundary nodes average adjacent layers (soil_conduction.c:365-370)
    nlayers = moist_vol.shape[-1]
    nl_dn = jnp.minimum(geom.node_layer + 1, nlayers - 1)[:, None, :]
    moist_dn = jnp.take_along_axis(
        jnp.broadcast_to(moist_vol, moist_vol.shape),
        jnp.broadcast_to(nl_dn, moist_vol.shape[:2] + (nl_dn.shape[-1],)),
        axis=-1)
    ob = geom.on_boundary[:, None, :]
    moist_node = jnp.where(ob, (moist_node + moist_dn) / 2.0, moist_node)
    moist_node = jnp.minimum(moist_node, geom.max_moist_node[:, None, :])

    if frozen:
        ice_node = jnp.maximum(
            moist_node - maximum_unfrozen_water(
                node_temp, geom.max_moist_node[:, None, :],
                geom.bubble_node[:, None, :], geom.expt_node[:, None, :]),
            0.0)
        ice_node = jnp.where(params.fs_active[:, None, None], ice_node, 0.0)
    else:
        ice_node = jnp.zeros_like(moist_node)

    kappa = soil_conductivity(
        moist_node, moist_node - ice_node,
        g(params.soil_dens_min[:, None, :]), g(params.bulk_dens_min[:, None, :]),
        g(params.quartz[:, None, :]), g(params.soil_density[:, None, :]),
        g(params.bulk_density[:, None, :]), g(params.organic[:, None, :]))
    cs = volumetric_heat_capacity(
        g((params.bulk_density / params.soil_density)[:, None, :]),
        moist_node - ice_node, ice_node, g(params.organic[:, None, :]))
    return dict(moist=moist_node, ice=ice_node, kappa=kappa, cs=cs)


class ProfileResult(NamedTuple):
    temp: jnp.ndarray       # [c, h, nn] new node temperatures
    fbcount: jnp.ndarray    # [c, h, nn] per-node TFALLBACK counts
    iterations: jnp.ndarray


def solve_t_profile_explicit(t0, surf_temp, kappa, cs, moist_node, ice0_node,
                             geom: NodeGeometry, params, dt_sec,
                             noflux: bool, exp_trans: bool, frozen: bool,
                             max_sweeps: int = 30, bisect_iters: int = 16,
                             ice_quirk: bool = True,
                             t_start=None) -> ProfileResult:
    """Gauss-Seidel node sweep (frozen_soil.c:305-468 calc_soil_thermal_fluxes;
    the scheme is backward-Euler in time, iterated Gauss-Seidel in space).

    t0: [c,h,nn] previous temps; surf_temp: [c,h] boundary condition (node 0).
    kappa/cs/moist_node/ice0_node: [c,h,nn] at the OLD temperatures.
    bisect_iters: sequential bisection depth for genuine-ice nodes
    (j >= Nlayer). 16 resolves the common 2*SOIL_DT bracket to 8e-6 C and
    the widest expansion to 1.7e-3 C — both far under the sweep's 1e-2
    tolerance (the reference's root_brent converges tighter but the sweep
    accepts 1e-2 the same way, frozen_soil.c:466).
    t_start: optional warm-start ITERATE (e.g. the affine-interpolated
    profile the surface-EB Brent converged on) — cuts the sweep count when
    close to the fixed point.  The reference's revert-on-nonconvergence
    target and the post-sweep cold-nose anchor stay at the OLD temperatures
    regardless (frozen_soil.c:470-494 semantics are t0-relative).

    REFERENCE QUIRK (ice_quirk=True, the parity default): frozen_soil.c:114-115
    passes the per-LAYER soil_con->max_moist/bubble/expt arrays into the node
    solve, indexed BY NODE.  Inside SoilThermalEqn (soil_thermal_eqn.c:35) the
    in-iteration ice content therefore evaluates maximum_unfrozen_water with
    max_moist in mm (hundreds) against volumetric moisture (~0.4), so
    ice(T) == 0 for every reachable T on nodes 0..2, the E*(ice-ice0) term sits
    at -E*ice0, the root is unbracketable whenever the node carries ice, and
    root_brent's TFALLBACK pins the node at its previous temperature.  Nodes
    >= 3 read past the layer array into the adjacent *_node struct fields
    (vicNl_def.h:939-940) and get node j-3's volumetric values (nearly correct
    physics).  The practical upshot - sub-freezing shallow nodes freeze IN TIME
    all winter - dominates the reference's FROZEN_SOIL behaviour and must be
    reproduced for parity.  The same units bug in fda_heat_eqn
    (frozen_soil.c:589) makes the IMPLICIT Newton-Raphson fail (TOLF can never
    be met while any node carries ice), so the reference's implicit path falls
    back here ~always; ice-free columns solve the same backward-Euler system
    either way.  Set ice_quirk=False for the physically-correct solver.
    """
    nn = t0.shape[-1]
    B1 = lambda a: a[:, None, :]
    alpha, beta, gamma = B1(geom.alpha), B1(geom.beta), B1(geom.gamma)
    zsum = B1(geom.zsum)
    if ice_quirk and geom.solver_max_moist is not None:
        mmax = B1(jnp.asarray(geom.solver_max_moist))
        bub = B1(jnp.asarray(geom.solver_bubble))
        expt = B1(jnp.asarray(geom.solver_expt))
        # the node ice cap stays the true volumetric limit in the reference
        # (ice>max_moist clamp uses the same buggy array; keep it, it never
        # binds when the quirk zeroes ice)
    else:
        mmax = B1(geom.max_moist_node)
        bub = B1(geom.bubble_node)
        expt = B1(geom.expt_node)
    deltat = dt_sec
    fs = params.fs_active[:, None, None] if frozen else False

    if exp_trans:
        bexp = geom.bexp[:, None, None]

    # coefficient arrays (frozen_soil.c:168-212), [c,h,nn] padded
    kap_p1 = jnp.roll(kappa, -1, axis=-1)
    kap_m1 = jnp.roll(kappa, 1, axis=-1)
    if not exp_trans:
        A = cs * alpha * alpha
        B = (kap_p1 - kap_m1) * deltat
        B_last = (kappa - kap_m1) * deltat
        C = 2.0 * deltat * kappa * alpha / gamma
        D = 2.0 * deltat * kappa * alpha / beta
        E = c.ICE_DENSITY * c.LF * alpha * alpha
    else:
        zp1 = zsum + 1.0
        A = 4.0 * bexp * bexp * cs * zp1 * zp1
        B = (kap_p1 - kap_m1) * deltat
        B_last = (kappa - kap_m1) * deltat
        C = 4.0 * deltat * kappa
        D = 2.0 * deltat * kappa * bexp
        E = 4.0 * bexp * bexp * c.ICE_DENSITY * c.LF * zp1 * zp1

    def ice_at(t, j):
        if not frozen:
            return jnp.zeros_like(t)
        iw = jnp.maximum(
            moist_node[..., j]
            - maximum_unfrozen_water(t, mmax[..., j], bub[..., j],
                                     expt[..., j]), 0.0)
        return jnp.where(fs[..., 0], jnp.minimum(iw, mmax[..., j]), 0.0)

    def node_residual(t, j, T, tl_idx, tu_idx):
        """SoilThermalEqn::calculate at node j (soil_thermal_eqn.c), incl.
        the node-1 "cold nose" residual patch (soil_thermal_eqn.c:58-70:
        when |TL-TU|>5 and T below both neighbours and the B flux term
        outweighs and opposes the C/D terms, drop the B term)."""
        tl = T[..., tl_idx]
        tu = T[..., tu_idx]
        ice = jnp.where(t < 0.0, ice_at(t, j), 0.0)
        if not exp_trans:
            f1 = B[..., j] * (tl - tu)
            f2 = C[..., j] * (tl - t) - D[..., j] * (t - tu)
            val = (-A[..., j] * (t - t0[..., j]) + f1 + f2
                   + E[..., j] * (ice - ice0_node[..., j]))
        else:
            f1 = B[..., j] * (tl - tu)
            f2 = (C[..., j] * (tl - 2.0 * t + tu)
                  - D[..., j] * (tl - tu))
            val = (-A[..., j] * (t - t0[..., j]) + f1 + f2
                   + E[..., j] * (ice - ice0_node[..., j]))
        if j == 1:
            cold_nose = (jnp.abs(tl - tu) > 5.0) & (t < tl) & (t < tu) \
                & (f1 < 0.0) & (f2 > 0.0) & (jnp.abs(f1) > jnp.abs(f2))
            val = jnp.where(cold_nose, val - f1, val)
        return val

    def sweep(T):
        # per-node fallback counts (frozen_soil.c:404-418 Tfbcount[j]++)
        fb = jnp.zeros(T.shape, jnp.int32)
        maxdiff = jnp.zeros(T.shape[:-1], T.dtype)
        for j in range(1, nn - 1):
            oldT = T[..., j]
            tl = T[..., j + 1]
            tu = T[..., j - 1]
            # unfrozen closed-form update (frozen_soil.c:390-392)
            if not exp_trans:
                t_lin = (A[..., j] * t0[..., j] + B[..., j] * (tl - tu)
                         + C[..., j] * tl + D[..., j] * tu
                         + E[..., j] * (0.0 - ice0_node[..., j])) / (
                    A[..., j] + C[..., j] + D[..., j])
            else:
                t_lin = (A[..., j] * t0[..., j] + B[..., j] * (tl - tu)
                         + C[..., j] * (tl + tu) - D[..., j] * (tl - tu)
                         + E[..., j] * (0.0 - ice0_node[..., j])) / (
                    A[..., j] + 2.0 * C[..., j])
            nl_static = (params.depth.shape[-1]
                         if hasattr(params, "depth") else 0)
            quirk_linear = (frozen and ice_quirk
                            and geom.solver_max_moist is not None
                            and j < nl_static)
            if quirk_linear:
                # With the reference's layer-units ice bug active
                # (solver_* arrays carry per-LAYER mm values for nodes
                # < Nlayer), the in-iteration ice term is identically zero
                # for every reachable T, so the node residual is LINEAR
                # (node 1: piecewise-linear via the cold-nose patch whose
                # f1 term is T-independent). The bisection's limit is the
                # CLOSED-FORM root — computed directly, cutting the
                # 12-endpoint + 24-bisection sequential chain to two
                # residual evaluations for the bracket test. The TFALLBACK
                # semantics (unbracketed across the widest expansion ->
                # pin at T0) are preserved exactly for the monotone case.
                tl = T[..., j + 1]
                tu = T[..., j - 1]
                denom = A[..., j] + C[..., j] + D[..., j] \
                    if not exp_trans else A[..., j] + 2.0 * C[..., j]
                r0 = t_lin
                if j == 1:
                    # cold-nose branch root (residual minus the f1 term)
                    f1 = B[..., j] * (tl - tu)
                    r1 = t_lin - f1 / denom
                    f2_r1 = C[..., j] * (tl - r1) - D[..., j] * (r1 - tu) \
                        if not exp_trans else \
                        (C[..., j] * (tl - 2.0 * r1 + tu)
                         - D[..., j] * (tl - tu))
                    cn_r1 = ((jnp.abs(tl - tu) > 5.0) & (r1 < tl)
                             & (r1 < tu) & (f1 < 0.0) & (f2_r1 > 0.0)
                             & (jnp.abs(f1) > jnp.abs(f2_r1)))
                    t_root = jnp.where(cn_r1, r1, r0)
                else:
                    t_root = r0
                wide = c.SOIL_DT + 50.0
                f_lo = node_residual(t0[..., j] - wide, j, T, j + 1, j - 1)
                f_hi = node_residual(t0[..., j] + wide, j, T, j + 1, j - 1)
                bracketed = f_lo * f_hi < 0.0
                t_frozen = jnp.where(bracketed, t_root, t0[..., j])
                use_root = jnp.logical_and(oldT < 0.0,
                                           jnp.asarray(fs)[..., 0])
                t_new = jnp.where(use_root, t_frozen, t_lin)
                fb = fb.at[..., j].add(jnp.where(
                    jnp.logical_and(use_root, ~bracketed), 1, 0))
            elif frozen:
                # frozen node: root on [T0-SOIL_DT, T0+SOIL_DT]
                # (frozen_soil.c:401), expanded symmetrically by TSTEP=10 up
                # to MAXTRIES=5 times exactly like root_brent.c:183-190 —
                # the first bracketing pair wins; with the reference ice
                # quirk the E*(0-ice0) offset usually leaves every pair
                # unbracketed and the node TFALLBACKs to T0.
                # All 6 candidate pairs are evaluated in ONE stacked residual
                # call (leading axis = expansion level): 12 sequential tiny
                # kernels -> 2 vectorized ones; this sits inside the
                # surface-EB Brent x sweep nest, so sequential depth is the
                # cost that matters on TPU.
                deltas = jnp.asarray([c.SOIL_DT + 10.0 * k for k in range(6)],
                                     T.dtype).reshape((6,) + (1,) * T[..., j].ndim)
                los = t0[None, ..., j] - deltas
                his = t0[None, ..., j] + deltas
                f_los = node_residual(los, j, T, j + 1, j - 1)
                f_his = node_residual(his, j, T, j + 1, j - 1)
                br = f_los * f_his < 0.0
                first = jnp.argmax(br, axis=0)[None]
                pick = lambda a: jnp.take_along_axis(a, first, 0)[0]
                lo, hi, f_lo = pick(los), pick(his), pick(f_los)
                bracketed = br.any(axis=0)

                def bis_body(_, carry):
                    lo_, hi_, flo_ = carry
                    mid = 0.5 * (lo_ + hi_)
                    fm = node_residual(mid, j, T, j + 1, j - 1)
                    left = flo_ * fm <= 0.0
                    return (jnp.where(left, lo_, mid),
                            jnp.where(left, mid, hi_),
                            jnp.where(left, flo_, fm))

                lo_f, hi_f, _ = jax.lax.fori_loop(
                    0, bisect_iters, bis_body, (lo, hi, f_lo))
                t_root = 0.5 * (lo_f + hi_f)
                # TFALLBACK when unbracketed (frozen_soil.c:404-418)
                t_frozen = jnp.where(bracketed, t_root, t0[..., j])
                use_root = jnp.logical_and(oldT < 0.0,
                                           jnp.asarray(fs)[..., 0]
                                           if frozen else False)
                t_new = jnp.where(use_root, t_frozen, t_lin)
                fb = fb.at[..., j].add(jnp.where(
                    jnp.logical_and(use_root, ~bracketed), 1, 0))
            else:
                t_new = t_lin
            T = T.at[..., j].set(t_new)
            maxdiff = jnp.maximum(maxdiff, jnp.abs(oldT - t_new))

        if noflux:
            j = nn - 1
            oldT = T[..., j]
            tl = T[..., j]      # no-flux: mirror (uses B_last coefficient set)
            tu = T[..., j - 1]
            if not exp_trans:
                t_lin = (A[..., j] * t0[..., j] + B_last[..., j] * (tl - tu)
                         + C[..., j] * tl + D[..., j] * tu
                         + E[..., j] * (0.0 - ice0_node[..., j])) / (
                    A[..., j] + C[..., j] + D[..., j])
            else:
                t_lin = (A[..., j] * t0[..., j] + B_last[..., j] * (tl - tu)
                         + C[..., j] * (tl + tu) - D[..., j] * (tl - tu)
                         + E[..., j] * (0.0 - ice0_node[..., j])) / (
                    A[..., j] + 2.0 * C[..., j])
            T = T.at[..., j].set(t_lin)
            maxdiff = jnp.maximum(maxdiff, jnp.abs(oldT - t_lin))
        return T, fb, maxdiff

    T_init = t0.at[..., 0].set(surf_temp)
    T_start = T_init if t_start is None else t_start.at[..., 0].set(surf_temp)

    def cond(carry):
        _, i, maxdiff, _ = carry
        return jnp.logical_and(i < max_sweeps, jnp.max(maxdiff) > 1e-2)

    def body(carry):
        T, i, _, fb_tot = carry
        T, fb, maxdiff = sweep(T)
        return T, i + 1, maxdiff, fb_tot + fb

    T, iters, lastdiff, fb = jax.lax.while_loop(
        cond, body, (T_start, jnp.int32(0),
                     jnp.ones(t0.shape[:-1], t0.dtype),
                     jnp.zeros(t0.shape, jnp.int32)))

    # post-sweep runaway-cold-nose hack (frozen_soil.c:470-484, TFALLBACK
    # path): a node that was already a local cold minimum last step and got
    # even colder relative to BOTH neighbours is replaced by the plain
    # average of its neighbours.  Replicated literally, including the
    # reference's mixed old/new second condition (Tlast[j+1]-T[j]) and the
    # ascending-j use of already-hacked T[j-1].
    tlast = T_init
    for j in range(1, nn - 1):
        nose = ((tlast[..., j - 1] - tlast[..., j] > 0.0)
                & (tlast[..., j + 1] - T[..., j] > 0.0)
                & ((T[..., j - 1] - T[..., j])
                   - (tlast[..., j - 1] - tlast[..., j]) > 0.0)
                & ((T[..., j + 1] - T[..., j])
                   - (tlast[..., j + 1] - tlast[..., j]) > 0.0))
        T = T.at[..., j].set(jnp.where(
            nose, 0.5 * (T[..., j - 1] + T[..., j + 1]), T[..., j]))
        fb = fb.at[..., j].add(nose.astype(jnp.int32))

    # sweep non-convergence: the WHOLE profile reverts to the previous
    # temperatures (with the node-0 BC kept), frozen_soil.c:486-494
    not_done = (lastdiff > 1e-2)[..., None]
    T = jnp.where(not_done, T_init, T)
    fb = jnp.where(not_done, fb + 1, fb)
    return ProfileResult(temp=T, fbcount=fb, iterations=iters)


def solve_t_profile_implicit(t0, surf_temp, kappa, cs, moist_node, ice0_node,
                             geom: NodeGeometry, params, dt_sec,
                             noflux: bool, exp_trans: bool, frozen: bool,
                             max_nr: int = 12, relax: float = None
                             ) -> ProfileResult:
    """IMPLICIT soil-heat solve (frozen_soil.c:229-300 solve_T_profile_implicit
    + fda_heat_eqn residual): Newton-Raphson on the full node system.

    The reference factors the dense Jacobian with LU (newt_raph_func_fast.c);
    the heat-equation Jacobian is tridiagonal, so each NR step here is one
    batched Thomas solve (ops/tridiag.py). Fixed iteration budget with masked
    updates; boundary rows (surface node, bottom node unless NOFLUX) are
    identity.
    """
    from ..ops.tridiag import thomas_solve

    nn = t0.shape[-1]
    B1 = lambda a: a[:, None, :]
    alpha, beta, gamma = B1(geom.alpha), B1(geom.beta), B1(geom.gamma)
    mmax = B1(geom.max_moist_node)
    bub = B1(geom.bubble_node)
    expt = B1(geom.expt_node)
    deltat = dt_sec
    fs = params.fs_active[:, None, None]

    kap_p1 = jnp.roll(kappa, -1, axis=-1)
    kap_m1 = jnp.roll(kappa, 1, axis=-1)
    A = cs * alpha * alpha
    Bc = (kap_p1 - kap_m1) * deltat
    C = 2.0 * deltat * kappa * alpha / gamma
    D = 2.0 * deltat * kappa * alpha / beta
    E = c.ICE_DENSITY * c.LF * alpha * alpha

    def ice_of(t):
        if not frozen:
            return jnp.zeros_like(t)
        iw = jnp.maximum(moist_node - maximum_unfrozen_water(t, mmax, bub,
                                                             expt), 0.0)
        return jnp.where(jnp.logical_and(fs, t < 0.0),
                         jnp.minimum(iw, mmax), 0.0)

    interior = jnp.zeros((nn,), bool).at[1:nn - 1].set(True)
    if noflux:
        interior = interior.at[nn - 1].set(True)

    def residual(T):
        tl = jnp.roll(T, -1, axis=-1)
        tu = jnp.roll(T, 1, axis=-1)
        # NOFLUX bottom: mirror neighbor (frozen_soil.c B_last uses T[j])
        if noflux:
            tl = tl.at[..., nn - 1].set(T[..., nn - 1])
        ice = ice_of(T)
        f = (-A * (T - t0) + Bc * (tl - tu) + C * (tl - T) - D * (T - tu)
             + E * (ice - ice0_node))
        return jnp.where(interior, f, 0.0)

    def body(i, carry):
        T, = carry
        # reference relaxation schedule RELAX1/2/3 = 0.9/0.7/0.2
        # (newt_raph_func_fast.c:7-15) — damps the phase-change kink at 0 C
        relax_i = jnp.where(i == 0, 0.9, jnp.where(i == 1, 0.7, 0.2)) \
            if relax is None else relax
        f = residual(T)
        # tridiagonal Jacobian entries
        dice = (ice_of(T + 0.05) - ice_of(T - 0.05)) / 0.1
        dmain = jnp.where(interior, -A - C - D + E * dice, 1.0)
        dl = jnp.where(interior, -Bc + D, 0.0)
        du = jnp.where(interior, Bc + C, 0.0)
        if noflux:
            # bottom row: tl == T folds the super-diagonal into the diagonal
            dmain = dmain.at[..., nn - 1].add(
                jnp.where(interior[nn - 1], Bc[..., nn - 1] + C[..., nn - 1],
                          0.0))
            du = du.at[..., nn - 1].set(0.0)
        # row-scale to O(1) — the raw coefficients are ~1e8 (E = rho_i*Lf*a^2)
        # which loses the Thomas recurrences to f32 cancellation
        scale = jnp.where(interior, jnp.abs(dmain) + 1e-6, 1.0)
        delta = thomas_solve(dl / scale, dmain / scale, du / scale,
                             -f / scale)
        delta = jnp.clip(delta, -10.0, 10.0)
        return (T + relax_i * jnp.where(interior, delta, 0.0),)

    T_init = t0.at[..., 0].set(surf_temp)
    (T,) = jax.lax.fori_loop(0, max_nr, body, (T_init,))
    # fallback: non-finite or wild updates revert to previous temps (TFALLBACK)
    bad = ~jnp.isfinite(T) | (jnp.abs(T - t0) > 40.0)
    fb = bad.any(-1)
    T = jnp.where(fb[..., None], t0.at[..., 0].set(surf_temp), T)
    # per-node fallback counts: the nodes whose update actually went wild
    # (the whole column reverts, but only they are counted — mirroring
    # frozen_soil.c:404-418 Tfbcount[j])
    return ProfileResult(temp=T, fbcount=bad.astype(jnp.int32),
                         iterations=jnp.int32(max_nr))


def estimate_layer_ice(node_temp, moist_mm, geom: NodeGeometry, params,
                       frozen: bool, frost_subareas: int = 1,
                       frost_slope: float = 0.0):
    """Layer-average temperature and ice content from node temperatures
    (soil_conduction.c:444-616), via the precomputed trapezoid sample maps.

    node_temp: [c,h,nn]; moist_mm: [c,h,nl]. Returns (layer_T, layer_ice_mm).
    """
    nn = node_temp.shape[-1]
    bshape = node_temp.shape[:2]
    nlayers = moist_mm.shape[-1]
    ns = geom.samp_i0.shape[-1]

    i0 = geom.samp_i0[:, None, :, :]                      # [c,1,nl,ns]
    w = jnp.asarray(geom.samp_w)[:, None, :, :]
    trap = jnp.asarray(geom.samp_trap)[:, None, :, :]

    def take_nodes(idx):
        flat = jnp.reshape(idx, idx.shape[:2] + (-1,))
        got = jnp.take_along_axis(
            jnp.broadcast_to(node_temp, bshape + (nn,)),
            jnp.broadcast_to(flat, bshape + (flat.shape[-1],)), axis=-1)
        return jnp.reshape(got, idx.shape)

    i0b = jnp.broadcast_to(i0, bshape + i0.shape[2:])
    t_lo = take_nodes(i0b)
    t_hi = take_nodes(jnp.minimum(i0b + 1, nn - 1))
    t_samp = (1.0 - w) * t_lo + w * t_hi                 # [c,h,nl,ns]

    layer_t = (t_samp * trap).sum(-1)

    if frozen:
        mm = params.max_moist[:, None, :, None]
        bub = params.bubble[:, None, :, None]
        expt = params.expt[:, None, :, None]
        if frost_subareas > 1:
            # SPATIAL_FROST (user_def.h:118, soil_conduction.c:444 frost
            # loop): sample temperatures spread uniformly +-frost_slope/2
            # around the mean and average the resulting ice contents
            offs = jnp.linspace(-0.5, 0.5, frost_subareas) * frost_slope
            t_f = t_samp[..., None] + offs          # [c,h,nl,ns,nf]
            ice_f = jnp.maximum(
                moist_mm[..., None, None] - maximum_unfrozen_water(
                    t_f, mm[..., None], bub[..., None], expt[..., None]), 0.0)
            ice_samp = ice_f.mean(-1)
        else:
            ice_samp = jnp.maximum(
                moist_mm[..., None] - maximum_unfrozen_water(
                    t_samp, mm, bub, expt), 0.0)
        layer_ice = (ice_samp * trap).sum(-1)
        layer_ice = jnp.where(params.fs_active[:, None, None], layer_ice, 0.0)
        layer_ice = jnp.minimum(layer_ice, moist_mm)
    else:
        layer_ice = jnp.zeros_like(moist_mm)
    return layer_t, layer_ice


def find_zero_fronts(node_temp, zsum, max_fronts: int = 3):
    """Depths of thawing and freezing fronts from the node profile.

    Vectorized re-expression of find_0_degree_fronts
    (/root/reference/soil_conduction.c:775-830): scanning node pairs from the
    BOTTOM up, a thawing front sits where T[n] > 0 >= T[n+1] and a freezing
    front where T[n] < 0 <= T[n+1]; the front depth is the linear
    interpolation of the zero crossing between the two node depths. Up to
    `max_fronts` of each are kept in bottom-up order (MAX_FRONTS=3,
    user_def.h:112). Lanes without a front report 0 depth (the reference
    stores NaN; 0 keeps aggregation clean).

    node_temp: [..., nn]; zsum: broadcastable [..., nn] node depths (m).
    Returns (tdepth, fdepth), each [..., max_fronts] in m.
    """
    t_up = node_temp[..., :-1]     # node nidx
    t_dn = node_temp[..., 1:]      # node nidx+1
    z_up = jnp.broadcast_to(zsum, node_temp.shape)[..., :-1]
    z_dn = jnp.broadcast_to(zsum, node_temp.shape)[..., 1:]
    denom = jnp.where(jnp.abs(t_dn - t_up) > 1e-12, t_dn - t_up, 1e-12)
    zcross = z_up + (0.0 - t_up) * (z_dn - z_up) / denom

    thaw = jnp.logical_and(t_up > 0.0, t_dn <= 0.0)
    frost = jnp.logical_and(t_up < 0.0, t_dn >= 0.0)

    # reverse to bottom-up scan order and keep the first max_fronts
    def collect(mask, depth):
        m = mask[..., ::-1]
        d = depth[..., ::-1]
        rank = jnp.cumsum(m.astype(jnp.int32), axis=-1) - 1
        cols = []
        for f in range(max_fronts):
            sel = jnp.logical_and(m, rank == f)
            cols.append((jnp.where(sel, d, 0.0)).sum(-1))
        return jnp.stack(cols, axis=-1)

    return collect(thaw, zcross), collect(frost, zcross)
