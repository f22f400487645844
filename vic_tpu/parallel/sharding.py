"""Device-mesh sharding of the cell axis.

The reference's only parallelism is OpenMP threads over grid cells
(/root/reference/vicNl.c:514-517) — cells are fully independent columns with no
halo exchange. The TPU-native equivalent (SURVEY.md SS2.9): shard the leading
cell axis of every state/parameter/forcing array over a 1-D `jax.sharding.Mesh`
with `NamedSharding(P('cell'))`. The scanned step is then pure data-parallel —
XLA inserts zero collectives in the hot loop; communication is limited to host
IO gather and diagnostics reductions, exactly mirroring the reference's
serial-output barrier.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def cell_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the cell axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("cell",))


def pad_cells(n_cell: int, n_devices: int) -> int:
    """Cells must divide the mesh; pad with inactive cells (weight 0)."""
    rem = n_cell % n_devices
    return n_cell if rem == 0 else n_cell + (n_devices - rem)


def shard_cell_axis(tree, mesh: Mesh, axis: int = 0):
    """Place every array in the pytree with its `axis` dim sharded over 'cell'.
    Scalars / axis-less leaves are replicated."""

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim > axis and x.shape[axis] % mesh.devices.size == 0:
            spec = [None] * x.ndim
            spec[axis] = "cell"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)


def shard_forcing(stack: dict, mesh: Mesh):
    """Forcing arrays are [n_rec, n_cell]: shard axis 1; time stays replicated
    (streamed through the scan)."""
    return shard_cell_axis(stack, mesh, axis=1)


def pad_cell_tree(tree, n_cell: int, n_pad: int, axis: int = 0):
    """Pad every leaf whose `axis` dim equals n_cell with n_pad copies of its
    last cell. Padding cells are real-valued clones of an existing cell, so
    every physics kernel stays well-conditioned on them; their outputs are
    sliced off by `unpad_cell_tree` before anything leaves the device path."""
    if tree is None or n_pad == 0:
        return tree

    def pad(x):
        if not hasattr(x, "shape") or x.ndim <= axis or x.shape[axis] != n_cell:
            return x
        xp = jax.numpy if isinstance(x, jax.Array) else np
        edge = xp.take(x, np.asarray([n_cell - 1]), axis=axis)
        return xp.concatenate([x, xp.repeat(edge, n_pad, axis=axis)],
                              axis=axis)

    return jax.tree_util.tree_map(pad, tree)


def slice_cell_tree(tree, start: int, stop: int, n_cell: int, axis: int = 0):
    """Slice [start:stop) of the cell axis from every leaf whose `axis` dim
    equals n_cell (the same leaf-selection rule as pad/unpad). Used by the
    driver's cell-axis chunking: domains larger than one jit call can handle
    are streamed block-by-block through a single compiled program — the
    TPU-chunked analog of the reference's per-cell loop (vicNl.c:514-517)."""
    if tree is None:
        return tree

    def f(x):
        if not hasattr(x, "shape") or x.ndim <= axis or x.shape[axis] != n_cell:
            return x
        idx = tuple(slice(start, stop) if d == axis else slice(None)
                    for d in range(x.ndim))
        return x[idx]

    return jax.tree_util.tree_map(f, tree)


def unpad_cell_tree(tree, n_padded: int, n_cell: int, axis: int = 0):
    """Inverse of pad_cell_tree: slice leaves back to the real cell count."""
    if tree is None or n_padded == n_cell:
        return tree

    def unpad(x):
        if not hasattr(x, "shape") or x.ndim <= axis or x.shape[axis] != n_padded:
            return x
        idx = tuple(slice(None) if d != axis else slice(0, n_cell)
                    for d in range(x.ndim))
        return x[idx]

    return jax.tree_util.tree_map(unpad, tree)
