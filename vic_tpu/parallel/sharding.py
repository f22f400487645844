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
