from .sharding import cell_mesh, pad_cells, shard_cell_axis, shard_forcing  # noqa: F401
