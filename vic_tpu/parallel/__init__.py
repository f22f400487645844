from .sharding import (cell_mesh, pad_cell_tree, pad_cells,  # noqa: F401
                       shard_cell_axis, shard_forcing, slice_cell_tree,
                       unpad_cell_tree)
