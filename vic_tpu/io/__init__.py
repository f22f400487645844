from . import snowband, soil, veg  # noqa: F401
