from . import disagg, ingest, mtclim  # noqa: F401
