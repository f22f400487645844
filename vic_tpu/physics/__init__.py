from . import aero, evap, glacier, runoff, snow, soil_thermal, surface  # noqa: F401
