"""vic-tpu: a TPU-native macroscale hydrologic modeling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PCIC's VIC-GL
(Variable Infiltration Capacity model with glacier mass balance). Column physics is
batched over a dense (cell, hru) axis, integrated in time with `lax.scan`, and the
cell axis is sharded across TPU chips/hosts with `jax.sharding` (cells are
independent columns; see SURVEY.md).
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
from .config import GlobalParams, parse_global_param_file  # noqa: F401
from .timeaxis import TimeAxis, make_time_axis, time_axis_from_params  # noqa: F401
