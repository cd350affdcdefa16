"""Step-wise ray marching engine (batched adaptive RK4)."""

from .raytrace import (
    RaytraceState, RTOPT_NONE, RTOPT_FLAT, RTOPT_POLARIZATION,
    raytrace_prepare, raytrace_step, raytrace, raytrace_error,
)
from .pallas_march import raytrace_pallas
