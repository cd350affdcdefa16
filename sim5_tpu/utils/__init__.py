"""Utility layer: math helpers, option parsing, structured logging.

(maps sim5math.c / sim5utils.c of the reference; the dynamic-array and
qsort helpers have no meaning in an array language and the MT19937 RNG is
replaced by jax.random throughout)
"""

from .math import (
    sqr, sqr3, sqr4, sign, deg2rad, rad2deg,
    reduce_angle_pi, reduce_angle_2pi, ensure_range,
    cartesian_to_spherical, spherical_to_cartesian, sim5round,
    cartesian_vector_to_spherical, cartesian_vector_to_spherical_at,
)
from .options import key_value_get
from .log import get_logger, log_run
