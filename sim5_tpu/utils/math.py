"""Small math helpers (reference: sim5math.h/.c macros and routines)."""

import jax.numpy as jnp


def sqr(x):
    return x * x


def sqr3(x):
    return x * x * x


def sqr4(x):
    x2 = x * x
    return x2 * x2


def sign(x):
    """sign(x) with sign(0) = +1 (reference macro semantics, sim5math.h:44)."""
    return jnp.where(jnp.asarray(x) >= 0.0, 1.0, -1.0)


def deg2rad(x):
    return jnp.asarray(x) * (jnp.pi / 180.0)


def rad2deg(x):
    return jnp.asarray(x) * (180.0 / jnp.pi)


def reduce_angle_pi(x):
    """Reduce angle to [0, pi).  (sim5math.c:124-133)"""
    return jnp.mod(x, jnp.pi)


def reduce_angle_2pi(x):
    """Reduce angle to [0, 2 pi).  (sim5math.c:136-145)"""
    return jnp.mod(x, 2.0 * jnp.pi)


def ensure_range(x, lo, hi, acc):
    """Clamp x into [lo, hi] when within `acc` outside; NaN otherwise.

    (reference: ensure_range, sim5math.c returns validity flag + clamps)
    Returns (x_clamped, ok_mask).
    """
    x = jnp.asarray(x, jnp.float64)
    ok = (x >= lo - acc) & (x <= hi + acc)
    return jnp.clip(x, lo, hi), ok


def sim5round(x):
    """Round to integer as ``(long)(num + 0.5)`` (reference: sim5round,
    sim5math.c:16): add 0.5, then truncate toward zero.  For negative
    inputs this differs from round-half-away-from-zero: -0.5 -> 0,
    -1.5 -> -1, -1.2 -> 0, matching the C cast semantics exactly.
    """
    x = jnp.asarray(x)
    return jnp.trunc(x + 0.5).astype(jnp.int_)


def cartesian_vector_to_spherical(x, y, z, Vx, Vy, Vz):
    """Cartesian vector [Vx,Vy,Vz] at point [x,y,z] -> spherical-basis
    components (V_r, V_theta, V_phi).  (reference: cartesian2spherical1,
    sim5math.c:150-163)
    """
    r = jnp.sqrt(x * x + y * y + z * z)
    cos_h = z / r
    sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
    # On the z-axis (sin_h -> 0) the azimuthal basis is degenerate; the
    # reference returns garbage there (same 0/0 hazard).  We pick the
    # phi=0 convention (cos_f=1, sin_f=0) so results stay finite.
    safe = jnp.maximum(sin_h, 1e-300)
    on_axis = sin_h < 1e-15
    cos_f = jnp.where(on_axis, 1.0, x / r / safe)
    sin_f = jnp.where(on_axis, 0.0, y / r / safe)
    return _vec_to_spherical_basis(cos_h, sin_h, sin_f, cos_f, Vx, Vy, Vz)


def cartesian_vector_to_spherical_at(cos_h, sin_f, cos_f, Vx, Vy, Vz):
    """Same transform with the point given as (cos theta, sin phi, cos phi).
    (reference: cartesian2spherical2, sim5math.c:165-176)
    """
    sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
    return _vec_to_spherical_basis(cos_h, sin_h, sin_f, cos_f, Vx, Vy, Vz)


def _vec_to_spherical_basis(cos_h, sin_h, sin_f, cos_f, Vx, Vy, Vz):
    Vr = sin_h * cos_f * Vx + sin_h * sin_f * Vy + cos_h * Vz
    Vh = cos_h * cos_f * Vx + cos_h * sin_f * Vy - sin_h * Vz
    Vf = -sin_f * Vx + cos_f * Vy
    return Vr, Vh, Vf


def cartesian_to_spherical(x, y, z):
    """(x,y,z) -> (r, theta, phi).  (sim5math.c:150-163)"""
    r = jnp.sqrt(x * x + y * y + z * z)
    theta = jnp.arccos(jnp.clip(z / jnp.where(r > 0, r, 1.0), -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    return r, theta, phi


def spherical_to_cartesian(r, theta, phi):
    """(r, theta, phi) -> (x,y,z).  (sim5math.c:166-176)"""
    s = jnp.sin(theta)
    return r * s * jnp.cos(phi), r * s * jnp.sin(phi), r * jnp.cos(theta)
