"""Legendre elliptic integrals F, E, Pi in Carlson form.

(reference: sim5elliptic.c:217-474; conventions m = k^2 as in Byrd&Friedman)
All functions broadcast, jit and differentiate.  The `_cos`/`_sin` variants
take the cosine/sine of the amplitude directly, which is what the geodesic
engine naturally produces (avoids acos/cos round-trips).
"""

import jax.numpy as jnp

from .carlson import rf, rd, rj


def _clamp_m(m):
    return jnp.where(m >= 1.0, 0.99999999, m)


def elliptic_k(m):
    """Complete elliptic integral K(m).  (sim5elliptic.c:217-225)"""
    m = jnp.asarray(m, jnp.float64)
    m = jnp.where(m == 1.0, 1.0 - 1e-8, m)
    return rf(jnp.zeros_like(m), 1.0 - m, jnp.ones_like(m))


def elliptic_k_mc(mc):
    """Complete elliptic integral K(m) from the COMPLEMENT mc = 1 - m, by
    the arithmetic-geometric mean:  K = pi / (2 AGM(1, sqrt(mc))).

    TPU fast-path form (round 5): on the image pipeline every complete-K
    use site already carries a cancellation-free complement (near-critical
    moduli have mc ~ 1e-12 where 1 - m floors at ulp(1)), and the AGM
    costs ONE sqrt per iteration vs three per duplication level for the
    equivalent RF(0, mc, 1) -- 8-10 sqrt total instead of 21-48 on the
    sqrt-throughput-bound image path (docs/performance.md roofline).
    Quadratic convergence: the fixed depths reach the working precision's
    noise floor for any mc >= 1e-12 (the engine's validity-gate floor).
    Differentiable by plain autodiff through the (short, smooth) chain.
    """
    mc = jnp.asarray(mc, jnp.float64)
    f64 = jnp.zeros((), jnp.float64).dtype == jnp.float64
    # measured (vs a dps-60 oracle): worst-case over mc in [1e-13, 1]
    # reaches the precision floor (2.4e-16 / 1.4e-7) by depth 6 -- the
    # pi/(a+b) form adds one extra effective averaging; +1-3 margin
    depth = 9 if f64 else 7
    a = jnp.ones_like(mc)
    b = jnp.sqrt(jnp.maximum(mc, 1e-30))
    for _ in range(depth):
        a, b = 0.5 * (a + b), jnp.sqrt(a * b)
    return jnp.pi / (a + b)   # = pi / (2 * agm)


def elliptic_f(phi, m):
    """Incomplete elliptic integral F(phi, m), any real phi.  (sim5elliptic.c:236-252)"""
    phi = jnp.asarray(phi, jnp.float64)
    m = _clamp_m(jnp.asarray(m, jnp.float64))
    phi, m = jnp.broadcast_arrays(phi, m)
    # range-reduce phi into (-pi/2, pi/2]: k = round(phi/pi)
    k = jnp.round(phi / jnp.pi)
    phir = phi - k * jnp.pi
    s2 = jnp.sin(phir) ** 2
    f = jnp.sign(phir) * jnp.sqrt(s2) * rf(1.0 - s2, 1.0 - s2 * m, jnp.ones_like(s2))
    f = jnp.where(phir == 0.0, 0.0, f)
    return f + 2.0 * k * elliptic_k(m)


def elliptic_f_cos(cos_phi, m):
    """F(phi, m) with phi given by its cosine, 0 <= phi <= pi.  (sim5elliptic.c:254-271)"""
    cos_phi = jnp.asarray(cos_phi, jnp.float64)
    m = _clamp_m(jnp.asarray(m, jnp.float64))
    cos_phi, m = jnp.broadcast_arrays(cos_phi, m)
    neg = cos_phi < 0.0
    c = jnp.abs(cos_phi)
    X = jnp.where(neg, 2.0 * rf(jnp.zeros_like(m), 1.0 - m, jnp.ones_like(m)), 0.0)
    s2 = 1.0 - c * c
    base = jnp.sqrt(jnp.maximum(s2, 0.0)) * rf(1.0 - s2, 1.0 - s2 * m, jnp.ones_like(s2))
    out = X + jnp.where(neg, -base, base)
    return jnp.where(cos_phi == 1.0, 0.0, out)


def elliptic_f_sin(sin_phi, m):
    """F(phi, m) with phi in the first quadrant given by its sine.  (sim5elliptic.c:273-284)"""
    sin_phi = jnp.asarray(sin_phi, jnp.float64)
    m = _clamp_m(jnp.asarray(m, jnp.float64))
    sin_phi, m = jnp.broadcast_arrays(sin_phi, m)
    s2 = sin_phi * sin_phi
    out = sin_phi * rf(1.0 - s2, 1.0 - s2 * m, jnp.ones_like(s2))
    return jnp.where(sin_phi == 0.0, 0.0, out)


def _e_complete(m):
    z = jnp.zeros_like(m)
    o = jnp.ones_like(m)
    return rf(z, 1.0 - m, o) - m * rd(z, 1.0 - m, o) / 3.0


def elliptic_e(phi, m):
    """Incomplete elliptic integral E(phi, m), 0 <= phi <= pi.  (sim5elliptic.c:294-316)"""
    phi = jnp.asarray(phi, jnp.float64)
    m = _clamp_m(jnp.asarray(m, jnp.float64))
    phi, m = jnp.broadcast_arrays(phi, m)
    over = phi > 0.5 * jnp.pi
    phir = jnp.where(over, jnp.pi - phi, phi)
    X = jnp.where(over, 2.0 * _e_complete(m), 0.0)
    s = jnp.sin(phir)
    c2 = jnp.cos(phir) ** 2
    q = 1.0 - s * s * m
    o = jnp.ones_like(m)
    base = s * (rf(c2, q, o) - (s * s * m) * rd(c2, q, o) / 3.0)
    out = X + jnp.where(over, -base, base)
    return jnp.where(phi == 0.0, 0.0, out)


def elliptic_e_cos(cos_phi, m):
    """E(phi, m) with phi given by its cosine, 0 <= phi <= pi.  (sim5elliptic.c:318-337)"""
    cos_phi = jnp.asarray(cos_phi, jnp.float64)
    m = _clamp_m(jnp.asarray(m, jnp.float64))
    cos_phi, m = jnp.broadcast_arrays(cos_phi, m)
    neg = cos_phi < 0.0
    c = jnp.abs(cos_phi)
    X = jnp.where(neg, 2.0 * _e_complete(m), 0.0)
    c2 = c * c
    s = jnp.sqrt(jnp.maximum(1.0 - c2, 0.0))
    q = 1.0 - m + c2 * m
    o = jnp.ones_like(m)
    base = s * (rf(c2, q, o) - (s * s * m) * rd(c2, q, o) / 3.0)
    out = X + jnp.where(neg, -base, base)
    return jnp.where(cos_phi == 1.0, 0.0, out)


def elliptic_e_sin(sin_phi, m):
    """E(phi, m) with phi in the first quadrant given by its sine.  (sim5elliptic.c:339-355)"""
    sin_phi = jnp.asarray(sin_phi, jnp.float64)
    m = _clamp_m(jnp.asarray(m, jnp.float64))
    sin_phi, m = jnp.broadcast_arrays(sin_phi, m)
    s2 = sin_phi * sin_phi
    c2 = 1.0 - s2
    q = 1.0 - s2 * m
    o = jnp.ones_like(m)
    out = sin_phi * (rf(c2, q, o) - (s2 * m) * rd(c2, q, o) / 3.0)
    return jnp.where(sin_phi == 0.0, 0.0, out)


def elliptic_pi_complete(n, m):
    """Complete elliptic integral Pi(n, m) (Mathematica sign convention for n).

    (sim5elliptic.c:365-378)
    """
    n = jnp.asarray(n, jnp.float64)
    m = _clamp_m(jnp.asarray(m, jnp.float64))
    n, m = jnp.broadcast_arrays(n, m)
    n = jnp.where(n == 1.0, 0.99999999, n)
    q = 1.0 - m
    z = jnp.zeros_like(m)
    o = jnp.ones_like(m)
    out = rf(z, q, o) + n * rj(z, q, o, 1.0 - n) / 3.0
    return jnp.where(jnp.isinf(n), 0.0, out)


def elliptic_pi_cos(cos_phi, n, m):
    """Pi(phi, n, m) with phi given by its cosine, 0 <= phi <= pi.

    (sim5elliptic.c:425-450)
    """
    cos_phi = jnp.asarray(cos_phi, jnp.float64)
    n = jnp.asarray(n, jnp.float64)
    m = _clamp_m(jnp.asarray(m, jnp.float64))
    cos_phi, n, m = jnp.broadcast_arrays(cos_phi, n, m)
    negp = cos_phi < 0.0
    c = jnp.abs(cos_phi)
    z = jnp.zeros_like(m)
    o = jnp.ones_like(m)
    X = jnp.where(negp, 2.0 * (rf(z, 1.0 - m, o) + n * rj(z, 1.0 - m, o, 1.0 - n) / 3.0), 0.0)
    c2 = c * c
    s2 = 1.0 - c2
    s = jnp.sqrt(jnp.maximum(s2, 0.0))
    ns2 = -n * s2
    q = 1.0 - s2 * m
    base = s * (rf(c2, q, o) - ns2 * rj(c2, q, o, 1.0 + ns2) / 3.0)
    out = X + jnp.where(negp, -base, base)
    out = jnp.where(cos_phi == 1.0, 0.0,
                    jnp.where(cos_phi == 0.0, elliptic_pi_complete(n, m), out))
    return jnp.where(jnp.isinf(n), 0.0, out)


def elliptic_pi_sin(sin_phi, n, m):
    """Pi(phi, n, m) with phi in the first quadrant given by its sine.

    (sim5elliptic.c:453-474)
    """
    sin_phi = jnp.asarray(sin_phi, jnp.float64)
    n = jnp.asarray(n, jnp.float64)
    m = _clamp_m(jnp.asarray(m, jnp.float64))
    sin_phi, n, m = jnp.broadcast_arrays(sin_phi, n, m)
    s2 = sin_phi * sin_phi
    c2 = 1.0 - s2
    ns2 = -n * s2
    q = 1.0 - s2 * m
    o = jnp.ones_like(m)
    out = sin_phi * (rf(c2, q, o) - ns2 * rj(c2, q, o, 1.0 + ns2) / 3.0)
    out = jnp.where(sin_phi == 0.0, 0.0,
                    jnp.where(sin_phi == 1.0, elliptic_pi_complete(n, m), out))
    return jnp.where(jnp.isinf(n), 0.0, out)
