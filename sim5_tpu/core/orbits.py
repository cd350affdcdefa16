"""Characteristic orbit radii and Keplerian orbital quantities.

(reference: sim5kerr.c:980-1141)
"""

import jax.numpy as jnp

from .metric import Metric


def r_bh(a):
    """Event horizon radius [rg].  (sim5kerr.c:981-989)"""
    return 1.0 + jnp.sqrt(1.0 - jnp.square(a))


def r_ms(a):
    """Marginally stable (ISCO) orbit radius [rg].  (sim5kerr.c:994-1004)

    Supports negative spin (retrograde) like the reference disk module
    (sim5disk-nt.c:98-104).
    """
    a = jnp.asarray(a, jnp.float64)
    z1 = 1.0 + jnp.cbrt(1.0 - a * a) * (jnp.cbrt(1.0 + a) + jnp.cbrt(1.0 - a))
    z2 = jnp.sqrt(3.0 * a * a + z1 * z1)
    sga = jnp.where(a >= 0.0, 1.0, -1.0)
    return 3.0 + z2 - sga * jnp.sqrt((3.0 - z1) * (3.0 + z1 + 2.0 * z2))


def r_mb(a):
    """Marginally bound orbit radius [rg] (Bardeen+72 eq. 2.19).  (sim5kerr.c:1008-1018)"""
    return (2.0 - a) + 2.0 * jnp.sqrt(1.0 - a)


def r_ph(a):
    """Photon orbit radius [rg] (Bardeen+72 eq. 2.18).  (sim5kerr.c:1022-1032)"""
    return 2.0 * (1.0 + jnp.cos(2.0 / 3.0 * jnp.arccos(-a)))


def OmegaK(r, a):
    """Keplerian angular frequency [geom. units].  (sim5kerr.c:1037-1046)"""
    return 1.0 / (a + r ** 1.5)


def ellK(r, a):
    """Keplerian specific angular momentum (Komissarov 2008 form).

    (sim5kerr.c:1050-1072)
    """
    sr = jnp.sqrt(r)
    return (r * r - 2.0 * a * sr + a * a) / (sr * r - 2.0 * sr + a)


def omega_r(r, a):
    """Radial epicyclic frequency.  (sim5kerr.c:1076-1085)"""
    return OmegaK(r, a) * jnp.sqrt(
        1.0 - 6.0 / r + 8.0 * a / jnp.sqrt(r * r * r) - 3.0 * a * a / (r * r))


def omega_z(r, a):
    """Vertical epicyclic frequency.  (sim5kerr.c:1089-1098)"""
    return OmegaK(r, a) * jnp.sqrt(
        1.0 - 4.0 * a / jnp.sqrt(r * r * r) + 3.0 * a * a / (r * r))


def Omega_from_ell(ell, m: Metric):
    """Angular frequency for given specific angular momentum.  (sim5kerr.c:1102-1111)"""
    return -(m.g03 + ell * m.g00) / (m.g33 + ell * m.g03)


def ell_from_Omega(Omega, m: Metric):
    """Specific angular momentum for given angular frequency.  (sim5kerr.c:1115-1124)"""
    return -(m.g03 + m.g33 * Omega) / (m.g00 + m.g03 * Omega)


def gfactorK(r, a, l):
    """g-factor (redshift) for Keplerian equatorial emission toward a photon
    with motion constant lambda=l.  (sim5kerr.c:1128-1141)

    Evaluated through the Bardeen-Press-Teukolsky circular-orbit identity
      1 - 2/r (1-a Om)^2 - (r^2+a^2) Om^2 = r^{3/2}(r^{3/2}-3 r^{1/2}+2a)
                                            / (r^{3/2}+a)^2
    with the Keplerian factor in FACTORED form s^3-3s+2a =
    (s-x1)(s-x2)(s-x3), s = sqrt(r), x_i the cubic's trig-closed-form
    roots: the direct expression cancels O(1) terms down to ~0.06 near
    the ISCO at high spin (3e-6 relative in f32); the factored product
    of root differences is ~1 ulp.  Exact same function in f64.
    """
    s = jnp.sqrt(r)
    s3_ = s * r                            # r^{3/2}
    ac = jnp.arccos(jnp.clip(a, -1.0, 1.0))
    th = ac / 3.0
    x1 = 2.0 * jnp.cos(th - jnp.pi / 3.0)
    x2 = 2.0 * jnp.cos(th + jnp.pi / 3.0)
    x3 = -2.0 * jnp.cos(th)
    kep = (s - x1) * (s - x2) * (s - x3)   # s^3 - 3 s + 2a, factored
    return jnp.sqrt(jnp.maximum(s3_ * kep, 0.0)) / (s3_ + a - l)


def keplerian_EL(r, a):
    """Specific energy E and angular momentum L of the prograde circular
    equatorial orbit at radius r (Bardeen, Press & Teukolsky 1972 eq. 2.12
    -2.13; the reference exposes only their ratio, ellK, sim5kerr.c:1104).

    Needed separately for the plunging-region flow inside the ISCO, whose
    E and L are the conserved ISCO values (Cunningham 1975).
    """
    sr = jnp.sqrt(r)
    d = r ** 0.75 * jnp.sqrt(jnp.maximum(r * sr - 3.0 * sr + 2.0 * a,
                                         1e-30))
    E = (r * sr - 2.0 * sr + a) / d
    L = (r * r - 2.0 * a * sr + a * a) / d
    return E, L
