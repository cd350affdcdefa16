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
    with the Keplerian bracket kep = s^3 - 3s + 2a (s = sqrt(r)) in
    COMPENSATED double-single form: near its photon-ring zero the bracket
    is exquisitely sensitive to s (d kep/ds = 3(s^2-1) vs kep -> 0), so a
    half-ulp of a plain sqrt costs ~1.4e-6 relative in f32 at the a=0.998
    inner edge -- measured to be THE dominant fast-path image error
    (2.8e-6 of the 3.2e-6 total; the round-4 factored-roots form removed
    the coefficient cancellation but still consumed a single-rounded s).
    Here s is carried as the exact pair s + s_l with s_l the sqrt residual
    (r - s^2)/(2s) (error-free via two_prod), and the cubic is evaluated
    with error-free transforms plus the first-order s_l term, making kep
    accurate to ~1 ulp of ITS OWN magnitude.  Same code path in f64.
    """
    from ..special.polyroots import _two_prod, _two_sum
    s = jnp.sqrt(r)
    p, ep = _two_prod(s, s)                  # s^2 = p + ep exactly
    s_safe = jnp.maximum(s, jnp.finfo(s.dtype).tiny)
    s_l = ((r - p) - ep) / (2.0 * s_safe)    # double-single sqrt residual
    u, eu = _two_prod(p, s)                  # s^3 = u + eu + ep*s
    m3, em3 = _two_sum(2.0 * s, s)           # 3s = m3 + em3 exactly
    v, ev = _two_sum(u, -m3)
    w, ew = _two_sum(v, 2.0 * a)
    kep = w + (((ew + ev) - em3) + (eu + ep * s)
               + (3.0 * p - 3.0) * s_l)      # + kep'(s) s_l
    s3_ = s * r                              # r^{3/2}
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
