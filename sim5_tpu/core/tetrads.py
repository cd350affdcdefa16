"""Orthonormal tetrads of various observers and frame transforms.

A tetrad is a `Tetrad` NamedTuple holding the basis e[(a)]^mu as a
(...,4,4) array (first index = tetrad vector, second = coordinate
component) plus the metric at the point.  (reference: sim5kerr.c:629-970)
"""

from typing import NamedTuple

import jax.numpy as jnp

from .metric import (Metric, kerr_metric_contravariant, dotprod,
                     vector_covariant, vector_norm_to)


class Tetrad(NamedTuple):
    e: jnp.ndarray       # (...,4,4) basis vectors e[(a)]^mu
    metric: Metric


def tetrad_general(metric: Metric, U):
    """Tetrad of an observer with general 4-velocity U (Kulkarni+11,
    Dexter16 eq.36-43).  (sim5kerr.c:630-673)

    Deviation from the reference: the reference builds
    e3 = (-u_t, 0, 0, +u_phi)/N3 (sim5kerr.c:667-670), which is NOT
    orthogonal to U (e3.U = (u_phi^2 - u_t^2)/N3).  The correct Kulkarni+11
    phi-vector is e3 = (u_phi, 0, 0, -u_t)/N3, which this function uses;
    with it e3.U = 0 and e3.e3 = 1 identically (the N3 normalisation
    identity -(u_t U^t + u_phi U^phi) D sin^2 = |e3|^2 N3^2 holds).  In the
    ZAMO limit it reduces to tetrad_zamo's e3.
    """
    u = vector_covariant(U, metric)
    u0U0_u3U3 = u[..., 0] * U[..., 0] + u[..., 3] * U[..., 3]
    one_u2U2 = 1.0 + u[..., 2] * U[..., 2]
    D = metric.r ** 2 - 2.0 * metric.r + metric.a ** 2
    N1 = jnp.sqrt(-metric.g11 * u0U0_u3U3 * one_u2U2)
    N2 = jnp.sqrt(metric.g22 * one_u2U2)
    N3 = jnp.sqrt(-u0U0_u3U3 * D * (1.0 - metric.m ** 2))
    z = jnp.zeros_like(N1)
    e0 = U
    e1 = jnp.stack([u[..., 1] * U[..., 0] / N1, -u0U0_u3U3 / N1, z,
                    u[..., 1] * U[..., 3] / N1], -1)
    e2 = jnp.stack([u[..., 2] * U[..., 0] / N2, u[..., 2] * U[..., 0] / N1,
                    one_u2U2 / N2, u[..., 2] * U[..., 3] / N2], -1)
    e3 = jnp.stack([u[..., 3] / N3, z, z, -u[..., 0] / N3], -1)
    return Tetrad(jnp.stack([e0, e1, e2, e3], -2), metric)


def tetrad_zamo(metric: Metric):
    """Tetrad of a zero-angular-momentum observer.  (sim5kerr.c:678-710)"""
    g = metric
    z = jnp.zeros_like(g.g00)
    e00 = jnp.sqrt(g.g33 / (g.g03 ** 2 - g.g33 * g.g00))
    e0 = jnp.stack([e00, z, z, -e00 * g.g03 / g.g33], -1)
    e1 = jnp.stack([z, 1.0 / jnp.sqrt(g.g11), z, z], -1)
    e2 = jnp.stack([z, z, -1.0 / jnp.sqrt(g.g22), z], -1)
    e3 = jnp.stack([z, z, z, 1.0 / jnp.sqrt(g.g33)], -1)
    return Tetrad(jnp.stack([e0, e1, e2, e3], -2), metric)


def tetrad_radial(metric: Metric, v_r):
    """Tetrad of a purely radially moving observer.  (sim5kerr.c:715-761)"""
    g = metric
    v_r = jnp.asarray(v_r, jnp.float64)
    zero_v = v_r == 0.0
    v_safe = jnp.where(zero_v, 1e-30, v_r)
    z = jnp.zeros_like(g.g00)
    U0 = jnp.sqrt((-1.0 - v_safe ** 2 * g.g11) / g.g00)
    U1 = jnp.broadcast_to(v_safe, U0.shape)
    e0 = jnp.stack([U0, U1, z, z], -1)
    UG = U0 * U0 * g.g00 + U1 * U1 * g.g11
    sq = jnp.sqrt(UG * g.g11 * g.g00)
    e1 = jnp.stack([-U1 * sq * U0 / (g.g11 * UG) * g.g11 / (U0 * g.g00),
                    sq * U0 / (g.g11 * UG), z, z], -1)
    e2 = jnp.stack([z, z, -1.0 / jnp.sqrt(g.g22), z], -1)
    e3 = jnp.stack([z, z, z, 1.0 / jnp.sqrt(g.g33)], -1)
    t = Tetrad(jnp.stack([e0, e1, e2, e3], -2), metric)
    tz = tetrad_zamo(metric)
    return Tetrad(jnp.where(jnp.asarray(zero_v)[..., None, None], tz.e, t.e), metric)


def tetrad_azimuthal(metric: Metric, Omega):
    """Tetrad of an azimuthally rotating observer.  (sim5kerr.c:766-813)"""
    g = metric
    Omega = jnp.asarray(Omega, jnp.float64)
    zero_O = Omega == 0.0
    O = jnp.where(zero_O, 1e-30, Omega)
    z = jnp.zeros_like(g.g00)
    U0 = jnp.sqrt(-1.0 / (g.g00 + 2.0 * O * g.g03 + O ** 2 * g.g33))
    U3 = U0 * O
    e0 = jnp.stack([U0, z, z, U3], -1)
    e1 = jnp.stack([z, jnp.sqrt(1.0 / g.g11), z, z], -1)
    e2 = jnp.stack([z, z, -jnp.sqrt(1.0 / g.g22), z], -1)
    k1 = g.g03 * U3 + g.g00 * U0
    k2 = g.g33 * U3 + g.g03 * U0
    e30 = -jnp.sign(k1) * k2 / jnp.sqrt(
        (g.g33 * g.g00 - g.g03 ** 2)
        * (g.g00 * U0 ** 2 + g.g33 * U3 ** 2 + 2.0 * g.g03 * U0 * U3))
    e3 = jnp.stack([e30, z, z, e30 * (-k1 / k2)], -1)
    t = Tetrad(jnp.stack([e0, e1, e2, e3], -2), metric)
    tz = tetrad_zamo(metric)
    return Tetrad(jnp.where(jnp.asarray(zero_O)[..., None, None], tz.e, t.e), metric)


def tetrad_surface(metric: Metric, Omega, V, dhdr):
    """Tetrad of an observer moving along an axisymmetric surface with angular
    velocity Omega and radial drift V (measured in the corotating frame);
    dhdr = dH/dR gives the local surface orientation.  Sadowski+2011 App. A.
    (sim5kerr.c:818-921)"""
    g = metric
    Omega, V, dhdr = (jnp.asarray(v, jnp.float64) for v in (Omega, V, dhdr))
    z = jnp.zeros_like(g.g00)
    one = jnp.ones_like(g.g00)
    # zero-radial-velocity surface tangent S0 in the [r,theta] plane
    S0r = 1.0 / jnp.sqrt(g.g11 + g.g22 * dhdr ** 2)
    S0h = S0r * dhdr
    # Sadowski+2011 Eq. A.10; sqrt evaluated on a guarded argument so the
    # V=0 case (thin disks) cannot produce inf*0 NaN gradients
    ur = V / jnp.sqrt(1.0 - V * V) / jnp.sqrt(g.g11)
    varg = (((ur / S0r) ** 2
             * (-g.g00 - 2.0 * Omega * g.g03 - Omega ** 2 * g.g33))
            / (1.0 + (ur / S0r) ** 2))
    v = jnp.sign(V) * jnp.where(
        varg > 0.0, jnp.sqrt(jnp.where(varg > 0.0, varg, 1.0)), 0.0)
    # observer 4-velocity U ~ eta + Omega xi + v S0 (Eq. A.5)
    e0 = vector_norm_to(jnp.stack([one, v * S0r, v * S0h,
                                   jnp.broadcast_to(Omega, one.shape)], -1),
                        -1.0, metric)
    # surface tangent S (Eq. A.12)
    e1 = vector_norm_to(jnp.stack([
        v * e0[..., 0],
        v * e0[..., 1] + S0r / e0[..., 0],
        v * e0[..., 2] + S0h / e0[..., 0],
        v * e0[..., 3]], -1), 1.0, metric)
    # surface normal N (Eq. A.3)
    e2 = vector_norm_to(jnp.stack([z, jnp.broadcast_to(dhdr, z.shape),
                                   -one, z], -1), 1.0, metric)
    # remaining [t,phi] space-like vector K with K.U=0 (Eq. A.8)
    e3 = vector_norm_to(jnp.stack([
        -(g.g03 + g.g33 * Omega) / (g.g00 + g.g03 * Omega), z, z, one], -1),
        1.0, metric)
    return Tetrad(jnp.stack([e0, e1, e2, e3], -2), metric)


def bl2on(Vin, tetrad: Tetrad):
    """Coordinate (BL) -> local orthonormal frame: V^(a) = eta^ab e_(b).V.

    (sim5kerr.c:925-944)
    """
    d0 = dotprod(tetrad.e[..., 0, :], Vin, tetrad.metric)
    d1 = dotprod(tetrad.e[..., 1, :], Vin, tetrad.metric)
    d2 = dotprod(tetrad.e[..., 2, :], Vin, tetrad.metric)
    d3 = dotprod(tetrad.e[..., 3, :], Vin, tetrad.metric)
    return jnp.stack([-d0, d1, d2, d3], -1)


def on2bl(Vin, tetrad: Tetrad):
    """Local orthonormal -> coordinate (BL) frame: V^mu = V^(a) e_(a)^mu.

    (sim5kerr.c:948-970)
    """
    return jnp.einsum('...a,...am->...m', Vin, tetrad.e)


def tetrad_valid(t: Tetrad, tol=1e-8):
    """Validity mask for a tetrad: e0 is unit-timelike and all components
    finite.  Use with `vector_norm_to`'s finite-fallback semantics (see its
    docstring): an observer whose 4-velocity cannot be normalized (e.g.
    superluminal Omega inside the ergosphere) fails this check."""
    from .metric import dotprod
    u2 = dotprod(t.e[..., 0, :], t.e[..., 0, :], t.metric)
    return jnp.isfinite(t.e).all((-1, -2)) & (jnp.abs(u2 + 1.0) < tol)
