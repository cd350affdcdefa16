"""Kerr / Kerr-Newman / Minkowski metric, Christoffel connection and
4-vector algebra in Boyer-Lindquist coordinates (t, r, theta, phi).

TPU-native design notes
-----------------------
* A metric is a `Metric` NamedTuple of arrays (a pytree) -- batches come from
  leading array dims, so everything vmaps/shards transparently.
* The connection is returned as a dense symmetric (...,4,4,4) array of the
  TRUE Christoffel symbols Gamma^i_{jk} (the reference's 2x-premultiplied
  upper-triangle layout, sim5kerr.c:233-316, is a C-loop optimization that
  does not pay on a vector unit; geodesic acceleration contracts with a
  single einsum that XLA fuses).
* Poloidal coordinate is m = cos(theta) everywhere, as in the reference.

(reference: sim5kerr.c:30-625)
"""

from typing import NamedTuple

import jax.numpy as jnp


class Metric(NamedTuple):
    """Covariant (or contravariant) metric components at a point."""
    a: jnp.ndarray
    r: jnp.ndarray
    m: jnp.ndarray    # cos(theta)
    g00: jnp.ndarray
    g11: jnp.ndarray
    g22: jnp.ndarray
    g33: jnp.ndarray
    g03: jnp.ndarray


def flat_metric(r, m):
    """Minkowski metric in spherical coordinates.  (sim5kerr.c:31-48)"""
    r, m = jnp.broadcast_arrays(jnp.asarray(r, jnp.float64), jnp.asarray(m, jnp.float64))
    z = jnp.zeros_like(r)
    return Metric(z, r, m, -jnp.ones_like(r), jnp.ones_like(r),
                  r * r, r * r * (1.0 - m * m), z)


def flat_metric_contravariant(r, m):
    """Contravariant Minkowski metric.  (sim5kerr.c:53-70)"""
    r, m = jnp.broadcast_arrays(jnp.asarray(r, jnp.float64), jnp.asarray(m, jnp.float64))
    z = jnp.zeros_like(r)
    return Metric(z, r, m, -jnp.ones_like(r), jnp.ones_like(r),
                  1.0 / (r * r), 1.0 / (r * r) / (1.0 - m * m), z)


def kerr_metric(a, r, m):
    """Covariant Kerr metric g_munu.  (sim5kerr.c:75-101)"""
    a, r, m = jnp.broadcast_arrays(*(jnp.asarray(v, jnp.float64) for v in (a, r, m)))
    r2, a2, m2 = r * r, a * a, m * m
    S = r2 + a2 * m2
    s2_S = (1.0 - m2) / S
    return Metric(
        a, r, m,
        -1.0 + 2.0 * r / S,
        S / (r2 - 2.0 * r + a2),
        S,
        ((a2 + r2) * S + 2.0 * r * a2 * s2_S * S) * s2_S,
        -2.0 * a * r * s2_S,
    )


def kerr_metric_contravariant(a, r, m):
    """Contravariant Kerr metric g^munu.  (sim5kerr.c:106-131)"""
    a, r, m = jnp.broadcast_arrays(*(jnp.asarray(v, jnp.float64) for v in (a, r, m)))
    r2, a2, m2 = r * r, a * a, m * m
    S = r2 + a2 * m2
    SD = S * (r2 - 2.0 * r + a2)
    return Metric(
        a, r, m,
        -((r2 + a2) ** 2) / SD + a2 * (1.0 - m2) / S,
        (r2 - 2.0 * r + a2) / S,
        1.0 / S,
        1.0 / S / (1.0 - m2) - a2 / SD,
        -2.0 * a * r / SD,
    )


def kerr_newman_metric(a, Q, r, m):
    """Covariant Kerr-Newman metric.  (sim5kerr.c:136-163)"""
    a, Q, r, m = jnp.broadcast_arrays(*(jnp.asarray(v, jnp.float64) for v in (a, Q, r, m)))
    rQ = Q * Q
    r2, a2, m2 = r * r, a * a, m * m
    S = r2 + a2 * m2
    s2_S = (1.0 - m2) / S
    return Metric(
        a, r, m,
        -1.0 + (2.0 * r - rQ) / S,
        S / (r2 - 2.0 * r + a2 + rQ),
        S,
        ((a2 + r2) * S + (2.0 * r - rQ) * a2 * s2_S * S) * s2_S,
        -a * (2.0 * r - rQ) * s2_S,
    )


def kerr_newman_metric_contravariant(a, Q, r, m):
    """Contravariant Kerr-Newman metric.  (sim5kerr.c:168-194)"""
    a, Q, r, m = jnp.broadcast_arrays(*(jnp.asarray(v, jnp.float64) for v in (a, Q, r, m)))
    rQ = Q * Q
    r2, a2, m2 = r * r, a * a, m * m
    S = r2 + a2 * m2
    SD = S * (r2 - 2.0 * r + a2 + rQ)
    return Metric(
        a, r, m,
        -((r2 + a2) ** 2) / SD + a2 * (1.0 - m2) / S,
        (r2 - 2.0 * r + a2 + rQ) / S,
        1.0 / S,
        1.0 / S / (1.0 - m2) - a2 / SD,
        a * (-2.0 * r + rQ) / SD,
    )


def _sym_connection(entries, batch_shape):
    """Assemble a dense symmetric (...,4,4,4) Gamma^i_{jk} from a dict
    {(i,j,k): value} of the independent nonzero components (j<=k)."""
    G = [[[None] * 4 for _ in range(4)] for _ in range(4)]
    zero = jnp.zeros(batch_shape, jnp.float64)
    for i in range(4):
        for j in range(4):
            for k in range(4):
                jj, kk = min(j, k), max(j, k)
                v = entries.get((i, jj, kk))
                G[i][j][k] = zero if v is None else v
    return jnp.stack([jnp.stack([jnp.stack(row, -1) for row in plane], -2)
                      for plane in G], -3)


def _flat_conn_entries(r, m):
    """Nonzero Christoffel components {(i,j<=k): Gamma^i_jk} for Minkowski
    in spherical coords.  (sim5kerr.c:199-228)"""
    r, m = jnp.broadcast_arrays(jnp.asarray(r, jnp.float64), jnp.asarray(m, jnp.float64))
    s = jnp.sqrt(1.0 - m * m)
    e = {
        (1, 2, 2): -r,
        (1, 3, 3): -r * s * s,
        (2, 1, 2): 1.0 / r,
        (2, 3, 3): -m * s,
        (3, 1, 3): 1.0 / r,
        (3, 2, 3): m / s,
    }
    return e, r.shape


def flat_connection(r, m):
    """Christoffel symbols for Minkowski metric in spherical coords.

    Returns true Gamma^i_{jk} as (...,4,4,4).  (sim5kerr.c:199-228)
    """
    return _sym_connection(*_flat_conn_entries(r, m))


def _kerr_conn_entries(a, r, m):
    """Nonzero Christoffel components {(i,j<=k): Gamma^i_jk} for Kerr.
    (sim5kerr.c:233-316; the reference's 2x premultiplication of
    off-diagonal terms is undone here -- see module docstring)"""
    a, r, m = jnp.broadcast_arrays(*(jnp.asarray(v, jnp.float64) for v in (a, r, m)))
    rS = 2.0 * r
    s = jnp.sqrt(1.0 - m * m)
    cs = s * m
    c2 = m * m
    s2 = s * s
    cc = c2 - s2
    CC = 8.0 * c2 * c2 - 8.0 * c2 + 1.0
    a2 = a * a
    a4 = a2 * a2
    a2cc = a2 * cc
    a2c2 = a2 * c2
    a2cs = a2 * cs
    a4CC = a4 * CC
    r2 = r * r
    r3 = r2 * r
    r4 = r2 * r2
    a2r2 = a2 * r2
    a2_r2 = a2 + r2
    R = (a2 + 2.0 * r2 + a2cc) ** 2
    D = r2 - 2.0 * r + a2
    S = r2 + a2c2
    S_1 = 1.0 / S
    S_3 = 1.0 / (S * S * S)
    D_1 = 1.0 / D
    R_1 = 1.0 / R
    m_s = m / s
    DR_1 = D_1 * R_1
    DS_1 = D_1 * S_1
    dbl_r2 = 2.0 * r2

    G100 = D * (r2 - a2c2) * S_3
    G200 = -2.0 * r * a2cs * S_3
    G002 = -4.0 * a2cs * rS * R_1

    e = {
        (0, 0, 1): 4.0 * a2_r2 * (r2 - a2c2) * DR_1,
        (0, 0, 2): G002,
        (0, 1, 3): 2.0 * a * s2 * (a4 - 3.0 * a2r2 - 6.0 * r4 + a2cc * (a2 - r2)) * DR_1,
        (0, 2, 3): -G002 * s2 * a,
        (1, 0, 0): G100,
        (1, 0, 3): -G100 * a * s2,
        (1, 1, 1): (r * (a2 - r) + a2 * (1.0 - r) * c2) * DS_1,
        (1, 1, 2): -a2cs * S_1,
        (1, 2, 2): -r * D * S_1,
        (1, 3, 3): -D * s2 * (2.0 * a2c2 * r3 + r2 * r3 + a2 * a2c2 * s2
                              + a2c2 * a2c2 * r - a2r2 * s2) * S_3,
        (2, 0, 0): G200,
        (2, 0, 3): -G200 * a2_r2 / a,
        (2, 1, 1): a2cs * DS_1,
        (2, 1, 2): r * S_1,
        (2, 2, 2): -a2cs * S_1,
        (2, 3, 3): -cs * (a2_r2 * S * S + a2 * s2 * rS * (a2_r2 + S)) * S_3,
        (3, 0, 1): a * (r2 - a2c2) * DS_1 * S_1,
        (3, 0, 2): -4.0 * a * rS * m_s * R_1,
        (3, 1, 3): 0.5 * (a4 + 3.0 * a4 * r - 12.0 * a2r2 + 8.0 * a2 * r3
                          - 16.0 * r4 + 8.0 * r2 * r3
                          + 4.0 * r * (dbl_r2 - r + a2) * a2cc
                          - a4CC * (1.0 - r)) * DR_1,
        (3, 2, 3): 0.5 * ((3.0 * a4 + 8.0 * a2 * r + 8.0 * a2r2 + 8.0 * r4
                           + 4.0 * (dbl_r2 - 2.0 * r + a2) * a2cc + a4CC) * m_s) * R_1,
    }
    return e, r.shape


def kerr_connection(a, r, m):
    """Christoffel symbols Gamma^i_{jk} for the Kerr metric, dense symmetric
    (...,4,4,4).  (sim5kerr.c:233-316)"""
    return _sym_connection(*_kerr_conn_entries(a, r, m))


def kerr_newman_connection(a, Q, r, m):
    """Christoffel symbols for the Kerr-Newman metric.  (sim5kerr.c:321-400)"""
    a, Q, r, m = jnp.broadcast_arrays(*(jnp.asarray(v, jnp.float64) for v in (a, Q, r, m)))
    rS = 2.0 * r
    rQ = Q * Q
    s = jnp.sqrt(1.0 - m * m)
    cs = s * m
    c2 = m * m
    s2 = s * s
    cc = c2 - s2
    CC = 8.0 * c2 * c2 - 8.0 * c2 + 1.0
    a2 = a * a
    a4 = a2 * a2
    a2cc = a2 * cc
    a2c2 = a2 * c2
    a2cs = a2 * cs
    r2 = r * r
    r3 = r2 * r
    a2_r2 = a2 + r2
    R = (a2 + 2.0 * r2 + a2cc) ** 2
    D = r2 - 2.0 * r + a2 + rQ
    S = r2 + a2c2
    S_1 = 1.0 / S
    S_3 = 1.0 / (S * S * S)
    R_1 = 1.0 / R
    m_s = m / s
    DR_1 = R_1 / D
    DS_1 = S_1 / D
    dbl_r2 = 2.0 * r2

    G100 = D * (r * (r - rQ) - a2c2) * S_3
    G200 = -(2.0 * r - rQ) * a2cs * S_3
    G002 = -4.0 * a2cs * (rS - rQ) * R_1

    e = {
        (0, 0, 1): 4.0 * a2_r2 * (r * (r - rQ) - a2c2) * DR_1,
        (0, 0, 2): G002,
        (0, 1, 3): 4.0 * a * s2 * (-a2 * (r2 - r * rQ) - r3 * (3.0 * r - 2.0 * rQ)
                                   + a2cc * (a2 - r2 + r * rQ)) * DR_1,
        (0, 2, 3): -G002 * s2 * a,
        (1, 0, 0): G100,
        (1, 0, 3): -G100 * a * s2,
        (1, 1, 1): (r * (a2 - r + rQ) + a2 * (1.0 - r) * c2) * DS_1,
        (1, 1, 2): -a2cs * S_1,
        (1, 2, 2): -r * D * S_1,
        (1, 3, 3): -D * s2 * (2.0 * a2c2 * r3 + r2 * r3 + a2 * a2c2 * s2
                              + a2c2 * a2c2 * r - a2 * r * (r - rQ) * s2) * S_3,
        (2, 0, 0): G200,
        (2, 0, 3): -G200 * a2_r2 / a,
        (2, 1, 1): a2cs * DS_1,
        (2, 1, 2): r * S_1,
        (2, 2, 2): -a2cs * S_1,
        (2, 3, 3): -cs * (a2_r2 * S * S + a2 * s2 * (rS - rQ) * (a2_r2 + S)) * S_3,
        (3, 0, 1): a * (r * (r - rQ) - a2c2) * DS_1 * S_1,
        (3, 0, 2): -4.0 * a * (rS - rQ) * m_s * R_1,
        (3, 1, 3): 4.0 * (r3 * (r2 - rS + rQ) + r * a2c2 * a2c2
                          - a2 * r * (r - rQ) * s2 + a2c2 * r * (dbl_r2 - rS + rQ)
                          + a2c2 * a2 * s2) * DR_1,
        (3, 2, 3): ((3.0 * a4 + 8.0 * a2 * r + 8.0 * a2 * r2 + 8.0 * r2 * r2
                     + 4.0 * (dbl_r2 - rS + rQ + a2) * a2cc + a4 * CC) * m_s) * (R_1 / 2.0),
    }
    return _sym_connection(e, r.shape)


def Gamma(G, U, V):
    """Transport derivative -Gamma^i_{jk} (U^j V^k + U^k V^j)/2.

    With the dense symmetric connection this is a plain contraction.
    (reference: sim5kerr.c:421-440)
    """
    return -0.5 * (jnp.einsum('...ijk,...j,...k->...i', G, U, V)
                   + jnp.einsum('...ijk,...j,...k->...i', G, V, U))


def geodesic_accel(G, k):
    """dk^i/dlambda = -Gamma^i_{jk} k^j k^k."""
    return -jnp.einsum('...ijk,...j,...k->...i', G, k, k)


def _sparse_transport(entries, U, V):
    """-Gamma^i_{jk} U^j V^k contracted directly from the nonzero component
    dict (j<=k entries; Gamma symmetric in jk).

    TPU hot-path form: the connection has <=20 independent nonzero
    components, so contracting them inline is a short fused elementwise
    chain -- building the dense (...,4,4,4) tensor instead streams 64
    values/point through HBM per evaluation, which dominates the stepwise
    integrator (measured ~6x on the march benchmark).
    """
    out = [None, None, None, None]
    for (i, j, k), g in entries.items():
        term = (g * (U[..., j] * V[..., k] + U[..., k] * V[..., j])
                if j != k else g * (U[..., j] * V[..., k]))
        out[i] = term if out[i] is None else out[i] + term
    zero = jnp.zeros(jnp.broadcast_shapes(U.shape[:-1], V.shape[:-1]))
    return -jnp.stack([zero if o is None else jnp.broadcast_to(o, zero.shape)
                       for o in out], -1)


def kerr_transport_accel(a, r, m, U, V):
    """-Gamma^i_{jk} U^j V^k for Kerr without the dense tensor.

    With U = V = k this is the geodesic acceleration; with U = k, V = f it
    is the parallel-transport derivative (Gamma is jk-symmetric, so the
    symmetrized contraction equals the plain one).
    """
    e, _ = _kerr_conn_entries(a, r, m)
    return _sparse_transport(e, U, V)


def flat_transport_accel(r, m, U, V):
    """-Gamma^i_{jk} U^j V^k for Minkowski (spherical) without the dense
    tensor."""
    e, _ = _flat_conn_entries(r, m)
    return _sparse_transport(e, U, V)


# -----------------------------------------------------------------
# 4-vector algebra  (sim5kerr.c:443-625)
# -----------------------------------------------------------------

def vector(x0, x1, x2, x3):
    """Assemble a 4-vector along the trailing axis."""
    return jnp.stack(jnp.broadcast_arrays(
        *(jnp.asarray(v, jnp.float64) for v in (x0, x1, x2, x3))), -1)


def vector_covariant(V, metric: Metric):
    """Lower the index: X^mu -> X_mu.  (sim5kerr.c:477-499)"""
    return jnp.stack([
        V[..., 0] * metric.g00 + V[..., 3] * metric.g03,
        V[..., 1] * metric.g11,
        V[..., 2] * metric.g22,
        V[..., 3] * metric.g33 + V[..., 0] * metric.g03,
    ], -1)


def dotprod(V1, V2, metric: Metric = None):
    """Scalar product U.V; flat metric when `metric` is None.  (sim5kerr.c:608-625)"""
    if metric is None:
        return (-V1[..., 0] * V2[..., 0] + V1[..., 1] * V2[..., 1]
                + V1[..., 2] * V2[..., 2] + V1[..., 3] * V2[..., 3])
    return (V1[..., 0] * V2[..., 0] * metric.g00
            + V1[..., 1] * V2[..., 1] * metric.g11
            + V1[..., 2] * V2[..., 2] * metric.g22
            + V1[..., 3] * V2[..., 3] * metric.g33
            + (V1[..., 0] * V2[..., 3] + V1[..., 3] * V2[..., 0]) * metric.g03)


def vector_norm(V, metric: Metric = None):
    """sqrt(V.V) for space-like V.  (sim5kerr.c:503-515)"""
    return jnp.sqrt(dotprod(V, V, metric))


def vector_3norm(V):
    """Spatial 3-norm.  (sim5kerr.c:519-530)"""
    return jnp.sqrt(V[..., 1] ** 2 + V[..., 2] ** 2 + V[..., 3] ** 2)


def vector_norm_to(V, norm, metric: Metric = None):
    """Scale V so that V.V == norm (norm>0 space-like, norm<0 time-like).

    Deviation from the reference (sim5kerr.c:552-572): lanes where
    norm/V.V <= 0 (wrong causal character) return V UNSCALED instead of
    NaN -- NaN primals irrecoverably poison reverse-mode gradients of
    every co-batched lane, so validity must be checked explicitly (e.g.
    `tetrad_valid`); the reference's NaN would appear wherever such a
    vector is used anyway.
    """
    N = dotprod(V, V, metric)
    ratio = norm / N
    good = ratio > 0.0
    fac = jnp.sqrt(jnp.where(good, ratio, 1.0))
    return V * jnp.where(good, fac, 1.0)[..., None]


def vector_norm_to_null(V, V0, metric: Metric = None):
    """Rescale the spatial part of a null vector so that V.V=0 with time
    component V0.  (sim5kerr.c:575-604)
    """
    if metric is None:
        a = V[..., 1] ** 2 + V[..., 2] ** 2 + V[..., 3] ** 2
        alpha = jnp.sqrt(V0 * V0 / a)
    else:
        a = (V[..., 1] ** 2 * metric.g11 + V[..., 2] ** 2 * metric.g22
             + V[..., 3] ** 2 * metric.g33)
        b = V0 * V[..., 3] * metric.g03   # b/2 of the quadratic
        c = V0 * V0 * metric.g00
        disc = jnp.sqrt(b * b - a * c)
        alpha = jnp.maximum(-b / a + disc / a, -b / a - disc / a)
    out = V * alpha[..., None]
    return out.at[..., 0].set(jnp.broadcast_to(V0, out[..., 0].shape))
