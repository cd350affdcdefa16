"""Numerical quadrature: fixed-grid trapezoid/Simpson and Gauss-Legendre.

Replaces the reference's adaptive refinement loops (sim5integration.c) with
fixed-resolution rules -- deterministic, lockstep, differentiable.  Node
counts are static arguments; the defaults match the reference's accuracy
targets (rel. tol ~1e-5) on the workloads it uses them for.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def integrate_trapezoid(f, a, b, n=4096):
    """Trapezoid rule with n panels.  (reference: integrate_trapezoid,
    sim5integration.c:34-77)"""
    xs = a + (b - a) * jnp.arange(n + 1) / n
    ys = f(xs)
    w = trapezoid_weights(n)
    return (b - a) / n * jnp.sum(w * ys)


def integrate_simpson(f, a, b, n=4096):
    """Composite Simpson rule with n panels (n even).

    (reference: integrate_simpson, sim5integration.c:96-133)
    """
    n = n + (n % 2)
    xs = a + (b - a) * jnp.arange(n + 1) / n
    ys = f(xs)
    w = simpson_weights(n)
    return (b - a) / n / 3.0 * jnp.sum(w * ys)


def trapezoid_weights(n):
    """Trapezoid weights [0.5, 1, ..., 1, 0.5] built branchlessly (no
    scatter: strided in-place updates compile poorly on some TPU runtimes
    and a where-on-index is the idiomatic XLA form anyway)."""
    i = jnp.arange(n + 1)
    return jnp.where((i == 0) | (i == n), 0.5, 1.0)


def simpson_weights(n):
    """Composite-Simpson weights [1, 4, 2, 4, ..., 2, 4, 1] (n even),
    built branchlessly from index parity instead of strided scatter."""
    i = jnp.arange(n + 1)
    inner = jnp.where(i % 2 == 1, 4.0, 2.0)
    return jnp.where((i == 0) | (i == n), 1.0, inner)


def gauleg(a, b, n):
    """Gauss-Legendre nodes and weights on [a, b] (host-side; static n).

    (reference: gauleg, sim5integration.c:163-213)
    """
    x, w = np.polynomial.legendre.leggauss(n)
    x = 0.5 * (b - a) * x + 0.5 * (b + a)
    w = 0.5 * (b - a) * w
    return jnp.asarray(x), jnp.asarray(w)


def qgaus(f, a, b, n=10):
    """Fixed-order Gauss-Legendre quadrature.  (reference: qgaus,
    sim5integration.c:138-155)"""
    x, w = gauleg(a, b, n)
    return jnp.sum(w * f(x))
