"""Scalar root finding: fixed-depth bisection with implicit differentiation.

Replaces the reference's rtbis (sim5roots.c:21-64).  The bisection runs a
static number of halvings (60 halvings of [lo,hi] reach ~1e-18 relative
width -- far below the reference's configurable tolerance); gradients flow
through `lax.custom_root`'s implicit-function rule, so solves are cleanly
differentiable w.r.t. parameters captured by the objective closure.
"""

import jax
import jax.numpy as jnp


def rtbis(f, lo, hi, n_iter=60):
    """Root of f on [lo, hi] (f(lo), f(hi) must bracket).  Batched over the
    broadcast shape of (lo, hi) and f's output."""
    lo = jnp.asarray(lo, jnp.float64)
    hi = jnp.asarray(hi, jnp.float64)
    flo = f(lo)
    # orient so that f(lo_oriented) < 0
    swap = flo > 0.0
    lo_, hi_ = jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)

    def body(_, state):
        lo_, hi_ = state
        mid = 0.5 * (lo_ + hi_)
        below = f(mid) < 0.0
        return jnp.where(below, mid, lo_), jnp.where(below, hi_, mid)

    lo_, hi_ = jax.lax.fori_loop(0, n_iter, body, (lo_, hi_))
    return 0.5 * (lo_ + hi_)


def rtbis_implicit(f_param, param, lo, hi, n_iter=60):
    """Differentiable root solve: x(param) with f_param(param, x) = 0.

    Uses `lax.custom_root` so d x/d param follows the implicit function
    theorem instead of differentiating the bisection iterations.
    """
    def solve(g, _x0):
        return rtbis(g, lo, hi, n_iter)

    def tangent_solve(g, y):
        # scalar linear solve: g is linearized objective
        return y / jax.grad(g)(jnp.zeros_like(y)) if False else y / _dg(g, y)

    def _dg(g, y):
        # derivative of the scalar linear map g at 0: g(1) - g(0)
        return g(jnp.ones_like(y)) - g(jnp.zeros_like(y))

    return jax.lax.custom_root(lambda x: f_param(param, x),
                               0.5 * (jnp.asarray(lo) + jnp.asarray(hi)),
                               solve, tangent_solve)
