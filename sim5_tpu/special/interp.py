"""Tabulated-function interpolation (linear, log-linear, cubic spline).

Batched equivalent of the reference's sim5interp object
(sim5interpolation.c): construction happens once on the host side of a jit
boundary (the table becomes a pytree of arrays); evaluation is vectorized
searchsorted + polynomial blending -- no per-call cached-index state is
needed because the whole query batch evaluates at once.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# data/type options mirroring the reference flags (sim5interpolation.h:23-37)
INTERP_TYPE_LINLIN = 0   # linear in x, linear in y
INTERP_TYPE_LOGLOG = 1   # log in x, log in y
INTERP_TYPE_LOGLIN = 2   # log in x, linear in y
INTERP_TYPE_SPLINE = 3   # natural cubic spline
INTERP_OPT_ALLOW_EXTRAPOLATION = 1


class Interp(NamedTuple):
    """Immutable interpolation table."""
    x: jnp.ndarray
    y: jnp.ndarray
    y2: jnp.ndarray          # spline second derivatives (zeros otherwise)
    itype: int
    options: int

    def __call__(self, xq):
        return interp_eval(self, xq)


def _spline_second_derivs(x, y):
    """Natural cubic-spline second derivatives (NR `spline`,
    sim5interpolation.c:75-119), solved host-side with the standard
    tridiagonal sweep."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = len(x)
    y2 = np.zeros(n)
    u = np.zeros(n)
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        u[i] = ((y[i + 1] - y[i]) / (x[i + 1] - x[i])
                - (y[i] - y[i - 1]) / (x[i] - x[i - 1]))
        u[i] = (6.0 * u[i] / (x[i + 1] - x[i - 1]) - sig * u[i - 1]) / p
    for k in range(n - 2, -1, -1):
        y2[k] = y2[k] * y2[k + 1] + u[k]
    return y2


def interp_init(x, y, itype=INTERP_TYPE_LINLIN, options=0):
    """Build an interpolation table.  (reference: sim5_interp_init,
    sim5interpolation.c:184-291)"""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if itype in (INTERP_TYPE_LOGLOG, INTERP_TYPE_LOGLIN):
        xs = np.log(x)
    else:
        xs = x
    ys = np.log(y) if itype == INTERP_TYPE_LOGLOG else y
    y2 = (_spline_second_derivs(xs, ys) if itype == INTERP_TYPE_SPLINE
          else np.zeros_like(xs))
    return Interp(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(y2),
                  itype, options)


class InterpBuilder:
    """Incremental-build data model (reference: INTERP_DATA_BUILD,
    sim5interpolation.h:26 + sim5_interp_data_push, sim5interpolation.c:296-322).

    The reference lets callers create an empty sim5interp and push (x, y)
    samples one at a time (capacity grows geometrically) before evaluating.
    Host-side construction is the natural place for that here: points
    accumulate in Python lists and `finalize()` freezes them into the
    immutable device `Interp` pytree.  Pushes must arrive in strictly
    increasing x order, exactly as the reference enforces
    (sim5interpolation.c:315-319).
    """

    def __init__(self, itype=INTERP_TYPE_LINLIN, options=0):
        self.itype = itype
        self.options = options
        self._x = []
        self._y = []

    def push(self, x, y):
        """Append one (x, y) sample (reference: sim5_interp_data_push)."""
        x = float(x)
        if self._x and x <= self._x[-1]:
            raise ValueError(
                f"unordered X grid (x[{len(self._x)-1}]={self._x[-1]:.4e}, "
                f"x[{len(self._x)}]={x:.4e})")
        self._x.append(x)
        self._y.append(float(y))
        return self

    def __len__(self):
        return len(self._x)

    def finalize(self):
        """Freeze pushed data into an `Interp` table."""
        if len(self._x) < 2:
            raise ValueError("need at least 2 pushed points")
        return interp_init(self._x, self._y, self.itype, self.options)


def interp_init_build(itype=INTERP_TYPE_LINLIN, options=0):
    """Create an empty incremental-build table (INTERP_DATA_BUILD mode)."""
    return InterpBuilder(itype, options)


def interp_eval(tab: Interp, xq):
    """Evaluate the table at query points (batched).

    (reference: sim5_interp_eval, sim5interpolation.c:299-345)
    """
    xq = jnp.asarray(xq, jnp.float64)
    if tab.itype in (INTERP_TYPE_LOGLOG, INTERP_TYPE_LOGLIN):
        xe = jnp.log(xq)
    else:
        xe = xq
    i = jnp.clip(jnp.searchsorted(tab.x, xe) - 1, 0, tab.x.shape[0] - 2)
    x0 = tab.x[i]
    x1 = tab.x[i + 1]
    y0 = tab.y[i]
    y1 = tab.y[i + 1]
    h = x1 - x0
    t = (xe - x0) / h
    if tab.itype == INTERP_TYPE_SPLINE:
        a = 1.0 - t
        val = (a * y0 + t * y1
               + ((a ** 3 - a) * tab.y2[i] + (t ** 3 - t) * tab.y2[i + 1])
               * (h * h) / 6.0)
    else:
        val = y0 + t * (y1 - y0)
    if tab.itype == INTERP_TYPE_LOGLOG:
        val = jnp.exp(val)
    if not (tab.options & INTERP_OPT_ALLOW_EXTRAPOLATION):
        val = jnp.where((xe < tab.x[0]) | (xe > tab.x[-1]), jnp.nan, val)
    return val
