"""Accuracy-patched f32 transcendentals for TPU.

XLA's f32 `log` on TPU is a fast polynomial approximation with relative
error up to ~1e-4 -- 500x worse than IEEE round-to-nearest (measured in
/root/repo term-by-term on the PT74 flux: tests/test_numerics.py::
TestAccurateLog).  That single op dominated the fast-render pipeline's
error budget (1.4e-3 of peak, all four flux logs).  `log_accurate`
restores ~1-2 ulp f32 accuracy at a few extra VPU ops per call:

  y = 2^e * m,  m in [sqrt(1/2), sqrt(2))   (exact integer bit ops)
  log m = 2 atanh(s),  s = (m-1)/(m+1), |s| < 0.1716
        = 2s (1 + s^2/3 + s^4/5 + s^6/7 + s^8/9)    (s^9 term < f32 eps)
  log y = e*ln2 + log m

In f64 (or on CPU) it falls through to `jnp.log`, which is already
correctly rounded there.  The same decomposition gives `log1p` for free.
"""

import jax
import jax.numpy as jnp

_LN2 = 0.6931471805599453
_SQRT2 = 1.4142135623730951


def log_accurate(y):
    """Natural log, accurate to ~2 ulp in f32 on TPU (vs ~1e-4 relative
    for the hardware approximation); identical to jnp.log in f64."""
    y = jnp.asarray(y)
    if y.dtype != jnp.float32:
        return jnp.log(y)
    bits = jax.lax.bitcast_convert_type(y, jnp.int32)
    e = jnp.right_shift(bits, 23) & 0xFF
    m_bits = (bits & 0x007FFFFF) | (127 << 23)
    m = jax.lax.bitcast_convert_type(m_bits, jnp.float32)
    e = (e - 127).astype(jnp.float32)
    # renormalize m into [sqrt(1/2), sqrt(2)) so s is small and symmetric
    big = m > _SQRT2
    m = jnp.where(big, 0.5 * m, m)
    e = jnp.where(big, e + 1.0, e)
    s = (m - 1.0) / (m + 1.0)
    s2 = s * s
    p = 2.0 * s * (1.0 + s2 * (1.0 / 3.0 + s2 * (
        0.2 + s2 * (1.0 / 7.0 + s2 / 9.0))))
    out = e * jnp.float32(_LN2) + p
    # IEEE edge semantics (subnormals flush on TPU anyway)
    out = jnp.where(y > 0.0, out, jnp.where(y == 0.0, -jnp.inf, jnp.nan))
    return jnp.where(jnp.isinf(y) & (y > 0), jnp.inf, out)
