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


# exp/expm1: XLA's TPU f32 exp is ~8e-6 relative and expm1 ~1.1e-4
# (measured; IEEE is ~6e-8).  Same cure: exact power-of-two split
# x = k*ln2 + r with a hi/lo-split ln2, degree-7 Taylor of expm1(r) on
# |r| <= ln2/2, and 2^k assembled by integer exponent bits.

_LN2_HI = 0.693145751953125        # upper bits of ln2, exact in f32
_LN2_LO = 1.428606765330187e-06    # ln2 - _LN2_HI
_INV_LN2 = 1.4426950408889634


def _exp_split(x):
    """(2^k as f32, expm1(r), k) with x = k*ln2 + r, |r| <= ln2/2."""
    kf = jnp.round(x * jnp.float32(_INV_LN2))
    r = x - kf * jnp.float32(_LN2_HI)
    r = r - kf * jnp.float32(_LN2_LO)
    p = r * (1.0 + r * (0.5 + r * (1.0 / 6.0 + r * (1.0 / 24.0 + r * (
        1.0 / 120.0 + r * (1.0 / 720.0 + r / 5040.0))))))
    k = jnp.clip(kf, -126.0, 127.0).astype(jnp.int32)
    two_k = jax.lax.bitcast_convert_type((k + 127) << 23, jnp.float32)
    return two_k, p, kf


def exp_accurate(x):
    """exp, ~2 ulp in f32 on TPU (vs ~8e-6 for the hardware path);
    identical to jnp.exp in f64."""
    x = jnp.asarray(x)
    if x.dtype != jnp.float32:
        return jnp.exp(x)
    two_k, p, kf = _exp_split(x)
    out = two_k * (1.0 + p)
    out = jnp.where(x > 88.72, jnp.inf, out)
    out = jnp.where(x < -87.3, 0.0, out)
    return jnp.where(jnp.isnan(x), jnp.nan, out)


def vlog(u):
    """u - log1p(u) for u >= 0, computed WITHOUT the cancellation of the
    direct subtraction (which loses ~(2/u) digits as u -> 0).

    Via the atanh form log1p(u) = 2 atanh(s), s = u/(2+u):
      u - 2s = u^2/(2+u) exactly, so
      vlog(u) = u^2/(2+u) - 2(s^3/3 + s^5/5 + s^7/7 + s^9/9),
    truncation < 5e-8 relative for u <= 0.5; larger u uses the direct
    subtraction (no cancellation there).  Used by the stable Page-Thorne
    flux bracket (disk/nt.py); exact math identity, so the f64 path is
    unchanged to ~1e-16.
    """
    u = jnp.asarray(u)
    if u.dtype != jnp.float32:
        # f64: log1p is correctly rounded; the residual cancellation
        # (~ulp(u) absolute) is far below the golden gates at all u
        return u - jnp.log1p(u)
    s = u / (2.0 + u)
    s2 = s * s
    series = u * u / (2.0 + u) - 2.0 * s * s2 * (
        1.0 / 3.0 + s2 * (0.2 + s2 * (1.0 / 7.0 + s2 / 9.0)))
    direct = u - log_accurate(1.0 + u)
    return jnp.where(u <= 0.5, series, direct)


def two_sum(a, b):
    """Knuth error-free transform: a + b = s + err exactly."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def two_prod(a, b):
    """Dekker/Veltkamp error-free product: a * b = p + err exactly
    (no FMA assumption; splitter picked for the active dtype)."""
    splitter = 134217729.0 if a.dtype == jnp.float64 else 4097.0
    ca = a * splitter
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = b * splitter
    bhi = cb - (cb - b)
    blo = b - bhi
    p = a * b
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def sqrt_df(x):
    """sqrt(x) as a two-float pair (hi, lo): hi = fl(sqrt(x)), lo the
    Newton residual (x - hi^2)/(2 hi) with hi^2 formed error-free.
    Accurate to ~ulp^2; used where a DIFFERENCE of square roots must be
    accurate to far below ulp of the operands (e.g. the Page-Thorne
    delta = sqrt(r) - sqrt(rms) near the disk inner edge)."""
    x = jnp.asarray(x)
    hi = jnp.sqrt(x)
    hi_safe = jnp.where(hi > 0.0, hi, 1.0)
    p, e = two_prod(hi_safe, hi_safe)
    lo = ((x - p) - e) / (2.0 * hi_safe)
    return hi, jnp.where(hi > 0.0, lo, 0.0)


def expm1_accurate(x):
    """expm1, ~2 ulp in f32 on TPU (vs ~1.1e-4 for the hardware path);
    identical to jnp.expm1 in f64."""
    x = jnp.asarray(x)
    if x.dtype != jnp.float32:
        return jnp.expm1(x)
    two_k, p, kf = _exp_split(x)
    # k == 0: expm1 = p directly (no cancellation); else 2^k(1+p) - 1,
    # whose cancellation is benign because |2^k(1+p)| is far from 1
    out = jnp.where(kf == 0.0, p, two_k * (1.0 + p) - 1.0)
    out = jnp.where(x > 88.72, jnp.inf, out)
    out = jnp.where(x < -87.3, -1.0, out)
    return jnp.where(jnp.isnan(x), jnp.nan, out)
