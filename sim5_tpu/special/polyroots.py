"""Closed-form polynomial root solvers (quadratic, cubic, quartic).

Vectorized equivalents of sim5polyroots.c.  Roots are returned as separate
(real, imag) arrays -- complex dtypes are avoided so everything maps cleanly
onto TPU vector registers.
"""

import jax.numpy as jnp


def quadratic_roots(a, b, c):
    """Roots of a x^2 + b x + c = 0.

    Returns (re, im) each of shape (..., 2) and n_real of shape (...).
    (reference: sim5polyroots.c:8-60)
    """
    a, b, c = jnp.broadcast_arrays(*(jnp.asarray(v, jnp.float64) for v in (a, b, c)))
    d = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.abs(d))
    # real case (numerically stable form)
    qq = -0.5 * (b + jnp.sign(b) * sq)
    a_safe = jnp.where(a == 0.0, 1.0, a)
    qq_safe = jnp.where(qq == 0.0, 1.0, qq)
    r1 = qq / a_safe
    r2 = c / qq_safe
    re_real = jnp.stack([jnp.maximum(r1, r2), jnp.minimum(r1, r2)], -1)
    im_real = jnp.zeros_like(re_real)
    # complex case
    re_c = jnp.stack([-b / (2 * a_safe)] * 2, -1)
    im_c = jnp.stack([sq / (2 * a_safe), -sq / (2 * a_safe)], -1)
    real = (d >= 0.0)[..., None]
    return (jnp.where(real, re_real, re_c),
            jnp.where(real, im_real, im_c),
            jnp.where(d >= 0.0, 2, 0))


def cubic_roots(p, q, r):
    """Roots of x^3 + p x^2 + q x + r = 0 (monic, real coefficients).

    Returns (re, im) of shape (..., 3) and n_real.  (sim5polyroots.c:93-150)
    """
    p, q, r = jnp.broadcast_arrays(*(jnp.asarray(v, jnp.float64) for v in (p, q, r)))
    Q = (p * p - 3.0 * q) / 9.0
    R = (2.0 * p ** 3 - 9.0 * p * q + 27.0 * r) / 54.0
    three_real = R * R < Q ** 3
    # three real roots -- inputs sanitized in the untaken branch so that
    # arccos'(+-1) / sqrt'(0) infinities cannot poison gradients
    Q_safe = jnp.where(Q > 0.0, Q, 1.0)
    arg = jnp.where(three_real, R / jnp.sqrt(Q_safe ** 3), 0.0)
    th = jnp.arccos(jnp.clip(arg, -1.0, 1.0))
    sq = jnp.sqrt(Q_safe)
    x1 = -2.0 * sq * jnp.cos(th / 3.0) - p / 3.0
    x2 = -2.0 * sq * jnp.cos((th + 2.0 * jnp.pi) / 3.0) - p / 3.0
    x3 = -2.0 * sq * jnp.cos((th - 2.0 * jnp.pi) / 3.0) - p / 3.0
    # one real root
    disc = jnp.where(three_real, 1.0, R * R - Q ** 3)
    A = -jnp.sign(R) * jnp.cbrt(jnp.abs(R) + jnp.sqrt(disc))
    A_safe = jnp.where(A == 0.0, 1.0, A)
    B = jnp.where(A == 0.0, 0.0, Q / A_safe)
    y1 = (A + B) - p / 3.0
    yr = -0.5 * (A + B) - p / 3.0
    yi = (jnp.sqrt(3.0) / 2.0) * (A - B)
    re = jnp.where(three_real[..., None],
                   jnp.stack([x1, x2, x3], -1),
                   jnp.stack([y1, yr, yr], -1))
    im = jnp.where(three_real[..., None],
                   jnp.zeros(p.shape + (3,)),
                   jnp.stack([jnp.zeros_like(yi), yi, -yi], -1))
    return re, im, jnp.where(three_real, 3, 1)


def quartic_roots(a3, a2, a1, a0):
    """Roots of z^4 + a3 z^3 + a2 z^2 + a1 z + a0 = 0.

    Returns (re, im) of shape (..., 4) and n_real (...).  Resolvent-cubic
    closed form (sim5polyroots.c:330-447), fully branchless via masks.
    """
    a3, a2, a1, a0 = jnp.broadcast_arrays(
        *(jnp.asarray(v, jnp.float64) for v in (a3, a2, a1, a0)))
    # depressed quartic y^4 + p y^2 + q y + r, z = y - a3/4
    sh = a3 / 4.0
    p = a2 - 3.0 * a3 * a3 / 8.0
    q = a1 - a3 * a2 / 2.0 + a3 ** 3 / 8.0
    r = a0 - a3 * a1 / 4.0 + a3 * a3 * a2 / 16.0 - 3.0 * a3 ** 4 / 256.0
    # resolvent cubic: u^3 - p u^2 - 4 r u + (4 p r - q^2) = 0;
    # take the LARGEST real root so that w^2 = u - p >= 0
    cre, cim, _ = cubic_roots(-p, -4.0 * r, 4.0 * p * r - q * q)
    u = jnp.max(jnp.where(cim == 0.0, cre, -jnp.inf), axis=-1)
    # factor into (y^2 + w y + c1)(y^2 - w y + c2), w = sqrt(u - p),
    # c1 = u/2 - q/(2w), c2 = u/2 + q/(2w)
    w2 = u - p
    w = jnp.sqrt(jnp.maximum(w2, 0.0))
    w_zero = w2 <= 1e-14 * (jnp.abs(u) + jnp.abs(p))
    w_safe = jnp.where(w_zero, 1.0, w)
    c1 = u / 2.0 - jnp.where(w_zero, 0.0, q / (2.0 * w_safe))
    c2 = u / 2.0 + jnp.where(w_zero, 0.0, q / (2.0 * w_safe))
    # w==0 (biquadratic, q~0) case: (y^2 + c1)(y^2 + c2) with
    # c = (p -+ sqrt(p^2-4r))/2
    d_b = p * p - 4.0 * r
    sd_b = jnp.sqrt(jnp.abs(d_b))
    c1 = jnp.where(w_zero, (p - sd_b) / 2.0, c1)
    c2 = jnp.where(w_zero, (p + sd_b) / 2.0, c2)
    w = jnp.where(w_zero, 0.0, w)

    re1, im1, n1 = quadratic_roots(jnp.ones_like(w), w, c1)
    re2, im2, n2 = quadratic_roots(jnp.ones_like(w), -w, c2)
    re = jnp.concatenate([re1, re2], -1) - sh[..., None]
    im = jnp.concatenate([im1, im2], -1)
    return re, im, n1 + n2


def _two_sum(a, b):
    """Knuth error-free transform: a + b = s + err exactly."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _two_prod(a, b):
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


def polish_quartic_real_roots(re, im, c2, c1, c0):
    """One compensated-Newton step on the real roots of
    z^4 + c2 z^2 + c1 z + c0 (the depressed geodesic quartic).

    The closed-form solver leaves roots ~10-40 ulp off in f32, and the
    geodesic engine's elliptic moduli are CROSS-RATIOS of root differences
    that amplify those last ulps (measured: the f32 fast path's dominant
    error, docs/performance.md).  The Newton residual R(z) suffers exactly
    the same cancellation, so it is evaluated with an error-free-transform
    compensated Horner scheme (TwoSum/TwoProd); one step then lands the
    root at ~1 ulp of the working precision for a handful of flops per
    ray -- no emulated f64 anywhere.  Near-double roots (|R'| ~ 0) are
    left untouched; complex roots pass through unchanged.
    """
    z = re
    c2 = c2[..., None]
    c1 = c1[..., None]
    c0 = c0[..., None]
    # compensated Horner for R = ((z^2 + c2) z + c1) z + c0, c3 = 0
    s, e = _two_prod(z, z)                      # z^2
    s, e2 = _two_sum(s, jnp.broadcast_to(c2, s.shape))
    err = e + e2
    p, e = _two_prod(s, z)
    err = err * z + e
    s, e2 = _two_sum(p, jnp.broadcast_to(c1, p.shape))
    err = err + e2
    p, e = _two_prod(s, z)
    err = err * z + e
    s, e2 = _two_sum(p, jnp.broadcast_to(c0, p.shape))
    R = s + (err + e2)
    dR = (4.0 * z * z + 2.0 * c2) * z + c1
    scale = 4.0 * jnp.abs(z) ** 3 + 2.0 * jnp.abs(c2 * z) + jnp.abs(c1)
    ok = (im == 0.0) & (jnp.abs(dR) > 1e-5 * scale) & jnp.isfinite(R)
    return jnp.where(ok, z - R / jnp.where(ok, dR, 1.0), re)


def sort_quartic_roots(re, im):
    """Order roots: real roots first in descending order, complex roots last.

    Returns (re_sorted, im_sorted, n_real).  (reference: sim5polyroots.c:278-325)

    Implemented as a branchless 5-comparator sorting network on the 4 root
    lanes (XLA's generic small-row sort is ~50x slower on TPU).  The network
    swaps only on strictly-greater keys, so equal keys (the complex roots,
    keyed +inf) keep their original order -- conjugate pairs stay adjacent
    with the +imag member first, which the RC/CC geodesic branches rely on.
    """
    is_real = im == 0.0
    n_real = jnp.sum(is_real, axis=-1)
    # key: real roots -re (ascending key => descending re), complex +inf
    lanes = [(jnp.where(is_real[..., j], -re[..., j], jnp.inf),
              re[..., j], im[..., j]) for j in range(4)]

    def ce(a, b):
        ka, ra, ia = a
        kb, rb, ib = b
        swap = ka > kb
        return ((jnp.where(swap, kb, ka), jnp.where(swap, rb, ra),
                 jnp.where(swap, ib, ia)),
                (jnp.where(swap, ka, kb), jnp.where(swap, ra, rb),
                 jnp.where(swap, ia, ib)))

    l0, l1, l2, l3 = lanes
    l0, l1 = ce(l0, l1)
    l2, l3 = ce(l2, l3)
    l0, l2 = ce(l0, l2)
    l1, l3 = ce(l1, l3)
    l1, l2 = ce(l1, l2)
    re_s = jnp.stack([l0[1], l1[1], l2[1], l3[1]], -1)
    im_s = jnp.stack([l0[2], l1[2], l2[2], l3[2]], -1)
    return re_s, im_s, n_real
