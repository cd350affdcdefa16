"""Closed-form polynomial root solvers (quadratic, cubic, quartic).

Vectorized equivalents of sim5polyroots.c.  Roots are returned as separate
(real, imag) arrays -- complex dtypes are avoided so everything maps cleanly
onto TPU vector registers.
"""

import jax
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
    # EXACT power-of-two rescale y = lam*u with p ~ lam^2, q ~ lam^3,
    # r ~ lam^4: the resolvent-cubic discriminant needs ~(root scale)^12
    # of dynamic range, which overflows f32 for root scales beyond ~1e3
    # (the far cells of a spectrum quadrature grid reach 1e6 rg; their
    # f32 classification returned garbage and the whole outer disk was
    # masked out).  A power-of-two lam makes every division below exact,
    # so well-scaled inputs are bit-identical to the unscaled path.
    # Gated on EFFECTIVE EXPONENT RANGE, not dtype: IEEE f64 (CPU) has
    # range to root scales ~1e75 and skips the rescale, but TPU "f64" is
    # an emulated float-float with f32 EXPONENT range (overflow ~3.4e38),
    # so the default f64 mode on TPU needs it too (far spectrum cells at
    # 1e6 rg have discriminants ~1e72).  frexp's 64-bit bitcast cannot
    # lower on emulated f64, so the TPU-f64 path extracts the exponent via
    # log2 instead; lam is then within 1 ulp of a power of two rather than
    # exact, costing one ordinary rounding per coefficient (recovered by
    # the compensated-Newton polish downstream) instead of overflow.
    if p.dtype == jnp.float32:
        def _ex(v):
            return jnp.frexp(jnp.where(v != 0.0, v, 1.0))[1]
    elif jax.default_backend() == "tpu":
        def _ex(v):
            av = jnp.abs(jnp.where(v != 0.0, v, 1.0))
            return (jnp.ceil(jnp.log2(av)) + 1.0).astype(jnp.int32)
    else:
        _ex = None
    if _ex is not None:
        e = jnp.maximum(jnp.maximum((_ex(p) + 1) // 2, (_ex(q) + 2) // 3),
                        jnp.maximum((_ex(r) + 3) // 4, 0))
        lam = jnp.exp2(e.astype(p.dtype))
        il = 1.0 / lam
        p = p * il * il
        q = q * il * il * il
        r = r * (il * il) * (il * il)
    else:
        lam = jnp.ones_like(p)
    # resolvent cubic: u^3 - p u^2 - 4 r u + (4 p r - q^2) = 0;
    # take the LARGEST real root so that w^2 = u - p >= 0
    cre, cim, _ = cubic_roots(-p, -4.0 * r, 4.0 * p * r - q * q)
    u = jnp.max(jnp.where(cim == 0.0, cre, -jnp.inf), axis=-1)
    # Discriminant-boundary rescue: when the cubic's marginal three-real
    # decision lands on the one-real branch, its single real root can be
    # the WRONG pairing (w^2 = u - p ~ 0 while |q| is not negligible --
    # far near-biquadratic rays in f32 hit this and produced garbage
    # factorizations).  The complex pair's real part is the midpoint of
    # the true near-double root pair; use it, but ONLY when the legit
    # real root is degenerate (below rounding noise of u - p), so valid
    # one-real configurations are untouched.
    one_real = cim[..., 1] != 0.0
    utol = 100.0 * jnp.finfo(u.dtype).eps * (jnp.abs(u) + jnp.abs(p))
    yr = cre[..., 1]
    u = jnp.where(one_real & (u - p < utol) & (yr - p > utol), yr, u)
    # factor into (y^2 + w y + c1)(y^2 - w y + c2), w = sqrt(u - p),
    # c1 = u/2 - q/(2w), c2 = u/2 + q/(2w)
    w2 = u - p
    w = jnp.sqrt(jnp.maximum(w2, 0.0))
    # near-biquadratic detection must scale with the working precision:
    # w2 = u - p is a subtraction of separately-rounded values, so below
    # ~100 eps relative it is pure noise and sqrt(noise) would poison the
    # factor pair (far spectrum-grid rays, whose odd term is ~1e-5 of the
    # even ones, hit exactly this in f32: garbage w -> near-equal fake
    # roots -> misclassified GEOD_TYPE_RR_DBL).  The dropped odd term is
    # recovered by the compensated-Newton polish downstream.
    w_zero = w2 <= 100.0 * jnp.finfo(w2.dtype).eps * (jnp.abs(u) + jnp.abs(p))
    w_safe = jnp.where(w_zero, 1.0, w)
    c1 = u / 2.0 - jnp.where(w_zero, 0.0, q / (2.0 * w_safe))
    c2 = u / 2.0 + jnp.where(w_zero, 0.0, q / (2.0 * w_safe))
    # w==0 (biquadratic, q~0) case: (y^2 + c1)(y^2 + c2) with
    # c = (p -+ sqrt(p^2-4r))/2, the cancelling partner recovered by
    # Vieta (c1 c2 = r): the naive (p + sign(p) sd)/2 loses ALL digits
    # for |r| << p^2 (far spectrum-grid rays are near-biquadratic with
    # tiny constant term)
    d_b = p * p - 4.0 * r
    sd_b = jnp.sqrt(jnp.abs(d_b))
    c_big = 0.5 * (p + jnp.sign(p) * sd_b)    # no cancellation side
    c_big = jnp.where(jnp.sign(p) == 0.0, 0.5 * sd_b, c_big)
    c_big_safe = jnp.where(c_big == 0.0, 1.0, c_big)
    c_small = jnp.where(c_big == 0.0, 0.0, r / c_big_safe)
    # keep the original ordering c1 = (p-sd)/2 <= c2 = (p+sd)/2
    c1b = jnp.where(p >= 0.0, c_small, c_big)
    c2b = jnp.where(p >= 0.0, c_big, c_small)
    usable = d_b >= 0.0
    c1 = jnp.where(w_zero & usable, c1b,
                   jnp.where(w_zero, (p - sd_b) / 2.0, c1))
    c2 = jnp.where(w_zero & usable, c2b,
                   jnp.where(w_zero, (p + sd_b) / 2.0, c2))
    w = jnp.where(w_zero, 0.0, w)

    re1, im1, n1 = quadratic_roots(jnp.ones_like(w), w, c1)
    re2, im2, n2 = quadratic_roots(jnp.ones_like(w), -w, c2)
    # undo the exact rescale (y = lam*u), then the depression shift
    re = jnp.concatenate([re1, re2], -1) * lam[..., None] - sh[..., None]
    im = jnp.concatenate([im1, im2], -1) * lam[..., None]
    return re, im, n1 + n2


def quartic_roots_c(a3, a2, a1, a0):
    """Roots of z^4 + a3 z^3 + a2 z^2 + a1 z + a0 = 0 (real coefficients)
    handed back as four separate complex roots (re, im) plus n_real.

    Convenience variant of `quartic_roots`: the roots are sorted (real
    first, descending; conjugate pairs adjacent) and unpacked one per
    return slot.  (reference: quartic_eq_c, sim5polyroots.c:450-479 --
    there too a repackaging of quartic_eq's output into individual
    complex values, not a complex-coefficient solver.)

    Returns (n_real, (re1, im1), (re2, im2), (re3, im3), (re4, im4)).
    """
    re, im, _n = quartic_roots(a3, a2, a1, a0)
    re, im, n_real = sort_quartic_roots(re, im)
    return n_real, (re[..., 0], im[..., 0]), (re[..., 1], im[..., 1]), \
        (re[..., 2], im[..., 2]), (re[..., 3], im[..., 3])


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


def _split(a):
    """Veltkamp split a = hi + lo with hi carrying the upper half of the
    mantissa (both halves exact)."""
    splitter = 134217729.0 if a.dtype == jnp.float64 else 4097.0
    c = a * splitter
    hi = c - (c - a)
    return hi, a - hi


def _newton_step_compensated(z, im, c2, c1, c0):
    """One Newton step z -> z - R(z)/R'(z) for R = z^4 + c2 z^2 + c1 z + c0,
    with R evaluated by an error-free-transform compensated Horner scheme
    (accurate as if in twice the working precision).  Returns (z_new,
    delta, ok): z_new = fl(z + delta); `ok` marks lanes that moved (real
    roots away from the |R'| ~ 0 double-root degeneracy).

    The split of z is computed once and reused by every product EFT, and
    the z^2 term uses the cheaper square form (the polish sits on the
    per-pixel hot path of the f32 image sweep: ~10% of frame time per
    pass at the naive 2-split-per-product cost, measured on-chip).
    """
    zh, zl = _split(z)
    # z^2 (square EFT: one split, symmetric cross term)
    s = z * z
    e = (zh * zh - s + 2.0 * zh * zl) + zl * zl
    s, e2 = _two_sum(s, jnp.broadcast_to(c2, s.shape))
    err = e + e2
    sh, sl = _split(s)
    p = s * z
    e = (sh * zh - p + sh * zl + sl * zh) + sl * zl
    err = err * z + e
    s, e2 = _two_sum(p, jnp.broadcast_to(c1, p.shape))
    err = err + e2
    sh, sl = _split(s)
    p = s * z
    e = (sh * zh - p + sh * zl + sl * zh) + sl * zl
    err = err * z + e
    s, e2 = _two_sum(p, jnp.broadcast_to(c0, p.shape))
    R = s + (err + e2)
    dR = (4.0 * z * z + 2.0 * c2) * z + c1
    scale = 4.0 * jnp.abs(z) ** 3 + 2.0 * jnp.abs(c2 * z) + jnp.abs(c1)
    ok = (im == 0.0) & (jnp.abs(dR) > 1e-5 * scale) & jnp.isfinite(R)
    delta = jnp.where(ok, -R / jnp.where(ok, dR, 1.0), 0.0)
    return z + delta, delta, ok


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
    z, _, _ = _newton_step_compensated(
        re, im, c2[..., None], c1[..., None], c0[..., None])
    return z


def polish_quartic_real_roots_df(re, im, c2, c1, c0):
    """Two compensated-Newton steps on the real quartic roots, returning
    each root as an unevaluated two-float pair (hi, lo), root = hi + lo
    with |lo| <= ulp(hi).

    Why two steps and a low part: for NEAR-CRITICAL rays (periastron at
    the photon ring, r1 -> r2) the elliptic moduli and the radius
    inversion depend on the root GAP r1 - r2, whose absolute accuracy
    must be far below ulp(r1).  One Newton step from the closed-form
    seeds (error e0 ~ 40 ulp) leaves e1 ~ e0^2/gap -- measured 1e-4
    RELATIVE TO THE GAP in f32 at gap ~ 1e-3, the fast path's dominant
    image error.  The second step squares that away (e2 ~ ulp^2/gap),
    and the TwoSum low part preserves it past the final rounding, so
    gap = (hi_i - hi_j) + (lo_i - lo_j) is accurate to ~1 ulp OF THE GAP
    (the hi difference is exact by Sterbenz for close roots).  Complex
    and double-root lanes pass through with lo = 0.
    """
    c2 = c2[..., None]
    c1 = c1[..., None]
    c0 = c0[..., None]
    z0 = re
    zh, zl = _split(z0)
    # pass 1: compensated Horner for R(z0) (as in twice the precision)
    s = z0 * z0
    e = (zh * zh - s + 2.0 * zh * zl) + zl * zl
    s, e2 = _two_sum(s, jnp.broadcast_to(c2, s.shape))
    err = e + e2
    sh, sl = _split(s)
    p = s * z0
    e = (sh * zh - p + sh * zl + sl * zh) + sl * zl
    err = err * z0 + e
    s, e2 = _two_sum(p, jnp.broadcast_to(c1, p.shape))
    err = err + e2
    sh, sl = _split(s)
    p = s * z0
    e = (sh * zh - p + sh * zl + sl * zh) + sl * zl
    err = err * z0 + e
    s, e2 = _two_sum(p, jnp.broadcast_to(c0, p.shape))
    R0 = s + (err + e2)
    dR0 = (4.0 * z0 * z0 + 2.0 * c2) * z0 + c1
    scale = 4.0 * jnp.abs(z0) ** 3 + 2.0 * jnp.abs(c2 * z0) + jnp.abs(c1)
    ok = (im == 0.0) & (jnp.abs(dR0) > 1e-5 * scale) & jnp.isfinite(R0)
    da = jnp.where(ok, -R0 / jnp.where(ok, dR0, 1.0), 0.0)
    # pass 2 via the EXACT quartic Taylor expansion about z0 (no second
    # compensated Horner needed): with z1 = fl(z0 + da) = z0 + dp exactly
    # (dp = da - rho from TwoSum), the five Taylor terms ARE the quartic:
    #   R(z1) = R0 + R'(z0) dp + (6 z0^2 + c2) dp^2 + 4 z0 dp^3 + dp^4
    # and the dominant cancellation R0 + R'0 dp is exact by Sterbenz
    # (both ~R'0 e0, difference ~R'0 e0^2/gap).  ~2.5x cheaper than
    # repeating the compensated evaluation, same ~1-ulp-of-gap result.
    z1f, rho = _two_sum(z0, da)
    dp = da - rho
    dp2 = dp * dp
    R1 = R0 + dR0 * dp + (6.0 * z0 * z0 + c2) * dp2 \
        + 4.0 * z0 * dp * dp2 + dp2 * dp2
    dR1 = (4.0 * z1f * z1f + 2.0 * c2) * z1f + c1
    d2 = jnp.where(ok, -R1 / jnp.where(ok, dR1, 1.0), 0.0)
    hi, lo = _two_sum(z1f, d2)
    return jnp.where(ok, hi, re), jnp.where(ok, lo, 0.0)


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
