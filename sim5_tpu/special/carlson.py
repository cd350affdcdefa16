"""Carlson symmetric elliptic integrals RF, RD, RC, RJ.

TPU-native design: the reference (sim5elliptic.c:19-206) runs a data-dependent
duplication loop per evaluation.  Here the duplication is unrolled to a fixed
depth that converges for the full double range, so whole ray batches evaluate
in lockstep on the VPU with no divergence; the 5th-order Taylor tail of the
Numerical-Recipes scheme supplies the remaining accuracy (rel. err ~1e-16).

Fixed-depth argument: one duplication step shrinks the relative spread of the
arguments by 4x once they are comparable, and by ~sqrt of the ratio while they
are wildly different; 16 levels bring any f64-representable argument triple to
spread < 3e-4, where the series tail is exact to below f64 epsilon.

All functions broadcast over arbitrary batch shapes and are differentiable
(the unrolled iteration is a smooth composition; its autodiff derivative is
the derivative of the converged value).
"""

import jax
import jax.numpy as jnp

_NDUP = 16   # duplication depth (see module docstring)
_TINY = 1e-300

# Duplication-chain lowering strategy.  "auto" picks by the process's
# default backend; set_duplication_mode("unroll"/"loop") pins it -- the
# escape hatch for mixed CPU+TPU processes, where a CPU-traced graph under
# "auto" would otherwise inherit the TPU choice (trace-time dispatch cannot
# see the operands' eventual device).
_DUP_MODE = "auto"


def set_duplication_mode(mode):
    """Pin how the Carlson duplication chain lowers: "unroll" (fused VPU
    chain, the TPU-optimal form), "loop" (lax.fori_loop, the CPU-optimal
    form -- unrolling only multiplies XLA:CPU compile time), or "auto"
    (default: by jax.default_backend() at trace time).  Returns the
    previous mode so callers can restore it."""
    global _DUP_MODE
    if mode not in ("auto", "unroll", "loop"):
        raise ValueError(f"duplication mode {mode!r}")
    prev, _DUP_MODE = _DUP_MODE, mode
    return prev


def _ndup():
    """Duplication depth for the active precision.

    In f32 fast mode 7 levels reach the f32 noise floor: measured <=1.5e-7
    relative across the framework's argument surface including extreme
    homogeneity-transformed triples like (1e-10, 0.3, 1e-10) (depth sweep
    6/7/8 vs f64); the 512^2 image gate measures 4.25e-6 of peak at depth
    7, equal to depth 8 within noise, at ~4% less VPU work.
    """
    return _NDUP if jnp.zeros((), jnp.float64).dtype == jnp.float64 else 7


def _iterate(n, body, state):
    """Run `state = body(state)` n times.

    On TPU the iterations are UNROLLED: an unrolled chain of elementwise ops
    fuses into one VPU kernel with intermediates in registers/VMEM, whereas a
    lax loop forces the carry through HBM every iteration (measured 1.25x
    end-to-end on the disk-image pipeline).  On CPU the lax.fori_loop wins:
    unrolling (especially rj's nested rc) multiplies XLA:CPU compile time
    for no runtime benefit.  `set_duplication_mode` overrides the
    backend-based default per process.
    """
    unroll = (jax.default_backend() == "tpu" if _DUP_MODE == "auto"
              else _DUP_MODE == "unroll")
    if unroll:
        for _ in range(n):
            state = body(state)
        return state
    return jax.lax.fori_loop(0, n, lambda _, s: body(s), state)


def rf(x, y, z):
    """Carlson RF(x,y,z) = 1/2 int_0^inf dt/sqrt((t+x)(t+y)(t+z)).

    x,y,z >= 0, at most one zero.  (reference: sim5elliptic.c:19-52)
    """
    xt, yt, zt = (jnp.asarray(v, jnp.float64) for v in (x, y, z))
    xt, yt, zt = jnp.broadcast_arrays(xt, yt, zt)
    # floor exactly-zero arguments at the smallest normal: sqrt(0) in the
    # first duplication has an infinite-slope jvp that turns even a ZERO
    # tangent into NaN (inf * 0) under forward-mode autodiff -- e.g.
    # jax.jvp through every complete integral RF(0, y, 1).  maximum()
    # selects the constant there, so value (shift ~1e-300) and tangent
    # (0) are both correct.
    tiny = jnp.asarray(_TINY, xt.dtype) if xt.dtype == jnp.float64 \
        else jnp.asarray(1e-37, xt.dtype)
    xt = jnp.maximum(xt, tiny)
    yt = jnp.maximum(yt, tiny)

    def dup(s):
        xt, yt, zt = s
        sx, sy, sz = jnp.sqrt(xt), jnp.sqrt(yt), jnp.sqrt(zt)
        lam = sx * (sy + sz) + sy * sz
        return 0.25 * (xt + lam), 0.25 * (yt + lam), 0.25 * (zt + lam)

    xt, yt, zt = _iterate(_ndup(), dup, (xt, yt, zt))
    ave = (xt + yt + zt) / 3.0
    dx = (ave - xt) / ave
    dy = (ave - yt) / ave
    dz = (ave - zt) / ave
    e2 = dx * dy - dz * dz
    e3 = dx * dy * dz
    C1, C2, C3, C4 = 1.0 / 24.0, 0.1, 3.0 / 44.0, 1.0 / 14.0
    return (1.0 + (C1 * e2 - C2 - C3 * e3) * e2 + C4 * e3) / jnp.sqrt(ave)


def rd(x, y, z):
    """Carlson RD(x,y,z) = 3/2 int_0^inf dt/[(t+z)sqrt((t+x)(t+y)(t+z))].

    x,y >= 0 (at most one zero), z > 0.  (reference: sim5elliptic.c:58-98)
    """
    xt, yt, zt = (jnp.asarray(v, jnp.float64) for v in (x, y, z))
    xt, yt, zt = jnp.broadcast_arrays(xt, yt, zt)
    tiny = jnp.asarray(_TINY, xt.dtype) if xt.dtype == jnp.float64 \
        else jnp.asarray(1e-37, xt.dtype)
    xt = jnp.maximum(xt, tiny)   # see rf: forward-mode sqrt(0) guard
    yt = jnp.maximum(yt, tiny)
    def dup(st):
        xt, yt, zt, s, fac = st
        sx, sy, sz = jnp.sqrt(xt), jnp.sqrt(yt), jnp.sqrt(zt)
        lam = sx * (sy + sz) + sy * sz
        s = s + fac / (sz * (zt + lam))
        return (0.25 * (xt + lam), 0.25 * (yt + lam), 0.25 * (zt + lam),
                s, 0.25 * fac)

    xt, yt, zt, s, fac = _iterate(
        _ndup(), dup, (xt, yt, zt, jnp.zeros_like(xt), jnp.ones_like(xt)))
    ave = 0.2 * (xt + yt + 3.0 * zt)
    dx = (ave - xt) / ave
    dy = (ave - yt) / ave
    dz = (ave - zt) / ave
    C1, C2, C3, C4 = 3.0 / 14.0, 1.0 / 6.0, 9.0 / 22.0, 3.0 / 26.0
    C5, C6 = 0.25 * C3, 1.5 * C4
    ea = dx * dy
    eb = dz * dz
    ec = ea - eb
    ed = ea - 6.0 * eb
    ee = ed + ec + ec
    tail = (1.0 + ed * (-C1 + C5 * ed - C6 * dz * ee)
            + dz * (C2 * ee + dz * (-C3 * ec + dz * C4 * ea)))
    return 3.0 * s + fac * tail / (ave * jnp.sqrt(ave))


def rc(x, y, _unroll=True):
    """Carlson degenerate RC(x,y) = RF(x,y,y).

    x >= 0, y != 0; for y < 0 the Cauchy principal value is returned.
    (reference: sim5elliptic.c:104-137)

    `_unroll=False` forces the loop form regardless of backend -- used by
    rj, whose own duplication would otherwise nest-unroll 16 rc bodies
    inside each of its 16 levels (256 blocks per rj call site; with ~10
    sites in the azimuth/time-delay graphs under emulated f64 this blew
    past the remote TPU compiler's memory).
    """
    x, y = (jnp.asarray(v, jnp.float64) for v in (x, y))
    x, y = jnp.broadcast_arrays(x, y)
    neg = y < 0.0
    # principal-value transform for y<0: RC(x,y) = sqrt(x/(x-y)) RC(x-y,-y)
    tiny = jnp.asarray(_TINY, x.dtype) if x.dtype == jnp.float64 \
        else jnp.asarray(1e-37, x.dtype)
    xt0 = jnp.maximum(jnp.where(neg, x - y, x), tiny)  # see rf: jvp guard
    yt0 = jnp.where(neg, -y, jnp.where(y == 0.0, _TINY, y))
    w = jnp.where(neg, jnp.sqrt(x) / jnp.sqrt(xt0), 1.0)
    def dup(s):
        xt, yt = s
        lam = 2.0 * jnp.sqrt(xt) * jnp.sqrt(yt) + yt
        return 0.25 * (xt + lam), 0.25 * (yt + lam)

    if _unroll:
        xt, yt = _iterate(_ndup(), dup, (xt0, yt0))
    else:
        xt, yt = jax.lax.fori_loop(0, _ndup(), lambda _, s: dup(s),
                                   (xt0, yt0))
    ave = (xt + yt + yt) / 3.0
    sv = (yt - ave) / ave
    C1, C2, C3, C4 = 0.3, 1.0 / 7.0, 0.375, 9.0 / 22.0
    return w * (1.0 + sv * sv * (C1 + sv * (C2 + sv * (C3 + sv * C4)))) / jnp.sqrt(ave)


def rj(x, y, z, p):
    """Carlson RJ(x,y,z,p).

    x,y,z >= 0 (at most one zero), p != 0; for p < 0 the Cauchy principal
    value is returned.  (reference: sim5elliptic.c:144-206)
    """
    x, y, z, p = (jnp.asarray(v, jnp.float64) for v in (x, y, z, p))
    x, y, z, p = jnp.broadcast_arrays(x, y, z, p)
    neg = p < 0.0
    # principal-value transform (Carlson 1977, NR 6.11): shift p to
    # pt = y' + b with y' the median of (x,y,z).
    # p_neg is a guarded copy so the untaken branch stays NaN-free under grad.
    p_neg = jnp.where(neg, p, -1.0)
    xs = jnp.minimum(jnp.minimum(x, y), z)
    zs = jnp.maximum(jnp.maximum(x, y), z)
    ys = x + y + z - xs - zs
    ys_safe = jnp.where(ys > 0.0, ys, 1.0)
    a_ = 1.0 / (ys - p_neg)
    b_ = a_ * (zs - ys) * (ys - xs)
    pt_neg = ys + b_
    rho = xs * zs / ys_safe
    tau = p_neg * pt_neg / ys_safe
    rcx = jnp.where(neg, rc(rho, tau, _unroll=False), 0.0)

    tiny = jnp.asarray(_TINY, x.dtype) if x.dtype == jnp.float64 \
        else jnp.asarray(1e-37, x.dtype)
    xt = jnp.maximum(jnp.where(neg, xs, x), tiny)  # see rf: jvp guard
    yt = jnp.maximum(jnp.where(neg, ys, y), tiny)
    zt = jnp.maximum(jnp.where(neg, zs, z), tiny)
    pt = jnp.where(neg, pt_neg, jnp.where(p == 0.0, _TINY, p))

    def dup(st):
        xt, yt, zt, pt, s, fac = st
        sx, sy, sz = jnp.sqrt(xt), jnp.sqrt(yt), jnp.sqrt(zt)
        lam = sx * (sy + sz) + sy * sz
        alpha = (pt * (sx + sy + sz) + sx * sy * sz) ** 2
        beta = pt * (pt + lam) ** 2
        s = s + fac * rc(alpha, beta, _unroll=False)
        return (0.25 * (xt + lam), 0.25 * (yt + lam), 0.25 * (zt + lam),
                0.25 * (pt + lam), s, 0.25 * fac)

    # rj's duplication is NEVER unrolled: each level contains an rc whose
    # own 16 levels would multiply the graph 256x per call site (rj is not
    # on the image fast path -- it appears only in the Pi-based azimuth /
    # time-delay integrals -- so the HBM round-trips of the loop form cost
    # nothing that matters, while the unrolled form OOMed the remote TPU
    # compiler once those graphs grew in round 3)
    xt, yt, zt, pt, s, fac = jax.lax.fori_loop(
        0, _ndup(), lambda _, st: dup(st),
        (xt, yt, zt, pt, jnp.zeros_like(xt), jnp.ones_like(xt)))
    ave = 0.2 * (xt + yt + zt + pt + pt)
    dx = (ave - xt) / ave
    dy = (ave - yt) / ave
    dz = (ave - zt) / ave
    dp = (ave - pt) / ave
    C1, C2, C3, C4 = 3.0 / 14.0, 1.0 / 3.0, 3.0 / 22.0, 3.0 / 26.0
    C5, C6, C7, C8 = 0.75 * C3, 1.5 * C4, 0.5 * C2, C3 + C3
    ea = dx * (dy + dz) + dy * dz
    eb = dx * dy * dz
    ec = dp * dp
    ed = ea - 3.0 * ec
    ee = eb + 2.0 * dp * (ea - ec)
    ans = 3.0 * s + fac * (1.0 + ed * (-C1 + C5 * ed - C6 * ee)
                           + eb * (C7 + dp * (-C8 + dp * C4))
                           + dp * ea * (C2 - dp * C3)
                           - C2 * dp * ec) / (ave * jnp.sqrt(ave))
    ans_neg = a_ * (b_ * ans + 3.0 * (rcx - rf(xt, yt, zt)))
    return jnp.where(neg, ans_neg, ans)
