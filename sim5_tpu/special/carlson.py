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

Analytic derivatives (SURVEY build item 3): every public function carries a
`jax.custom_jvp` rule built on the closed forms

    dRF/dx = -RD(y,z,x)/6              (DLMF 19.18.1)
    dRC/dx = -RD(y,y,x)/6,  dRC/dy = -RD(x,y,y)/3
    dRD/dx = -(RD(y,z,x) - RD(x,y,z)) / (2(z-x))   (partial fractions)
    dRJ/dx = -(RD(y,z,x) - RJ) / (2(p-x)),  dRJ/dp by Euler homogeneity

so reverse-mode AD evaluates O(1) extra special functions instead of
re-materializing the 16-level duplication chains (measured 6.7x
backward/forward on the image pipeline before this layer).  All the RD
coefficients of one rule come from ONE shared duplication chain: the
lambda sequence is symmetric in (x,y,z), so RD(y,z,x), RD(z,x,y) and
RD(x,y,z) differ only in their series accumulator and tail -- three extra
divisions per level, not three extra chains.  The RD divided differences
are evaluated CANCELLATION-FREE through the chain: the level-n argument
gap is exactly (z-x)/4^n, so

    (RD(y,z,x) - RD(x,y,z))/(z-x) = 3*G + fac*(T_x - T_z)/(z-x),
    G = sum_n fac_n 4^{-n} (lam+xt+zt+sx*sz)
              / ((sx+sz) sx sz (xt+lam)(zt+lam))

with every G term positive (no subtraction); the naive tail-difference
quotient is suppressed by fac = 4^{-depth}, so the form stays accurate
through argument coincidence z == x (where the quotient is the smooth
derivative limit).  The tangent maps are linear in the tangents, so JAX
transposes them automatically and one rule serves both jvp and vjp.

All functions broadcast over arbitrary batch shapes.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.custom_derivatives import SymbolicZero

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


def _tiny_for(dtype):
    return jnp.asarray(_TINY if dtype == jnp.float64 else 1e-37, dtype)


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


# ---------------------------------------------------------------------------
# shared duplication chain + tails (the derivative-layer workhorse)
# ---------------------------------------------------------------------------

def _rf_tail(xt, yt, zt):
    """5th-order RF series tail at the converged triple."""
    ave = (xt + yt + zt) / 3.0
    dx = (ave - xt) / ave
    dy = (ave - yt) / ave
    dz = (ave - zt) / ave
    e2 = dx * dy - dz * dz
    e3 = dx * dy * dz
    C1, C2, C3, C4 = 1.0 / 24.0, 0.1, 3.0 / 44.0, 1.0 / 14.0
    return (1.0 + (C1 * e2 - C2 - C3 * e3) * e2 + C4 * e3) / jnp.sqrt(ave)


def _rd_tail(xa, xb, xc):
    """RD series tail T at the converged triple, with xc the -3/2 slot:
    RD(a,b,c) = 3*s + fac * T(a_final, b_final, c_final)."""
    ave = 0.2 * (xa + xb + 3.0 * xc)
    dx = (ave - xa) / ave
    dy = (ave - xb) / ave
    dz = (ave - xc) / ave
    C1, C2, C3, C4 = 3.0 / 14.0, 1.0 / 6.0, 9.0 / 22.0, 3.0 / 26.0
    C5, C6 = 0.25 * C3, 1.5 * C4
    ea = dx * dy
    eb = dz * dz
    ec = ea - eb
    ed = ea - 6.0 * eb
    ee = ed + ec + ec
    tail = (1.0 + ed * (-C1 + C5 * ed - C6 * dz * ee)
            + dz * (C2 * ee + dz * (-C3 * ec + dz * C4 * ea)))
    return tail / (ave * jnp.sqrt(ave))


def _rd_chain(x, y, z, slots=(), diffs=()):
    """Shared duplication chain on the triple (x, y, z).

    slots: indices i in (0,1,2) whose RD series accumulator
        s_i = sum_n fac_n / (sqrt(v_i) (v_i + lam))
    is carried (RD with v_i in the -3/2 slot is 3 s_i + fac * tail_i).

    diffs: pairs (i, j) for which the cancellation-free divided-difference
    accumulator G_ij is carried, with
        s_i - s_j = (v_j0 - v_i0) * G_ij
    exactly in real arithmetic (module docstring).

    Returns (xt, yt, zt, fac, {i: s_i}, {(i,j): G_ij}).
    """
    v = [x, y, z]
    s0 = {i: jnp.zeros_like(x) for i in slots}
    g0 = {ij: jnp.zeros_like(x) for ij in diffs}
    fac0 = jnp.ones_like(x)
    gfac0 = jnp.ones_like(x)

    def body(state):
        xt, yt, zt, fac, gfac, s, g = state
        vt = (xt, yt, zt)
        sq = tuple(jnp.sqrt(t) for t in vt)
        lam = sq[0] * (sq[1] + sq[2]) + sq[1] * sq[2]
        s = {i: s[i] + fac / (sq[i] * (vt[i] + lam)) for i in s}
        gn = {}
        for (i, j) in g:
            num = lam + vt[i] + vt[j] + sq[i] * sq[j]
            den = ((sq[i] + sq[j]) * sq[i] * sq[j]
                   * (vt[i] + lam) * (vt[j] + lam))
            gn[(i, j)] = g[(i, j)] + gfac * num / den
        return (0.25 * (xt + lam), 0.25 * (yt + lam), 0.25 * (zt + lam),
                0.25 * fac, gfac / 16.0, s, gn)

    xt, yt, zt, fac, _gfac, s, g = _iterate(
        _ndup(), body, (x, y, z, fac0, gfac0, s0, g0))
    return xt, yt, zt, fac, s, g


def _perm_tail(xt, yt, zt, i):
    """RD tail with slot i of the (original-order) triple in the -3/2 slot."""
    vt = (xt, yt, zt)
    j, k = [a for a in (0, 1, 2) if a != i]
    return _rd_tail(vt[j], vt[k], vt[i])


# ---------------------------------------------------------------------------
# RF
# ---------------------------------------------------------------------------

@jax.custom_jvp
def rf(x, y, z):
    """Carlson RF(x,y,z) = 1/2 int_0^inf dt/sqrt((t+x)(t+y)(t+z)).

    x,y,z >= 0, at most one zero.  (reference: sim5elliptic.c:19-52)
    Derivatives: analytic custom-jvp rule (module docstring), dRF/dx_i =
    -RD(.,.,x_i)/6 with all coefficients from one shared chain.
    """
    xt, yt, zt = (jnp.asarray(v, jnp.float64) for v in (x, y, z))
    xt, yt, zt = jnp.broadcast_arrays(xt, yt, zt)
    # floor exactly-zero arguments at the smallest normal: sqrt(0) in the
    # first duplication has an infinite-slope jvp; the custom rule zeroes
    # the coefficient on floored lanes (matching maximum()'s subgradient),
    # so value (shift ~1e-300) and tangent (0) are both correct there --
    # e.g. every complete integral RF(0, y, 1).
    tiny = _tiny_for(xt.dtype)
    xt = jnp.maximum(xt, tiny)
    yt = jnp.maximum(yt, tiny)

    def dup(s):
        xt, yt, zt = s
        sx, sy, sz = jnp.sqrt(xt), jnp.sqrt(yt), jnp.sqrt(zt)
        lam = sx * (sy + sz) + sy * sz
        return 0.25 * (xt + lam), 0.25 * (yt + lam), 0.25 * (zt + lam)

    xt, yt, zt = _iterate(_ndup(), dup, (xt, yt, zt))
    return _rf_tail(xt, yt, zt)


def _rf_jvp(primals, tangents):
    x, y, z = (jnp.asarray(v, jnp.float64) for v in primals)
    x, y, z = jnp.broadcast_arrays(x, y, z)
    tiny = _tiny_for(x.dtype)
    x0 = jnp.maximum(x, tiny)
    y0 = jnp.maximum(y, tiny)
    z0 = z
    live = [i for i, t in enumerate(tangents)
            if not isinstance(t, SymbolicZero)]
    xt, yt, zt, fac, s, _ = _rd_chain(x0, y0, z0, slots=tuple(live))
    val = _rf_tail(xt, yt, zt)
    dot = jnp.zeros_like(val)
    floors = (x < tiny, y < tiny, None)
    for i in live:
        coef = -(3.0 * s[i] + fac * _perm_tail(xt, yt, zt, i)) / 6.0
        if floors[i] is not None:
            coef = jnp.where(floors[i], 0.0, coef)
        dot = dot + coef * jnp.asarray(tangents[i], val.dtype)
    return val, dot


rf.defjvp(_rf_jvp, symbolic_zeros=True)


# ---------------------------------------------------------------------------
# RD
# ---------------------------------------------------------------------------

@jax.custom_jvp
def rd(x, y, z):
    """Carlson RD(x,y,z) = 3/2 int_0^inf dt/[(t+z)sqrt((t+x)(t+y)(t+z))].

    x,y >= 0 (at most one zero), z > 0.  (reference: sim5elliptic.c:58-98)
    Derivatives: analytic custom-jvp rule via cancellation-free divided
    differences through the shared chain (module docstring) plus Euler
    homogeneity for the z slot.
    """
    xt, yt, zt = (jnp.asarray(v, jnp.float64) for v in (x, y, z))
    xt, yt, zt = jnp.broadcast_arrays(xt, yt, zt)
    tiny = _tiny_for(xt.dtype)
    xt = jnp.maximum(xt, tiny)   # see rf: derivative floor handled in jvp
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
    return 3.0 * s + fac * _rd_tail(xt, yt, zt)


def _rd_jvp(primals, tangents):
    x, y, z = (jnp.asarray(v, jnp.float64) for v in primals)
    x, y, z = jnp.broadcast_arrays(x, y, z)
    tiny = _tiny_for(x.dtype)
    x0 = jnp.maximum(x, tiny)
    y0 = jnp.maximum(y, tiny)
    z0 = z
    xt, yt, zt, fac, s, g = _rd_chain(
        x0, y0, z0, slots=(0, 1, 2), diffs=((0, 2), (1, 2)))
    T = [_perm_tail(xt, yt, zt, i) for i in range(3)]
    val = 3.0 * s[2] + fac * T[2]

    def ddiff(i):
        # (RD(..,x_i..3/2-slot) - val)/(z - x_i), cancellation-free:
        # s_i - s_2 = (z0 - v_i0) * G_i2 exactly; the tail-difference
        # quotient is fac-suppressed (module docstring)
        d = z0 - (x0 if i == 0 else y0)
        tq = jnp.where(d != 0.0, (T[i] - T[2]) / jnp.where(d != 0.0, d, 1.0),
                       0.0)
        return 3.0 * g[(i, 2)] + fac * tq

    cx = -0.5 * ddiff(0)
    cy = -0.5 * ddiff(1)
    cx = jnp.where(x < tiny, 0.0, cx)
    cy = jnp.where(y < tiny, 0.0, cy)
    cz = (-1.5 * val - x0 * cx - y0 * cy) / z0
    dot = jnp.zeros_like(val)
    for coef, t in zip((cx, cy, cz), tangents):
        if not isinstance(t, SymbolicZero):
            dot = dot + coef * jnp.asarray(t, val.dtype)
    return val, dot


rd.defjvp(_rd_jvp, symbolic_zeros=True)


# ---------------------------------------------------------------------------
# RC
# ---------------------------------------------------------------------------

@partial(jax.custom_jvp, nondiff_argnums=(2,))
def _rc_pos(x, y, unroll):
    """RC core for x >= tiny, y > 0 (pre-floored by the callers).

    Derivatives: dRC/dx = -RD(y,y,x)/6, dRC/dy = -RD(x,y,y)/3 -- both from
    one shared chain on (x, y, y); no divided differences needed.
    """
    def dup(s):
        xt, yt = s
        lam = 2.0 * jnp.sqrt(xt) * jnp.sqrt(yt) + yt
        return 0.25 * (xt + lam), 0.25 * (yt + lam)

    if unroll:
        xt, yt = _iterate(_ndup(), dup, (x, y))
    else:
        xt, yt = jax.lax.fori_loop(0, _ndup(), lambda _, s: dup(s), (x, y))
    ave = (xt + yt + yt) / 3.0
    sv = (yt - ave) / ave
    C1, C2, C3, C4 = 0.3, 1.0 / 7.0, 0.375, 9.0 / 22.0
    return (1.0 + sv * sv * (C1 + sv * (C2 + sv * (C3 + sv * C4)))) \
        / jnp.sqrt(ave)


def _rc_pos_jvp(unroll, primals, tangents):
    x, y = primals
    dx, dy = tangents
    xt, yt, zt, fac, s, _ = _rd_chain(x, y, y, slots=(0, 1))
    val = _rf_tail(xt, yt, zt)
    dot = jnp.zeros_like(val)
    if not isinstance(dx, SymbolicZero):
        cx = -(3.0 * s[0] + fac * _perm_tail(xt, yt, zt, 0)) / 6.0
        dot = dot + cx * jnp.asarray(dx, val.dtype)
    if not isinstance(dy, SymbolicZero):
        # d/dy RF(x,y,y) = -(RD(x,y,y) + RD(y,x,y))/6 = -RD(x,y,y)/3
        cy = -(3.0 * s[1] + fac * _perm_tail(xt, yt, zt, 1)) / 3.0
        dot = dot + cy * jnp.asarray(dy, val.dtype)
    return val, dot


_rc_pos.defjvp(_rc_pos_jvp, symbolic_zeros=True)


def rc(x, y, _unroll=True):
    """Carlson degenerate RC(x,y) = RF(x,y,y).

    x >= 0, y != 0; for y < 0 the Cauchy principal value is returned.
    (reference: sim5elliptic.c:104-137)

    `_unroll=False` forces the loop form regardless of backend -- used by
    rj, whose own duplication would otherwise nest-unroll 16 rc bodies
    inside each of its 16 levels (256 blocks per rj call site; with ~10
    sites in the azimuth/time-delay graphs under emulated f64 this blew
    past the remote TPU compiler's memory).

    Derivatives flow through `_rc_pos`'s analytic rule; the principal-value
    transform RC(x,y) = sqrt(x/(x-y)) RC(x-y,-y) is plain differentiable
    algebra.
    """
    x, y = (jnp.asarray(v, jnp.float64) for v in (x, y))
    x, y = jnp.broadcast_arrays(x, y)
    neg = y < 0.0
    tiny = _tiny_for(x.dtype)
    xt0 = jnp.maximum(jnp.where(neg, x - y, x), tiny)
    yt0 = jnp.where(neg, -y, jnp.where(y == 0.0, tiny, y))
    w = jnp.where(neg, jnp.sqrt(x) / jnp.sqrt(xt0), 1.0)
    unroll = _unroll and (
        jax.default_backend() == "tpu" if _DUP_MODE == "auto"
        else _DUP_MODE == "unroll")
    return w * _rc_pos(xt0, yt0, bool(unroll))


# ---------------------------------------------------------------------------
# RJ
# ---------------------------------------------------------------------------

@jax.custom_jvp
def _rj_pos(x, y, z, p):
    """RJ core for x,y,z >= tiny, p > 0 (pre-floored/transformed by rj).

    Derivatives: dRJ/dx_i = -(RD(.,.,x_i) - RJ)/(2(p - x_i)) (partial
    fractions; the three RDs from one shared chain), dRJ/dp by Euler
    homogeneity.  The divided differences are guarded at p ~ x_i argument
    coincidence (|p-x_i| < sqrt(eps) scale), where their accuracy degrades
    gracefully; no framework call site approaches that coincidence (the
    pole p is never a radial root).
    """
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
        (x, y, z, p, jnp.zeros_like(x), jnp.ones_like(x)))
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
    return 3.0 * s + fac * (1.0 + ed * (-C1 + C5 * ed - C6 * ee)
                            + eb * (C7 + dp * (-C8 + dp * C4))
                            + dp * ea * (C2 - dp * C3)
                            - C2 * dp * ec) / (ave * jnp.sqrt(ave))


def _rj_pos_jvp(primals, tangents):
    x, y, z, p = primals
    val = _rj_pos(x, y, z, p)
    xt, yt, zt, fac, s, _ = _rd_chain(x, y, z, slots=(0, 1, 2))
    R = [3.0 * s[i] + fac * _perm_tail(xt, yt, zt, i) for i in range(3)]
    eps_c = jnp.sqrt(jnp.finfo(val.dtype).eps)

    def coef(i, v):
        d = p - v
        scale = eps_c * (p + v)
        d_safe = jnp.where(jnp.abs(d) < scale,
                           jnp.where(d < 0.0, -scale, scale), d)
        return -0.5 * (R[i] - val) / d_safe

    cs = [coef(0, x), coef(1, y), coef(2, z)]
    cp = (-1.5 * val - x * cs[0] - y * cs[1] - z * cs[2]) / p
    cs.append(cp)
    dot = jnp.zeros_like(val)
    for c, t in zip(cs, tangents):
        if not isinstance(t, SymbolicZero):
            dot = dot + c * jnp.asarray(t, val.dtype)
    return val, dot


_rj_pos.defjvp(_rj_pos_jvp, symbolic_zeros=True)


def rj(x, y, z, p):
    """Carlson RJ(x,y,z,p).

    x,y,z >= 0 (at most one zero), p != 0; for p < 0 the Cauchy principal
    value is returned.  (reference: sim5elliptic.c:144-206)

    Derivatives flow through `_rj_pos`'s analytic rule; the negative-p
    principal-value transform (Carlson 1977, NR 6.11) is differentiable
    algebra over rc/rf, which carry their own rules.
    """
    x, y, z, p = (jnp.asarray(v, jnp.float64) for v in (x, y, z, p))
    x, y, z, p = jnp.broadcast_arrays(x, y, z, p)
    neg = p < 0.0
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

    tiny = _tiny_for(x.dtype)
    xt = jnp.maximum(jnp.where(neg, xs, x), tiny)
    yt = jnp.maximum(jnp.where(neg, ys, y), tiny)
    zt = jnp.maximum(jnp.where(neg, zs, z), tiny)
    pt = jnp.where(neg, pt_neg, jnp.where(p == 0.0, tiny, p))

    ans = _rj_pos(xt, yt, zt, pt)
    ans_neg = a_ * (b_ * ans + 3.0 * (rcx - rf(xt, yt, zt)))
    return jnp.where(neg, ans_neg, ans)
