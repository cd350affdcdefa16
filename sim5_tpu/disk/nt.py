"""Novikov-Thorne / Page-Thorne relativistic thin disk.

TPU-native re-design of sim5disk-nt.c: the reference keeps module-static
state (sim5disk-nt.c:27-32, explicitly not thread-safe); here the disk is an
immutable `NTDisk` params pytree and every quantity is a pure, batched,
differentiable function of (disk, r).

Luminosity integration uses a fixed-grid log-Simpson rule (differentiable,
lockstep) instead of adaptive refinement; the luminosity->mdot inversion is
a fixed-depth bisection wrapped in `lax.custom_root` semantics via implicit
differentiation (the forward value matches the reference's rtbis to ~1e-6).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import consts
from ..core import r_ms
from ..special.quadrature import simpson_weights
from ..utils.fastmath import log_accurate, vlog, sqrt_df


class NTDisk(NamedTuple):
    """Immutable NT disk parameters (the reference's static module state)."""
    M: jnp.ndarray       # BH mass [M_sun]
    a: jnp.ndarray       # BH spin
    mdot: jnp.ndarray    # accretion rate [Eddington units]
    rms: jnp.ndarray     # inner edge (ISCO + 1e-3) [rg]
    alpha: jnp.ndarray   # viscosity parameter
    options: int = 0


DISK_NT_OPTION_LUMINOSITY = 1


def _r_min(a):
    """Disk inner edge = ISCO + 1e-3 (sim5disk-nt.c:91-105)."""
    return r_ms(a) + 1e-3


def _f32_quantize(x):
    """Round to float32 with a straight-through gradient.

    The reference keeps its disk state in `static float` fields
    (sim5disk-nt.c:27-32), so all its outputs see float32-rounded
    (M, a, mdot, rms, alpha).  Mirroring that is required for the <=1e-6
    image parity gate; the straight-through estimator keeps gradients exact.
    """
    q = jnp.asarray(x, jnp.float32).astype(jnp.float64)
    return x + jax.lax.stop_gradient(q - x)


def nt_setup(M, a, mdot_or_L, alpha, options=0, f32_state=True):
    """Construct an NTDisk from (M, a, mdot) or (M, a, L).

    `f32_state=True` (default) mirrors the reference's float32 state storage
    (see _f32_quantize); pass False for full f64 disk parameters.
    (reference: disk_nt_setup, sim5disk-nt.c:37-77)
    """
    M, a, mdot_or_L, alpha = (jnp.asarray(v, jnp.float64)
                              for v in (M, a, mdot_or_L, alpha))
    if f32_state:
        M, a, mdot_or_L, alpha = (
            _f32_quantize(v) for v in (M, a, mdot_or_L, alpha))
    rms = _r_min(a)
    if f32_state:
        rms = _f32_quantize(rms)
    disk = NTDisk(M, a, mdot_or_L, rms, alpha, options)
    if options & DISK_NT_OPTION_LUMINOSITY:
        mdot = nt_mdot_for_luminosity(disk, mdot_or_L)
        if f32_state:
            mdot = _f32_quantize(mdot)
        disk = disk._replace(mdot=mdot)
    return disk


def nt_flux(disk: NTDisk, r):
    """Local radiative flux F(r) from one side of the disk
    [erg cm-2 s-1], Page & Thorne (1974) eq. 15n.

    (reference: disk_nt_flux, sim5disk-nt.c:110-146)
    """
    r = jnp.asarray(r, jnp.float64)
    a = disk.a
    inside = r <= disk.rms
    rs = jnp.where(inside, disk.rms * 1.0001, r)
    ac = jnp.arccos(jnp.clip(a, -1.0, 1.0))
    th = ac / 3.0
    x1 = 2.0 * jnp.cos(th - jnp.pi / 3.0)
    x2 = 2.0 * jnp.cos(th + jnp.pi / 3.0)
    x3 = -2.0 * jnp.cos(th)
    # Stable evaluation of the PT74 bracket
    #   B = f0 - f1 - f2 - f3,
    #   f0 = x - x0 - 1.5 a ln(x/x0),  f_i = c_i ln((x-x_i)/(x0-x_i)),
    # which vanishes linearly at the ISCO while its terms stay O(1): the
    # direct form loses ~5 digits in f32 near the inner edge (each log's
    # argument rounds at ulp(1), measured 1e-5 relative flux error -- the
    # fast path's dominant shading error).  Writing each log as
    # log1p(u) = u - vlog(u) with u = delta/(x0 - x_i), delta = x - x0,
    # collapses the linear parts into one coefficient
    #   C1 = 1 - 1.5 a/x0 - sum_i c_i/(x0 - x_i)
    # whose error is RELATIVE to the bracket, and leaves only the
    # positive, cancellation-free vlog remainders:
    #   B = delta*C1 + 1.5 a vlog(delta/x0) + sum_i c_i vlog(u_i).
    # In f64 this is the same function to ~1e-16 (golden gate 1e-10).
    # (log_accurate inside vlog: XLA's f32 TPU log is ~1e-4 relative and
    # would dominate everything; utils/fastmath.py)
    #
    # f32 conditioning of the pieces (each measured on the 512^2 a=0.998
    # frame; together they were the residual ~5e-6-of-peak error):
    # * the partial-fraction weights c1/c2 have factors that collapse at
    #   extremal spin (a -> 1: x1, x2 -> 1, x_i - a -> 0), where the
    #   direct subtractions lose ~5e-6 relative; EXACT identities valid
    #   at every spin replace them:
    #     x1 - x2 = 2 sqrt(3) sin th,  x2 - x3 = 3 cos th - sqrt(3) sin th
    #     x1 - a  = sin th (sqrt(3) + 2 sin 2th)
    #               (from cos th - cos 3th = 2 sin 2th sin th)
    #     x2 - a  = a (1-a) (1+a) / ((x1-a)(x3-a))
    #               (the cubic evaluated at a: prod (x_i - a) = a - a^3),
    #   the last one exact at BOTH ends: 1 - a is exact in fp for
    #   a in [0.5, 1], and at a -> 0 it degrades gracefully to 0 where
    #   the true c2 weight is ~1e-17.  c3's factors never collapse.
    # * x0 - x_i goes through x0^2 - x_i^2 = (rms - 1) - 2 sin^2 th
    #   -+ sqrt(3) sin 2th (exact expansion of x_i^2), then /(x0 + x_i);
    # * delta = sqrt(r) - sqrt(rms) is a two-float difference (sqrt_df),
    #   accurate to ~ulp OF DELTA at the inner edge;
    # * the shading denominators x - x_i are rebuilt as (x0 - x_i) + delta.
    s3 = jnp.sqrt(3.0)
    sth = jnp.sin(th)
    s2th = jnp.sin(2.0 * th)
    cth = jnp.cos(th)
    d12x = 2.0 * s3 * sth                  # x1 - x2
    d13x = 3.0 * cth + s3 * sth            # x1 - x3
    d23x = 3.0 * cth - s3 * sth            # x2 - x3
    x1ma = sth * (s3 + 2.0 * s2th)         # x1 - a
    x3ma = x3 - a                          # never collapses (<= -1.7)
    x1ma_s = jnp.where(x1ma == 0.0, 1.0, x1ma)
    x2ma = a * (1.0 - a) * (1.0 + a) / (x1ma_s * x3ma)
    x2_s = jnp.where(x2 == 0.0, 1e-300, x2)
    c1_ = 3.0 * x1ma ** 2 / (x1 * d12x * d13x)
    c2_ = -3.0 * x2ma ** 2 / (x2_s * d12x * d23x)
    c3_ = 3.0 * (x3 - a) ** 2 / (x3 * (x3 - x1) * (x3 - x2))
    xh, xl = sqrt_df(rs)
    x = xh
    x0h, x0l = sqrt_df(disk.rms)
    x0 = x0h
    delta = (xh - x0h) + (xl - x0l)
    rms1 = disk.rms - 1.0
    x0mx1 = (rms1 - 2.0 * sth * sth - s3 * s2th) / (x0 + x1)
    x0mx2 = (rms1 - 2.0 * sth * sth + s3 * s2th) / (x0 + x2)
    x0mx3 = x0 + 2.0 * cth
    C1 = 1.0 - 1.5 * a / x0 - c1_ / x0mx1 - c2_ / x0mx2 - c3_ / x0mx3
    B = (delta * C1 + 1.5 * a * vlog(delta / x0)
         + c1_ * vlog(delta / x0mx1)
         + c2_ * vlog(delta / x0mx2)
         + c3_ * vlog(delta / x0mx3))
    # denominator x^3 - 3x + 2a in factored form: x1,x2,x3 ARE its roots
    # by construction, and the expanded polynomial cancels at high spin
    # (a=0.998: value 0.036 from terms ~3 -> 1e-5 rel err in f32); the
    # product of O(1) differences is ~1 ulp
    F = 1.0 / (4.0 * jnp.pi * rs) * 1.5 \
        / (x * x * ((x0mx1 + delta) * (x0mx2 + delta) * (x0mx3 + delta))) * B
    # normalization: F ~ mdot/m * 9.1721376255e+28 erg/cm2/s (sim5disk-nt.c:137-145)
    out = 9.1721376255e+28 * F * disk.mdot / disk.M
    return jnp.where(inside, 0.0, out)


def nt_temp(disk: NTDisk, r):
    """Effective temperature T_eff(r) = (F/sigma_SB)^(1/4) [K]."""
    return (jnp.maximum(nt_flux(disk, r), 0.0) / consts.sb_sigma) ** 0.25


_LUMI_N = 2 ** 12   # fixed Simpson panels (log grid; matches adaptive ref to ~1e-7)


def nt_lumi(disk: NTDisk):
    """Total disk luminosity in Eddington units, integrating
    L = 2 * 2pi Int F(r) (-U_t) r dr over r in (rms, 1e5).

    (reference: disk_nt_lumi, sim5disk-nt.c:151-187; the adaptive Simpson
    becomes a fixed log-grid Simpson rule -- differentiable and lockstep)
    """
    disk_rmax = 1e5
    x0 = jnp.log(disk.rms)
    x1 = jnp.log(disk_rmax)
    n = _LUMI_N
    xs = x0 + (x1 - x0) * jnp.arange(n + 1) / n

    def integrand(logr):
        r = jnp.exp(logr)
        gtt = -1.0 + 2.0 / r
        gtf = -2.0 * disk.a / r
        gff = r ** 2 + disk.a ** 2 + 2.0 * disk.a ** 2 / r
        Omega = 1.0 / (disk.a + r ** 1.5)
        U_t = jnp.sqrt(-1.0 / (gtt + 2.0 * Omega * gtf + Omega ** 2 * gff)) \
            * (gtt + Omega * gtf)
        F = nt_flux(disk, r)
        return 2.0 * jnp.pi * r * 2.0 * (-U_t) * F * r

    ys = integrand(xs)
    h = (x1 - x0) / n
    # scale applied INSIDE the sum: the raw integral ~1e43 erg/s exceeds
    # the TPU f32-pair "f64" exponent range (max ~3.4e38); the Eddington-
    # normalized summands are O(1e5) (cf. the blackbody_Iv range note)
    scale = float(consts.grav_radius ** 2 / consts.L_Edd)
    L = h / 3.0 * jnp.sum(simpson_weights(n) * (ys * scale))
    return L * disk.M


def nt_mdot_for_luminosity(disk: NTDisk, L0):
    """Invert L(mdot) = L0 by fixed-depth bisection over mdot in [0, 100].

    (reference: disk_nt_find_mdot_for_luminosity, sim5disk-nt.c:370-382)
    """
    def lum(mdot):
        return nt_lumi(disk._replace(mdot=mdot))

    lo = jnp.zeros_like(jnp.asarray(L0, jnp.float64))
    hi = jnp.full_like(lo, 100.0)

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        below = lum(mid) < L0
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 40, body, (lo, hi))
    return 0.5 * (lo + hi)


def nt_sigma(disk: NTDisk, r):
    """Midplane column density Sigma(r) [g/cm2] (two-zone SS73-like model).

    (reference: disk_nt_sigma, sim5disk-nt.c:204-251)
    """
    r = jnp.asarray(r, jnp.float64)
    a = disk.a
    inside = r < disk.rms
    rs = jnp.where(inside, disk.rms * 1.0001, r)
    x = jnp.sqrt(rs)
    x0 = jnp.sqrt(disk.rms)
    ac = jnp.arccos(jnp.clip(a, -1.0, 1.0))
    x1 = 2.0 * jnp.cos(ac / 3.0 - jnp.pi / 3.0)
    x2 = 2.0 * jnp.cos(ac / 3.0 + jnp.pi / 3.0)
    x3 = -2.0 * jnp.cos(ac / 3.0)

    xA = 1.0 + a ** 2 / rs ** 2 + 2.0 * a ** 2 / rs ** 3
    xB = 1.0 + a / x ** 3
    xC = 1.0 - 3.0 / x ** 2 + 2.0 * a / x ** 3
    xD = 1.0 - 2.0 / rs + a ** 2 / rs ** 2
    xE = 1.0 + 4.0 * a ** 2 / rs ** 2 - 4.0 * a ** 2 / rs ** 3 + 3.0 * a ** 4 / rs ** 4

    f0 = x - x0 - 1.5 * a * log_accurate(x / x0)
    f1 = 3.0 * (x1 - a) ** 2 / (x1 * (x1 - x2) * (x1 - x3)) * log_accurate((x - x1) / (x0 - x1))
    f2 = 3.0 * (x2 - a) ** 2 / (x2 * (x2 - x1) * (x2 - x3)) * log_accurate((x - x2) / (x0 - x2))
    f3 = 3.0 * (x3 - a) ** 2 / (x3 * (x3 - x2) * (x3 - x1)) * log_accurate((x - x3) / (x0 - x3))
    xL = (1.0 + a / x ** 3) / jnp.sqrt(1.0 - 3.0 / x ** 2 + 2.0 * a / x ** 3) / x \
        * (f0 - f1 - f2 - f3)

    xMdot = disk.mdot * disk.M * consts.Mdot_Edd / 1e17
    r_im = 40.0 * (disk.alpha ** (2.0 / 21.0) / (disk.M / 3.0) ** (2.0 / 3.0)
                   * xMdot ** (16.0 / 20.0)) * xA ** (20.0 / 21.0) \
        * xB ** (-36.0 / 21.0) * xD ** (-8.0 / 21.0) * xE ** (-10.0 / 21.0) \
        * xL ** (16.0 / 21.0)

    sig_in = (20.0 * (disk.M / 3.0) / xMdot / disk.alpha * jnp.sqrt(rs ** 3)
              / xA ** 2 * xB ** 3 * jnp.sqrt(xC) * xE / xL)
    sig_out = (5e4 * (disk.M / 3.0) ** (-2.0 / 5.0) * xMdot ** (3.0 / 5.0)
               * disk.alpha ** (-4.0 / 5.0) * rs ** (-3.0 / 5.0)
               * xB ** (-4.0 / 5.0) * jnp.sqrt(xC) * xD ** (-4.0 / 5.0)
               * xL ** (3.0 / 5.0))
    sigma = jnp.where(rs < r_im, sig_in, sig_out)
    return jnp.where(inside, 0.0, sigma)


def nt_ell(disk: NTDisk, r):
    """Specific angular momentum of the fluid.  (sim5disk-nt.c:256-267)"""
    r = jnp.maximum(disk.rms, jnp.asarray(r, jnp.float64))
    a = disk.a
    sr = jnp.sqrt(r)
    return (r * r - 2.0 * a * sr + a * a) / (sr * r - 2.0 * sr + a)


def nt_vr(disk: NTDisk, r):
    """Radial velocity (zero for a thin disk).  (sim5disk-nt.c:272-282)"""
    return jnp.zeros_like(jnp.asarray(r, jnp.float64))


def nt_h(disk: NTDisk, r):
    """Surface height (zero for a thin disk).  (sim5disk-nt.c:287-298)"""
    return jnp.zeros_like(jnp.asarray(r, jnp.float64))


def nt_dhdr(disk: NTDisk, r):
    """Surface slope dH/dR (zero for a thin disk).  (sim5disk-nt.c:303-313)"""
    return jnp.zeros_like(jnp.asarray(r, jnp.float64))


def nt_dump(disk: NTDisk, filename=None, rmax=2000.0):
    """Print the radial disk structure (r, flux, sigma, ell, vr, H, dH/dr)
    from r_ms out to `rmax` on the reference's x1.05 geometric grid, to
    `filename` or stdout.  (reference: disk_nt_dump, sim5disk-nt.c:318-365)

    The whole radial profile is evaluated as one batched device call;
    only the formatting is host-side.
    """
    import io
    import math
    import sys

    import numpy as np

    rms = float(disk.rms)
    n = max(1, int(math.ceil(math.log(rmax / rms) / math.log(1.05))))
    r = jnp.asarray(rms * 1.05 ** np.arange(n), jnp.float64)
    cols = [r, nt_flux(disk, r), nt_sigma(disk, r), nt_ell(disk, r),
            nt_vr(disk, r), nt_h(disk, r), nt_dhdr(disk, r)]
    cols = [np.asarray(c) for c in cols]

    buf = io.StringIO()
    buf.write("# (sim5_tpu disk.nt) dump\n")
    buf.write("#-------------------------------------------\n")
    buf.write(f"# M        = {float(disk.M):.4f}\n")
    buf.write(f"# a        = {float(disk.a):.4f}\n")
    buf.write(f"# rmin     = {rms:.4f}\n")
    buf.write(f"# rmax     = {rmax:.4f}\n")
    buf.write(f"# alpha    = {float(disk.alpha):.4f}\n")
    buf.write(f"# options  = {int(disk.options)}\n")
    buf.write(f"# L        = {float(nt_lumi(disk)):e}\n")
    buf.write(f"# mdot     = {float(disk.mdot):e}\n")
    buf.write("#-------------------------------------------\n")
    buf.write("# r   flux   sigma   ell   vr   H   dH/dr\n")
    buf.write("#-------------------------------------------\n")
    for row in zip(*cols):
        buf.write("  ".join(f"{v:e}" for v in row) + "\n")

    if filename:
        with open(filename, "w") as fh:
            fh.write(buf.getvalue())
    else:
        sys.stdout.write(buf.getvalue())
