"""Jacobi elliptic functions sn/cn/dn and their inverses.

The forward functions use the Gauss/AGM scheme of the reference
(sim5elliptic.c:536-598), re-expressed with a fixed iteration depth and
per-element masks so that batches evaluate in lockstep on the TPU VPU.
The inverse functions are closed forms in Carlson RF (sim5elliptic.c:480-528).

Analytic derivatives (SURVEY build item 3): `jacobi_sncndn` carries a
`jax.custom_jvp` rule so reverse-mode AD never re-materializes the AGM
chain.  The u-derivatives are algebraic in (sn, cn, dn):

    d sn/du = cn dn,   d cn/du = -sn dn,   d dn/du = -m sn cn

and the m-derivatives follow from the Jacobi epsilon function
eps(u,m) = E(am u, m) (derived by differentiating the defining integral
u = int_0^sn dt/sqrt((1-t^2)(1-m t^2)) under the integral sign):

    d sn/dm =  cn ((u(1-m) - eps) dn + m sn cn) / (2 m (1-m))
    d cn/dm = -sn ((u(1-m) - eps) dn + m sn cn) / (2 m (1-m))
    d dn/dm = -sn (sn dn + cn (u(1-m) - eps)) / (2 (1-m))

with eps evaluated through Carlson RF/RD of (cn^2, dn^2, 1) plus the
quasi-periodic reduction eps(u + 2nK) = eps(u) + 2nE.  Near the parameter
endpoints the closed forms cancel catastrophically (both numerators are
O(m) as m -> 0 and O(1-m) as m -> 1), so the rule blends to the exact
endpoint asymptotics below sqrt(eps) distance from either end -- the same
crossover at which the closed-form rounding error overtakes the
asymptotics' truncation error.

The inverse functions (isn/icn/itn) are closed forms in RF; their
derivatives COMPOSE through rf's analytic custom rule, which reproduces
the inverse-function closed forms exactly (e.g. d isn/dz =
1/sqrt((1-z^2)(1-m z^2)) falls out of dRF/dx = -RD/6 plus the product
rule), so no separate rules are attached.

Conventions: the modulus argument is m = k^2 (Byrd & Friedman), 0 <= m < 1.
"""

import jax
import jax.numpy as jnp
from jax.custom_derivatives import SymbolicZero

from .carlson import rf, _rd_chain, _rf_tail, _rd_tail, _tiny_for

_NAGM = 13      # AGM depth (matches reference array size; converges ~quadratically)
_CA = 1.0e-8    # AGM convergence tolerance (reference sim5elliptic.c:544)


def _nagm():
    """AGM depth for the active precision (unrolled; see carlson._ndup)."""
    return _NAGM if jnp.zeros((), jnp.float64).dtype == jnp.float64 else 8


@jax.custom_jvp
def _sncndn_core(u, emc):
    """(sn, cn, dn)(u | m = 1 - emc) with the complement emc as THE
    parameter argument (pre-clamped to (0, 1] by the wrapper).

    The AGM consumes the complement directly (its seed is (1, k' =
    sqrt(emc))), so for m -> 1 the result keeps the complement's full
    relative accuracy.  (reference: sim5elliptic.c:536-598)
    """
    # ascending AGM with convergence freeze -- UNROLLED so the whole chain
    # fuses into one VPU kernel (a lax.scan would stack the per-level arrays
    # through HBM every iteration)
    depth = _nagm()
    a = a0 = jnp.ones_like(u)
    done = jnp.zeros(u.shape, bool)
    l = jnp.zeros(u.shape, jnp.int32)
    c_sel = a0
    em_list, en_list = [], []
    for i in range(depth):
        emc_s = jnp.sqrt(emc)
        c = 0.5 * (a + emc_s)
        newly = jnp.abs(a - emc_s) <= _CA * a
        c_sel = jnp.where(done, c_sel, c)
        l = jnp.where(done, l, i)
        stop = done | newly
        em_list.append(a)
        en_list.append(emc_s)
        emc = jnp.where(stop, emc, emc_s * a)
        a = jnp.where(stop, a, c)
        done = stop

    uu = u * c_sel
    sn = jnp.sin(uu)
    cn = jnp.cos(uu)
    dn = jnp.ones_like(u)

    # descending Landen recurrence (masked to levels <= l)
    sn_zero = sn == 0.0
    sn_safe = jnp.where(sn_zero, 1.0, sn)
    aa0 = cn / sn_safe
    cc0 = c_sel * aa0

    aa, cc = aa0, cc0
    for ii in range(depth - 1, -1, -1):
        b, en = em_list[ii], en_list[ii]
        act = (ii <= l) & ~sn_zero
        aa_n = aa * cc
        cc_n = cc * dn
        dn_n = (en + aa_n) / (b + aa_n)
        aa2 = cc_n / b
        aa = jnp.where(act, aa2, aa)
        cc = jnp.where(act, cc_n, cc)
        dn = jnp.where(act, dn_n, dn)
    amp = 1.0 / jnp.sqrt(cc * cc + 1.0)
    sn_out = jnp.where(sn >= 0.0, amp, -amp)
    cn_out = cc * sn_out
    sn_out = jnp.where(sn_zero, sn, sn_out)
    cn_out = jnp.where(sn_zero, cn, cn_out)
    return sn_out, cn_out, dn


def _sncndn_core_jvp(primals, tangents):
    u, emc = primals
    du, demc = tangents
    sn, cn, dn = _sncndn_core(u, emc)
    dt = sn.dtype
    feps = jnp.finfo(dt).eps
    m = 1.0 - emc

    d_sn = jnp.zeros_like(sn)
    d_cn = jnp.zeros_like(cn)
    d_dn = jnp.zeros_like(dn)
    if not isinstance(du, SymbolicZero):
        duv = jnp.asarray(du, dt)
        d_sn = d_sn + cn * dn * duv
        d_cn = d_cn - sn * dn * duv
        d_dn = d_dn - m * sn * cn * duv
    if not isinstance(demc, SymbolicZero):
        # eps(u, m) via Carlson + quasi-period reduction (module docstring).
        # Each RF+RD pair at shared arguments comes from ONE duplication
        # chain (_rd_chain with the z-slot accumulator): two chains total
        # for the complete (K, E) and incomplete pairs.
        one = jnp.ones_like(sn)
        tiny = _tiny_for(dt)
        ct, et, ot, fac_c, s_c, _ = _rd_chain(
            jnp.full_like(sn, tiny), jnp.maximum(emc, tiny), one, slots=(2,))
        K = _rf_tail(ct, et, ot)
        E = K - m * (3.0 * s_c[2] + fac_c * _rd_tail(ct, et, ot)) / 3.0
        cn2, dn2 = cn * cn, dn * dn
        it_, jt_, kt_, fac_i, s_i, _ = _rd_chain(
            jnp.maximum(cn2, tiny), jnp.maximum(dn2, tiny), one, slots=(2,))
        F_inc = _rf_tail(it_, jt_, kt_)
        D_inc = 3.0 * s_i[2] + fac_i * _rd_tail(it_, jt_, kt_)
        eps_inc = sn * F_inc - (m / 3.0) * sn ** 3 * D_inc
        n = jnp.floor((u + K) / (2.0 * K))
        sgn = jnp.where(jnp.mod(n, 2.0) == 0.0, 1.0, -1.0)
        eps_u = 2.0 * n * E + sgn * eps_inc

        W = u * emc - eps_u
        m_s = jnp.maximum(m, 1e-30)
        emc_s = jnp.maximum(emc, 1e-30)
        N = W * dn + m * sn * cn
        g_sn = cn * N / (2.0 * m_s * emc_s)
        g_cn = -sn * N / (2.0 * m_s * emc_s)
        g_dn = -sn * (sn * dn + cn * W) / (2.0 * emc_s)

        # endpoint asymptotics (exact O(m) / O(emc) limits; see docstring)
        ucd = u * cn * dn
        a0_sn = -(u - sn * cn) * cn / 4.0           # m -> 0
        a0_cn = sn * (u - sn * cn) / 4.0
        a0_dn = -sn * sn / 2.0
        cn_g = jnp.where(jnp.abs(cn) > 1e-30, cn,
                         jnp.where(cn >= 0.0, 1e-30, -1e-30))
        a1_sn = -(sn - ucd) / 4.0                   # m -> 1
        a1_cn = (sn / cn_g) * (sn - ucd) / 4.0
        a1_dn = -sn * (sn + ucd) / (4.0 * jnp.maximum(dn, 1e-30))

        th = jnp.sqrt(feps)
        dm_sn = jnp.where(m < th, a0_sn, jnp.where(emc < th, a1_sn, g_sn))
        dm_cn = jnp.where(m < th, a0_cn, jnp.where(emc < th, a1_cn, g_cn))
        dm_dn = jnp.where(m < th, a0_dn, jnp.where(emc < th, a1_dn, g_dn))

        dmv = -jnp.asarray(demc, dt)    # d/d emc = -d/dm
        d_sn = d_sn + dm_sn * dmv
        d_cn = d_cn + dm_cn * dmv
        d_dn = d_dn + dm_dn * dmv
    return (sn, cn, dn), (d_sn, d_cn, d_dn)


_sncndn_core.defjvp(_sncndn_core_jvp, symbolic_zeros=True)


def jacobi_sncndn(u, m, mc=None):
    """Jacobi elliptic functions (sn, cn, dn)(u | m) for 0 <= m < 1.

    Valid for any real u (the AGM scheme is periodic-exact); the reference
    restricts u <= 2K(m) in some callers but the scheme itself does not.
    (reference: sim5elliptic.c:536-598)

    `mc`, when given, is the exact complementary parameter 1 - m computed
    cancellation-free by the caller; the AGM consumes the complement
    directly, so for m -> 1 the result keeps the complement's full
    relative accuracy -- forming 1 - m here would floor mc at ulp(1) and
    destroy it.  (The NR-family sncndn takes the complement as ITS
    argument for the same reason.)

    Differentiable in (u, m) / (u, mc) through `_sncndn_core`'s analytic
    custom rule (module docstring).
    """
    u = jnp.asarray(u, jnp.float64)
    m = jnp.asarray(m, jnp.float64)
    if mc is None:
        u, m = jnp.broadcast_arrays(u, m)
        # clamp m==1 like the reference (sim5elliptic.c:542)
        m = jnp.where(m >= 1.0, 0.999999999, m)
        emc = 1.0 - m
    else:
        mc = jnp.asarray(mc, jnp.float64)
        u, m, mc = jnp.broadcast_arrays(u, m, mc)
        emc = jnp.where(mc <= 0.0, 1e-9, mc)
    return _sncndn_core(u, emc)


def jacobi_sn(u, m):
    return jacobi_sncndn(u, m)[0]


def jacobi_cn(u, m):
    return jacobi_sncndn(u, m)[1]


def jacobi_dn(u, m):
    return jacobi_sncndn(u, m)[2]


def jacobi_isn(z, m):
    """Inverse Jacobi sn: u with sn(u|m)=z, for -1 < z < 1, 0 <= m < 1.

    (reference: sim5elliptic.c:480-486; BF 132.02/132.01 limits included)
    Derivatives compose through rf's analytic rule (the closed
    inverse-function forms, see module docstring).
    """
    z = jnp.asarray(z, jnp.float64)
    m = jnp.asarray(m, jnp.float64)
    z, m = jnp.broadcast_arrays(z, m)
    gen = z * rf(1.0 - z * z, 1.0 - m * z * z, jnp.ones_like(z))
    m0 = jnp.abs(m) < 1e-8
    m1 = jnp.abs(m - 1.0) < 1e-8
    z_c = jnp.clip(z, -1.0 + 1e-15, 1.0 - 1e-15)
    return jnp.where(m0, jnp.arcsin(jnp.clip(z, -1.0, 1.0)),
                     jnp.where(m1, jnp.log(jnp.sqrt((1.0 + z_c) / (1.0 - z_c))), gen))


def _elliptic_k_raw(m):
    # local complete integral (avoids circular import with legendre.py)
    m = jnp.where(m >= 1.0, 1.0 - 1e-8, m)
    return rf(jnp.zeros_like(m), 1.0 - m, jnp.ones_like(m))


def _elliptic_f_sin_raw(sin_phi, m):
    s2 = sin_phi * sin_phi
    return sin_phi * rf(1.0 - s2, 1.0 - s2 * m, jnp.ones_like(s2))


def jacobi_icn(z, m):
    """Inverse Jacobi cn: u with cn(u|m)=z, for -1 <= z <= 1, 0 <= m < 1.

    (reference: sim5elliptic.c:492-514; the z<0 branch follows
     functions.wolfram.com InverseJacobiCN 05)
    """
    z = jnp.asarray(z, jnp.float64)
    m = jnp.asarray(m, jnp.float64)
    z, m = jnp.broadcast_arrays(z, m)
    # snap values that are within 1e-8 outside the domain (reference behaviour)
    z = jnp.where((z > 1.0) & (z < 1.0 + 1e-8), 1.0, z)
    z = jnp.where((z < -1.0) & (z > -1.0 - 1e-8), -1.0, z)
    m = jnp.where((m > 1.0) & (m < 1.0 + 1e-8), 1.0, m)
    m = jnp.where((m < 0.0) & (m > -1e-8), 0.0, m)

    az = jnp.abs(z)
    az_c = jnp.minimum(az, 1.0)
    # evaluate the generic branch away from |z| in {0, 1}: those points are
    # handled by dedicated branches below, and sqrt(1-z^2)/RF have infinite
    # derivatives there that would NaN-poison reverse-mode gradients of the
    # masked-out lanes
    az_g = jnp.where((az_c >= 1.0 - 1e-15) | (az_c == 0.0), 0.5, az_c)
    icn1 = jnp.sqrt(1.0 - az_g * az_g) * rf(az_g * az_g,
                                            1.0 - m * (1.0 - az_g * az_g),
                                            jnp.ones_like(az_g))
    icn1 = jnp.where(az_c >= 1.0 - 1e-15, 0.0,
                     jnp.where(az_c == 0.0, _elliptic_k_raw(m), icn1))
    # z<0: icn(z) = 2/sqrt(1-m) F_sin(-z | m/(m-1)) + icn(|z|)
    m_safe = jnp.where(m >= 1.0, 1.0 - 1e-12, m)
    mp = m_safe / (m_safe - 1.0 - jnp.where(m_safe == 1.0, 1e-300, 0.0))
    # F_sin at sin=1 has an infinite derivative through its argument; those
    # lanes take the exact complete-integral limit with a constant zero
    # first RF argument (no gradient path)
    f_gen = _elliptic_f_sin_raw(az_g, mp)
    f_lim = rf(jnp.zeros_like(mp), 1.0 - mp, jnp.ones_like(mp))
    neg_term = 2.0 / jnp.sqrt(1.0 - m_safe) * jnp.where(
        az_c >= 1.0 - 1e-15, f_lim, f_gen)
    gen = jnp.where(z > 0.0, icn1, neg_term + icn1)

    m0 = m == 0.0
    m1 = m == 1.0
    # all special-branch formulas are evaluated at gradient-safe arguments
    # (their |z|~1 limits have infinite slopes that would NaN reverse-mode
    # cotangents of the other branches)
    z_s = jnp.where((az_c == 0.0) | (az_c >= 1.0 - 1e-15), 0.5, az_c)
    m1val = jnp.where(az_c >= 1.0 - 1e-15, 0.0,
                      jnp.log((1.0 + jnp.sqrt(1.0 - z_s)) / z_s))
    acos_arg = jnp.where(jnp.abs(z) >= 1.0 - 1e-15, 0.0, jnp.clip(z, -1.0, 1.0))
    m0val = jnp.where(z >= 1.0 - 1e-15, 0.0,
                      jnp.where(z <= -1.0 + 1e-15, jnp.pi,
                                jnp.arccos(acos_arg)))
    out = jnp.where(z == 0.0, _elliptic_k_raw(m),
                    jnp.where(z == 1.0, 0.0,
                              jnp.where(m0, m0val,
                                        jnp.where(m1, m1val, gen))))
    return out


def icn_signed(z, m):
    """Inverse Jacobi cn restricted to -1 < z < 1 and 0 < m < 1 -- the
    generic branches of `jacobi_icn` only (2 RF evaluations instead of 4).

    Hot-path specialization: callers (the radial-potential RC-branch
    integrals, where z = (A-B)/(A+B) is strictly inside (-1,1) and the
    modulus is strictly inside (0,1)) never hit the z in {0, +-1} / m in
    {0, 1} special branches, whose masked evaluation costs two extra
    Carlson-RF passes per pixel in `jacobi_icn`.
    """
    z = jnp.asarray(z, jnp.float64)
    m = jnp.asarray(m, jnp.float64)
    z, m = jnp.broadcast_arrays(z, m)
    # dtype-aware domain guard: in f32 fast mode 1-1e-12 would round to
    # exactly 1.0 and reintroduce the 0/0 the clip exists to prevent
    feps = 8.0 * jnp.finfo(z.dtype).eps
    az = jnp.clip(jnp.abs(z), feps, 1.0 - feps)
    icn1 = jnp.sqrt(1.0 - az * az) * rf(az * az,
                                        1.0 - m * (1.0 - az * az),
                                        jnp.ones_like(az))
    # z<0: icn(z) = 2/sqrt(1-m) F_sin(-z | m/(m-1)) + icn(|z|)
    m_safe = jnp.clip(m, 0.0, 1.0 - feps)
    mp = m_safe / (m_safe - 1.0)
    neg_term = 2.0 / jnp.sqrt(1.0 - m_safe) * _elliptic_f_sin_raw(az, mp)
    return jnp.where(z >= 0.0, icn1, neg_term + icn1)


def jacobi_itn(z, m):
    """Inverse Jacobi tn (= sn/cn): BF 131.00.  (reference: sim5elliptic.c:522-528)"""
    z = jnp.asarray(z, jnp.float64)
    m = jnp.asarray(m, jnp.float64)
    z, m = jnp.broadcast_arrays(z, m)
    # note: like the reference, the generic branch is even in z (the callers
    # only rely on that behaviour, e.g. CC-type Rpc uses itn(-1/g1))
    gen = jacobi_isn(jnp.sqrt(z * z / (1.0 + z * z)), m)
    m0 = m == 0.0
    m1 = m == 1.0
    return jnp.where(m0, jnp.arctan(z),
                     jnp.where(m1, jnp.log(z + jnp.sqrt(1.0 + z * z)), gen))
