"""Jacobi elliptic functions sn/cn/dn and their inverses.

The forward functions use the Gauss/AGM scheme of the reference
(sim5elliptic.c:536-598), re-expressed with a fixed iteration depth and
per-element masks so that batches evaluate in lockstep on the TPU VPU.
The inverse functions are closed forms in Carlson RF (sim5elliptic.c:480-528).

Conventions: the modulus argument is m = k^2 (Byrd & Friedman), 0 <= m < 1.
"""

import jax.numpy as jnp

from .carlson import rf

_NAGM = 13      # AGM depth (matches reference array size; converges ~quadratically)
_CA = 1.0e-8    # AGM convergence tolerance (reference sim5elliptic.c:544)


def _nagm():
    """AGM depth for the active precision (unrolled; see carlson._ndup)."""
    return _NAGM if jnp.zeros((), jnp.float64).dtype == jnp.float64 else 8


def jacobi_sncndn(u, m, mc=None):
    """Jacobi elliptic functions (sn, cn, dn)(u | m) for 0 <= m < 1.

    Valid for any real u (the AGM scheme is periodic-exact); the reference
    restricts u <= 2K(m) in some callers but the scheme itself does not.
    (reference: sim5elliptic.c:536-598)

    `mc`, when given, is the exact complementary parameter 1 - m computed
    cancellation-free by the caller; the AGM consumes the complement
    directly (its seed is (1, k' = sqrt(mc))), so for m -> 1 the result
    keeps the complement's full relative accuracy -- forming 1 - m here
    would floor mc at ulp(1) and destroy it.  (The NR-family sncndn takes
    the complement as ITS argument for the same reason.)
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


def jacobi_sn(u, m):
    return jacobi_sncndn(u, m)[0]


def jacobi_cn(u, m):
    return jacobi_sncndn(u, m)[1]


def jacobi_dn(u, m):
    return jacobi_sncndn(u, m)[2]


def jacobi_isn(z, m):
    """Inverse Jacobi sn: u with sn(u|m)=z, for -1 < z < 1, 0 <= m < 1.

    (reference: sim5elliptic.c:480-486; BF 132.02/132.01 limits included)
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
