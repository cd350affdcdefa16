"""High-level disk raytracing driver (images, spectra, surface solving).

Batched TPU-native equivalent of the reference application layer
(python/sim5diskraytrace.py): renders disk images and observed spectra for
any `DiskModel` (razor-thin via the analytic midplane crossing; thick disks
via a batched surface-intersection march along the analytic geodesic).

Everything evaluates whole pixel batches in lockstep; the per-pixel Python
loops of the reference (sim5diskraytrace.py:163-206) are gone.
"""

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import consts
from ..core import (kerr_metric, tetrad_surface, on2bl, dotprod,
                    Omega_from_ell, r_bh, photon_momentum)
from ..disk import DiskModel
from ..geodesic import (
    geodesic_init_inf, geodesic_find_midplane_crossing, geodesic_position_rad,
    geodesic_position_pol, geodesic_P_int, geodesic_follow, geodesic_dm_sign,
    GEOD_TYPE_RR_BH,
)
from ..radiation import blackbody_Iv


# ---------------------------------------------------------------------------
# local-frame helpers (sim5diskraytrace.py:340-430)
# ---------------------------------------------------------------------------

def disk_tetrad(a, r, m, disk: DiskModel):
    """Tetrad attached to the disk surface at (r, m).

    (reference: DiskRaytrace.__tetrad, sim5diskraytrace.py:340-349)
    """
    R = r * jnp.sqrt(1.0 - m * m)
    metric = kerr_metric(a, r, m)
    # Omega_from_ell has a pole where g33 + ell*g03 = 0 (deep ergosphere);
    # such lanes are outside every disk's validity domain -- clamp them to
    # a finite value so they cannot NaN-poison batched gradients (their
    # tetrad is discarded via tetrad_valid / flux masks downstream)
    Omega = Omega_from_ell(disk.ell(R), metric)
    Omega = jnp.where(jnp.isfinite(Omega) & (jnp.abs(Omega) < 1e3), Omega, 0.0)
    dhdr = jnp.where(m > 0.0, disk.dhdr(R), 0.0)
    return tetrad_surface(metric, Omega, disk.vr(R), dhdr)


def observed_gfactor(k, tetrad):
    """Energy shift g = k_t(infinity)/(k.U) of a photon INCOMING to the local
    frame (backward raytracing).  (sim5diskraytrace.py:353-362)"""
    m = tetrad.metric
    U = tetrad.e[..., 0, :]
    g = (k[..., 0] * m.g00 + k[..., 3] * m.g03) / dotprod(k, U, m)
    return jnp.maximum(g, 0.0)


def emission_angle(k, tetrad):
    """Cosine of the emission angle mu_e = (k.N)/(k.U).

    (sim5diskraytrace.py:377-401; small negatives from dH/dR imperfections
    are snapped to 1e-3 as in the reference)
    """
    m = tetrad.metric
    U = tetrad.e[..., 0, :]
    N = tetrad.e[..., 2, :]
    mue = dotprod(k, N, m) / dotprod(k, U, m)
    mue = jnp.where((mue < 0.0) & (mue > -1e-2), 1e-3, mue)
    return mue


def vertical_gravity(R, tetrad, bh_mass, bh_spin):
    """Vertical gravitational acceleration at the disk surface [s^-2]
    (Zhu+2012).  (sim5diskraytrace.py:405-414)"""
    m = tetrad.metric
    U = tetrad.e[..., 0, :]
    u_t = U[..., 0] * m.g00 + U[..., 3] * m.g03
    u_f = U[..., 0] * m.g03 + U[..., 3] * m.g33
    return (bh_mass * consts.solar_mass * consts.grav_const
            / (R * bh_mass * consts.grav_radius) ** 3
            * (u_f ** 2 + bh_spin ** 2 * (u_t - 1.0)) / R)


def spectral_hardening(T, mdot):
    """Spectral hardening factor fit (You+2015, arXiv:1506.03959).

    (sim5diskraytrace.py:418-430)
    """
    t4 = T / 1e4
    m4 = ((mdot + 0.1) / 0.2) ** 0.24
    t4s = jnp.maximum(t4, 1e-30)
    return jnp.where(t4 > 10.0, 1.6 * m4,
                     jnp.where(t4 > 1.0, (t4s / 3.0) ** 0.3904 * m4, m4))


# ---------------------------------------------------------------------------
# spectral models (python/sim5diskspectrum.py)
# ---------------------------------------------------------------------------

class DiskSpectrum:
    """Base spectral model protocol: spectrum(T, mu, f, E) -> Iv."""

    def spectrum(self, T, mu, f, E):
        raise NotImplementedError


class DiskSpectrum_BlackBody(DiskSpectrum):
    """Planck spectrum with hardening factor and limb darkening.

    (reference: DiskSpectrum_BlackBody, sim5diskspectrum.py:48-88)
    """

    def spectrum(self, T, mu, f, E):
        T = jnp.asarray(T, jnp.float64)
        Iv = blackbody_Iv(T[..., None], f[..., None], mu[..., None], E)
        return jnp.where(T[..., None] >= 1e2, Iv, 0.0)


# ---------------------------------------------------------------------------
# thick-disk surface intersection
# ---------------------------------------------------------------------------

def find_surface_march(g, disk: DiskModel, accuracy=1e-2, max_steps=512):
    """Reference-parity surface intersection by step-halving march along
    the analytic solution -- the batched equivalent of the reference's
    DiskRaytrace.__find_surface (sim5diskraytrace.py:257-336), retained as
    the parity oracle (it reproduces the reference's march ENDPOINTS to
    machine precision, tests/test_driver.py golden) and as a fallback for
    exotic geometries.  Production code uses `find_surface` (bracketed
    root-find in P: ~20x fewer elliptic inversions, differentiable).

    Returns (P, r, m, ok).  The march is an early-exit `lax.while_loop`:
    one batched iteration per step while ANY ray is still marching
    (typical batches finish in ~30-80 steps).  The equatorial-plane
    shortcut target is loop-invariant and hoisted.  Not
    reverse-differentiable (while_loop).
    """
    disk_theta = jnp.arctan(disk.h(jnp.asarray(1e6)) / 1e6)
    r0 = jnp.maximum(jnp.maximum(200.0, 1.1 * g.rp),
                     0.5 * jnp.sqrt(g.alpha ** 2 + g.beta ** 2)
                     / jnp.cos(g.incl + disk_theta))

    # expand r0 (x2) until the start point lies above the surface
    # (early-exit while_loop: typical batches need 0-2 doublings; each
    # probe is a P_int + two elliptic inversions)
    def need_expand(r0):
        P1 = geodesic_P_int(g, r0, 0)
        r1 = geodesic_position_rad(g, P1)
        m1 = geodesic_position_pol(g, P1)
        H1 = r1 * m1
        Hd = disk.h(r1 * jnp.sqrt(1.0 - m1 ** 2))
        return (Hd >= H1) & (r0 < 5e6) & jnp.isfinite(P1)

    def exp_cond(carry):
        r0, i = carry
        return (i < 16) & jnp.any(need_expand(r0))

    def exp_body(carry):
        r0, i = carry
        return jnp.where(need_expand(r0), 2.0 * r0, r0), i + 1

    r0, _ = jax.lax.while_loop(exp_cond, exp_body,
                               (r0, jnp.zeros((), jnp.int32)))
    P = geodesic_P_int(g, r0, 0)
    r = geodesic_position_rad(g, P)
    m = geodesic_position_pol(g, P)
    H = r * m
    Hd = disk.h(r * jnp.sqrt(1.0 - m ** 2))
    alive = (Hd < H) & jnp.isfinite(P) & (g.status == 0)

    # loop-invariant equatorial-plane shortcut target (hoisted: the old
    # loop re-derived the crossing and both inversions every iteration)
    P_eq = geodesic_find_midplane_crossing(g, 0)
    P_eq_z = jnp.where(jnp.isfinite(P_eq), P_eq, 1.0)
    r_eq = geodesic_position_rad(g, P_eq_z)
    m_eq = geodesic_position_pol(g, P_eq_z)
    eq_ok = jnp.isfinite(P_eq) & jnp.isfinite(r_eq)

    state = dict(P=P, r=jnp.where(alive, r, 10.0), m=jnp.where(alive, m, 0.5),
                 sf=jnp.ones_like(r), alive=alive,
                 done=jnp.zeros(r.shape, bool),
                 i=jnp.zeros((), jnp.int32))

    def cond(st):
        return (st["i"] < max_steps) & jnp.any(st["alive"] & ~st["done"])

    def body(st):
        P, r, m, sf, alive, done = (st["P"], st["r"], st["m"], st["sf"],
                                    st["alive"], st["done"])
        R = r * jnp.sqrt(1.0 - m ** 2)
        H = r * m
        Hd = disk.h(R)
        step = jnp.maximum(accuracy / 2.0,
                           jnp.minimum((H - Hd) / 2.0,
                                       0.5 * (jnp.sqrt(jnp.maximum(r, 1.0)) - 0.99) * sf))
        # forward/revert steps are <= 0.5 (sqrt(r)-0.99) sf, i.e. <= 10
        # substeps under the 5e-2 sqrt(r) clamp; 12 leaves margin
        Pn, rn, mn, stat = geodesic_follow(g, step, P, r, m,
                                           max_substeps=12)
        Rn = rn * jnp.sqrt(1.0 - mn ** 2)
        Hn = rn * mn
        Hdn = disk.h(Rn)
        crossed = (Hn <= Hdn) & alive & ~done
        # surface hit at fine resolution -> step back half and stop
        fine = crossed & (step < accuracy)
        # the fine back-step only fires at step < accuracy (1e-2), which
        # the 5e-2 sqrt(r) substep clamp covers in ONE substep -- a
        # 2-substep scan is exact there and ~30% cheaper per iteration
        # than padding to 16
        Pb, rb, mb, _ = geodesic_follow(g, -step / 2.0, Pn, rn, mn,
                                        max_substeps=2)
        # crossed but coarse -> revert the step, reduce step factor
        Pc, rc_, mc, _ = geodesic_follow(g, -step, Pn, rn, mn,
                                         max_substeps=12)
        # equatorial-plane shortcut (thin outer region)
        eqhit = (jnp.abs(Hn) < 1e-4) & alive & ~done & ~crossed & eq_ok

        fail = alive & ~done & ((stat == 0) | (rn < 1.05 * r_bh(g.a)) | (mn < 0.0))

        P_out = jnp.where(fine, Pb, jnp.where(crossed, Pc, jnp.where(eqhit, P_eq_z, Pn)))
        r_out = jnp.where(fine, rb, jnp.where(crossed, rc_, jnp.where(eqhit, r_eq, rn)))
        m_out = jnp.where(fine, mb, jnp.where(crossed, mc, jnp.where(eqhit, m_eq, mn)))
        sf = jnp.where(crossed & ~fine, sf / 5.0, sf)
        done_n = done | fine | eqhit
        alive_n = alive & ~fail & ~done_n

        upd = alive & ~done
        return dict(P=jnp.where(upd, P_out, P), r=jnp.where(upd, r_out, r),
                    m=jnp.where(upd, m_out, m), sf=sf,
                    alive=jnp.where(upd, alive_n, alive),
                    done=jnp.where(upd, done_n, done),
                    i=st["i"] + 1)

    state = jax.lax.while_loop(cond, body, state)
    ok = state["done"]
    return state["P"], state["r"], state["m"], ok


def _geodesic_probe_axis(g):
    """Broadcast helper: append a probe axis to every per-ray field of a
    Geodesic pytree (root-array fields keep their trailing axis last), so
    position functions evaluate a (..., N) batch of P values per ray."""
    nd = jnp.asarray(g.a).ndim

    def ex(v):
        v = jnp.asarray(v)
        return v[..., None, :] if v.ndim == nd + 1 else v[..., None]

    return jax.tree_util.tree_map(ex, g)


def _surface_resid(g, disk, P, qpos=False):
    """Photosphere residual f(P) = H(P) - h(R(P)) along the geodesic,
    with (r, m) returned for reuse.  NaN-safe: invalid P evaluates the
    residual at a dummy value (masked by callers).

    qpos=True skips the vortical (q < 0) poloidal branch -- one of the
    three elliptic inversions per evaluation.  Valid inside find_surface,
    whose bracket requires an equatorial crossing (q > 0 by construction).
    """
    r = geodesic_position_rad(g, P)
    if qpos:
        from ..geodesic.analytic import _fold_pol, _theta_inv
        Pz = jnp.where(jnp.isfinite(P), P, 0.0)
        sign_dm, dT = _fold_pol(g, Pz)
        m = -sign_dm * _theta_inv(g, dT)
        m = jnp.where(jnp.isfinite(P), m, jnp.nan)
    else:
        m = geodesic_position_pol(g, P)
    bad = ~jnp.isfinite(r) | ~jnp.isfinite(m)
    r_s = jnp.where(bad, 10.0, r)
    m_s = jnp.where(bad, 0.5, m)
    R = r_s * jnp.sqrt(jnp.clip(1.0 - m_s * m_s, 1e-12, 1.0))
    f = r_s * m_s - disk.h(R)
    return jnp.where(bad, -1.0, f), r_s, m_s, bad


def find_surface(g, disk: DiskModel, accuracy=1e-2, max_steps=512,
                 n_scan=24):
    """First intersection of each geodesic with the disk photosphere
    H = disk.h(R), as a BRACKETED ROOT-FIND in the position integral P.

    TPU-native redesign of the reference's step-halving march
    (DiskRaytrace.__find_surface, sim5diskraytrace.py:257-336; retained
    verbatim-semantics as `find_surface_march`): the analytic engine makes
    the surface hit a root of the scalar residual f(P) = H(P) - h(R(P))
    on a bracket the ray's first equatorial crossing supplies for free --
    f > 0 at the far start point and f <= 0 at P_eq where H = 0 <= h.
    A fixed n_scan-probe sweep (ONE batched elliptic inversion of shape
    (..., n_scan)) locates the first sign change; fixed-depth bisection
    refines it; a final Newton polish with the CLOSED-FORM dP-derivative

        df/dP = m dr/dP + r dm/dP - h'(R) dR/dP,
        dr/dP = +-sqrt(R(r)),   dm/dP = +-sqrt(Theta(m))

    (the radial/poloidal Carter potentials -- no autodiff through the
    solve) both sharpens the root and attaches the implicit-function
    gradient: bracket discovery runs under stop_gradient, so
    d(surface)/d(spin, disk params) flows ONLY through the Newton
    correction, which is exactly the IFT formula at f ~ 0.  This is what
    makes thick-disk images and spectra fit-differentiable (round-4
    verdict task 3), at ~20x fewer elliptic inversions than the march
    (n_scan + ~30 bisections vs ~1000 masked follow substeps).

    Returns (P, r, m, ok).  Rays whose first equatorial crossing does not
    exist (vortical q < 0, or crossing beyond the domain) are reported
    ok=False, as the march does in practice for every tested geometry.
    """
    sg = jax.lax.stop_gradient
    gs = jax.tree_util.tree_map(sg, g)

    disk_theta = jnp.arctan(disk.h(jnp.asarray(1e6)) / 1e6)
    r0 = jnp.maximum(jnp.maximum(200.0, 1.1 * gs.rp),
                     0.5 * jnp.sqrt(gs.alpha ** 2 + gs.beta ** 2)
                     / jnp.cos(gs.incl + disk_theta))

    # expand r0 (x2) until the start point lies above the surface (as the
    # march does); early-exit while_loop, gradient-free under stop_gradient
    def above(r0):
        P = geodesic_P_int(gs, r0, 0)
        f, _, _, bad = _surface_resid(gs, disk, P, qpos=True)
        return (f > 0.0) & ~bad & jnp.isfinite(P)

    def exp_cond(carry):
        r0, i = carry
        return (i < 16) & jnp.any(~above(r0) & (r0 < 5e6))

    def exp_body(carry):
        r0, i = carry
        return jnp.where(~above(r0) & (r0 < 5e6), 2.0 * r0, r0), i + 1

    r0, _ = jax.lax.while_loop(exp_cond, exp_body,
                               (r0, jnp.zeros((), jnp.int32)))
    P0 = geodesic_P_int(gs, r0, 0)
    f0, _, _, bad0 = _surface_resid(gs, disk, P0, qpos=True)
    P_eq = geodesic_find_midplane_crossing(gs, 0)
    has_eq = jnp.isfinite(P_eq)
    alive = (f0 > 0.0) & ~bad0 & jnp.isfinite(P0) & (gs.status == 0) & has_eq

    P0z = jnp.where(alive, P0, 0.4)
    P1z = jnp.where(alive & (P_eq > P0z), P_eq, P0z + 0.1)

    # coarse scan: one batched inversion over (..., n_scan) probes
    t = (jnp.arange(n_scan, dtype=P0z.dtype) + 1.0) / n_scan
    Ps = P0z[..., None] + (P1z - P0z)[..., None] * t
    ge = _geodesic_probe_axis(gs)
    fs, _, _, _ = _surface_resid(ge, disk, Ps, qpos=True)
    neg = fs <= 0.0
    crossed = jnp.any(neg, axis=-1)
    idx = jnp.argmax(neg, axis=-1)           # first probe at/past the surface
    P_hi = jnp.take_along_axis(Ps, idx[..., None], axis=-1)[..., 0]
    P_prev = jnp.take_along_axis(Ps, jnp.maximum(idx - 1, 0)[..., None],
                                 axis=-1)[..., 0]
    P_lo = jnp.where(idx == 0, P0z, P_prev)

    # fixed-depth bisection down to the Newton basin (~1e-5 bracket
    # width); the closed-form Newton polish below is quadratic, so one
    # step from there reaches the working precision's noise floor
    depth = 24 if jnp.zeros((), jnp.float64).dtype == jnp.float64 else 16

    def bis(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        fm, _, _, _ = _surface_resid(gs, disk, mid, qpos=True)
        pos = fm > 0.0
        return jnp.where(pos, mid, lo), jnp.where(pos, hi, mid)

    P_lo, P_hi = jax.lax.fori_loop(0, depth, bis, (P_lo, P_hi))
    P_b = sg(0.5 * (P_lo + P_hi))

    # Newton polish at the converged root with DIFFERENTIABLE quantities:
    # the implicit-function gradient dP*/dtheta = -f_theta / f_P
    f_b, r_b, m_b, _ = _surface_resid(g, disk, P_b, qpos=True)
    a2 = g.a * g.a
    R_pot = (r_b ** 4 + (a2 - g.l ** 2 - g.q) * r_b ** 2
             + 2.0 * (g.q + (g.l - g.a) ** 2) * r_b - a2 * g.q)
    M_pot = g.q + (a2 - g.l ** 2 - g.q) * m_b ** 2 - a2 * m_b ** 4
    # radial direction sign: inward (-) before the turning point at
    # P = Rpc, outward (+) after; RR_BH bound bands run opposite
    # (geodesic_momentum convention, analytic.py)
    rsign = jnp.where(P_b < g.Rpc, -1.0, 1.0) * jnp.where(
        g.gtype == GEOD_TYPE_RR_BH, -1.0, 1.0)
    drdP = rsign * jnp.sqrt(jnp.maximum(R_pot, 0.0))
    dmdP = geodesic_dm_sign(g, P_b) * jnp.sqrt(jnp.maximum(M_pot, 0.0))
    dmdP = jnp.where(jnp.isfinite(dmdP), dmdP, 0.0)
    s1m = jnp.sqrt(jnp.clip(1.0 - m_b * m_b, 1e-12, 1.0))
    R_b = r_b * s1m
    dRdP = s1m * drdP - r_b * m_b / s1m * dmdP
    dfdP = m_b * drdP + r_b * dmdP - disk.dhdr(R_b) * dRdP
    dfdP = sg(dfdP)      # IFT: only f's theta-gradient matters at f ~ 0
    dfdP = jnp.where(jnp.abs(dfdP) > 1e-12, dfdP, -1e-12)
    P_star = P_b - f_b / dfdP

    r_star = geodesic_position_rad(g, P_star)
    m_star = geodesic_position_pol(g, P_star)
    ok = (alive & crossed & jnp.isfinite(P_star) & jnp.isfinite(r_star)
          & jnp.isfinite(m_star) & (sg(r_star) > 1.05 * r_bh(sg(g.a))))
    P_out = jnp.where(ok, P_star, jnp.where(jnp.isfinite(P_star), P_star, 1.0))
    r_out = jnp.where(ok, r_star, 10.0)
    m_out = jnp.where(ok, m_star, 0.5)
    return P_out, r_out, m_out, ok


# ---------------------------------------------------------------------------
# the driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DiskRaytrace:
    """Raytracing from a disk photosphere to an observer at infinity.

    (reference: DiskRaytrace, python/sim5diskraytrace.py:16-462)
    """
    bh_mass: float
    bh_spin: float
    bh_dist: float              # [kpc]
    disk: DiskModel
    spectra: DiskSpectrum
    r_max: float = 1e6

    def __post_init__(self):
        self.bh_spin = max(self.bh_spin, 1e-4)
        self._image_cache = {}   # (incl, rmax, N, limbdk, mesh) -> jitted fn

    def geodesic(self, incl, alpha, beta, flat=None):
        """Batched pixel->surface solver.

        Returns (r, m, g, k, ok); k is the photon momentum pointing from
        the disk outward (the reference's convention,
        sim5diskraytrace.py:250: r_sign=Rpc-P, m_sign=+1).
        """
        if flat is None:
            flat = bool(np.asarray(self.disk.h(jnp.asarray(1e5))) == 0.0)
        g = geodesic_init_inf(incl, self.bh_spin, alpha, beta)
        if flat:
            P = geodesic_find_midplane_crossing(g, 0)
            r = geodesic_position_rad(g, P)
            m = jnp.zeros_like(r)
            ok = jnp.isfinite(r) & (g.status == 0)
        else:
            P, r, m, ok = find_surface(g, self.disk)
        r_s = jnp.where(ok, r, 10.0)
        m_s = jnp.where(ok, m, 0.0)
        P_s = jnp.where(ok, P, 1.0)
        k = photon_momentum(self.bh_spin, r_s, m_s, g.l, g.q,
                            g.Rpc - P_s, jnp.ones_like(r_s))
        return r_s, m_s, g, k, ok

    def image(self, incl_deg, rmax, N, limbdk=1, mesh=None):
        """Disk image: flux, g-factor, emission angle, T, R, H, vr maps.

        The whole pixel pipeline (surface solve + shading) runs as ONE
        jitted program, cached per (incl, rmax, N, limbdk, mesh) so
        repeated frames pay dispatch only.  With `mesh` (a 1-D
        jax.sharding.Mesh) pixel rows are placed with a NamedSharding
        and XLA partitions the program across the devices -- the same
        data-parallel layout as `spectrum(mesh=...)`; rows are padded to
        a multiple of the device count and the pad is sliced off.

        (reference: DiskRaytrace.image, sim5diskraytrace.py:138-210 --
        a per-pixel Python loop)
        """
        incl = np.radians(max(1.0, incl_deg))
        dOmega = (2.0 * rmax / N) ** 2 / (
            (self.bh_mass * consts.grav_radius)
            / (self.bh_dist * consts.parsec * 1e3)) ** 2
        is_flat = bool(np.asarray(self.disk.h(jnp.asarray(1e5))) == 0.0)

        key = (float(incl_deg), float(rmax), int(N), int(limbdk),
               id(mesh) if mesh is not None else None)
        compute = self._image_cache.get(key)
        if compute is None:
            @jax.jit
            def compute(alpha, beta):
                r, m, g, k, ok = self.geodesic(incl, alpha, beta,
                                               flat=is_flat)
                R = r * jnp.sqrt(1.0 - m * m)
                F = self.disk.flux(R)
                T = self.disk.t_eff(R)
                V = self.disk.vr(R)
                ok = ok & (F > 0.0)

                tet = disk_tetrad(self.bh_spin, r, m, self.disk)
                gf = observed_gfactor(k, tet)
                mue = jnp.clip(emission_angle(k, tet), 1e-4, 1.0 - 1e-6)
                limb = jnp.where(limbdk > 0, 0.5 + 0.75 * mue, 1.0)
                ok = ok & (gf > 0.0)

                z = jnp.where(ok, 1.0, jnp.nan)
                return {
                    "flux": z * F * gf ** 4 * limb * dOmega,
                    "gfactor": z * gf,
                    "mue": z * jnp.degrees(jnp.arccos(mue)),
                    "T": z * T,
                    "R": z * R,
                    "H": z * r * m,
                    "V": z * V,
                }
            self._image_cache[key] = compute

        xs = ((jnp.arange(N) + 0.5) / N - 0.5) * 2.0 * rmax
        alpha, beta = jnp.meshgrid(xs, xs)  # beta rows, alpha cols
        pad = 0
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            ndev = int(np.prod([mesh.shape[n] for n in mesh.axis_names]))
            pad = (-N) % ndev
            if pad:
                alpha = jnp.concatenate(
                    [alpha, jnp.broadcast_to(alpha[-1:], (pad, N))])
                beta = jnp.concatenate(
                    [beta, jnp.broadcast_to(beta[-1:], (pad, N))])
            sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0], None))
            alpha = jax.device_put(alpha, sh)
            beta = jax.device_put(beta, sh)
        out = compute(alpha, beta)
        if pad:
            out = {k: v[:N] for k, v in out.items()}
        return out

    def _radial_grid(self, incl, radres, angres):
        """Polar observer-plane grid of the reference spectrum() driver
        (data-independent; precomputed host-side)."""
        radii = []
        drs = []
        rx = float(r_bh(self.bh_spin))
        while rx < self.r_max * 1.1:
            dr = radres * (1.0 + rx / 5.0)
            radii.append(rx)
            drs.append(dr)
            rx += dr
        nphi = int(np.floor(angres / np.sqrt(np.cos(incl))))
        return np.asarray(radii), np.asarray(drs), nphi

    def spectrum(self, incl_deg, energies, limbdk=1, flat=0,
                 radres=0.15, angres=90.0, hardening=0.0, batch=8192,
                 return_diagnostics=False, mesh=None):
        """Observed disk spectrum [erg/s/cm2/keV] on the detector energy
        grid, by solid-angle-weighted accumulation over a polar grid of the
        observer plane.

        With `return_diagnostics=True` also returns a dict with the
        solid-angle coverage error (`domega_err` = solid angle of pixels
        whose geodesic setup/surface solve failed, `domega_tot` = total) --
        the accumulator the reference driver keeps as dOmega_err
        (sim5diskraytrace.py:76,93) to diagnose unresolved grids.  A
        warning is logged whenever the fraction exceeds 1%.

        With `mesh` (a 1-D jax.sharding.Mesh), every polar-grid batch is
        placed with a NamedSharding along the mesh's first axis: XLA
        partitions the embarrassingly parallel ray pipeline across the
        devices and inserts psum for the per-batch spectrum reductions --
        the same data-parallel layout as the image path (parallel/mesh.py).
        Batches are zero-weight-padded to a multiple of the device count;
        the result is bitwise-independent of the device count up to
        floating-point reduction order (tested sharded == unsharded on the
        8-device virtual mesh).

        (reference: DiskRaytrace.spectrum, sim5diskraytrace.py:43-134 --
        which is a per-pixel Python loop with no parallelism at all)
        """
        incl = np.radians(max(1.0, incl_deg))
        energies = jnp.asarray(energies, jnp.float64)
        radii, drs, nphi = self._radial_grid(incl, radres, angres)
        dphi = 2.0 * np.pi / nphi
        phis = np.arange(nphi) * dphi

        rx = np.repeat(radii, nphi)
        drx = np.repeat(drs, nphi)
        phi = np.tile(phis, len(radii))
        alpha = -rx * np.cos(phi)
        beta = -rx * np.sin(phi) * np.cos(incl)
        dOmega = (np.cos(incl) * (rx + drx / 2.0) * drx * dphi
                  * ((self.bh_mass * consts.grav_radius)
                     / (self.bh_dist * consts.parsec * 1e3)) ** 2)

        is_flat = bool(flat) or bool(np.asarray(self.disk.h(jnp.asarray(1e5))) == 0.0)

        @jax.jit
        def shard(alpha, beta, dOmega):
            r, m, g, k, ok = self.geodesic(incl, alpha, beta, flat=is_flat)
            R = r * jnp.sqrt(1.0 - m * m)
            T = self.disk.t_eff(R)
            ok = ok & (T > 0.0)
            tet = disk_tetrad(self.bh_spin, r, m, self.disk)
            gf = observed_gfactor(k, tet)
            mue = jnp.where(limbdk > 0, emission_angle(k, tet), -1.0)
            ok = ok & (gf > 0.0)
            f = jnp.where(hardening > 0, hardening,
                          spectral_hardening(T, self.disk.mdot()))
            gf_s = jnp.where(ok, gf, 1.0)
            Iv_f = self.spectra.spectrum(T, mue, f, energies[None, :] / gf_s[:, None])
            Iv_0 = self.spectra.spectrum(T, mue, jnp.ones_like(f),
                                         energies[None, :] / gf_s[:, None])
            w = jnp.where(ok, gf_s ** 3 * dOmega, 0.0)
            return (jnp.sum(Iv_f * w[:, None], 0), jnp.sum(Iv_0 * w[:, None], 0),
                    jnp.sum(jnp.where(ok, 0.0, dOmega)), jnp.sum(dOmega))

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            ndev = int(np.prod([mesh.shape[n] for n in mesh.axis_names]))
            ray_sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))

        def place(al, be, dom):
            if mesh is None:
                return jnp.asarray(al), jnp.asarray(be), jnp.asarray(dom)
            pad = (-len(al)) % ndev
            if pad:
                al = np.concatenate([al, np.full(pad, al[-1])])
                be = np.concatenate([be, np.full(pad, be[-1])])
                dom = np.concatenate([dom, np.zeros(pad)])  # zero weight
            return (jax.device_put(jnp.asarray(al), ray_sh),
                    jax.device_put(jnp.asarray(be), ray_sh),
                    jax.device_put(jnp.asarray(dom), ray_sh))

        spec_f = np.zeros(len(energies))
        spec_0 = np.zeros(len(energies))
        dom_err = 0.0
        dom_tot = 0.0
        for i in range(0, len(rx), batch):
            sl = slice(i, i + batch)
            sf, s0, de, dt = shard(*place(alpha[sl], beta[sl], dOmega[sl]))
            spec_f += np.asarray(sf)
            spec_0 += np.asarray(s0)
            dom_err += float(de)
            dom_tot += float(dt)
        if dom_tot > 0.0 and dom_err / dom_tot > 0.01:
            from ..utils.log import get_logger, log_run
            log_run(get_logger(), "spectrum_coverage_warning",
                    domega_err=dom_err, domega_tot=dom_tot,
                    err_fraction=dom_err / dom_tot,
                    incl_deg=float(incl_deg), radres=float(radres),
                    angres=float(angres))
        if return_diagnostics:
            return spec_f, spec_0, {"domega_err": dom_err,
                                    "domega_tot": dom_tot}
        return spec_f, spec_0
