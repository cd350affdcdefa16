"""Differentiable disk-spectrum objective for parameter fitting.

`DiskRaytrace.spectrum` mirrors the reference driver (host-side batching,
model objects).  For FITTING -- gradients of a spectrum w.r.t.
(M, a, mdot, incl) -- this module provides a pure, jittable functional
core over a FIXED observer-plane quadrature grid: the grid is built once
from static arguments (a quadrature choice, not a differentiable quantity),
and the physics evaluates fully on-device.

Typical use:

    grid = make_polar_grid(a_ref=0.9, incl_ref=1.2, radres=0.3, angres=45)
    spec = disk_spectrum(grid, energies, M=10.0, a=0.9, mdot=0.1, incl=1.2)
    dspec_da = jax.jacfwd(lambda a: disk_spectrum(grid, E, 10.0, a, 0.1, 1.2))

The grid covers the union of footprints for nearby parameters, so
gradients are exact for the quadrature defined by the grid.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import consts
from ..core import r_bh
from ..disk import nt_setup
from ..geodesic import (geodesic_init_inf, geodesic_find_midplane_crossing,
                        geodesic_position_rad)
from ..core import photon_momentum_checked
from .driver import (disk_tetrad, observed_gfactor, emission_angle,
                     spectral_hardening)
from ..disk.base import ThinDisk
from ..radiation import blackbody_Iv


class PolarGrid(NamedTuple):
    alpha: jnp.ndarray
    beta: jnp.ndarray
    dOmega_unit: jnp.ndarray   # per-sample solid angle for unit (M/D)^2


def make_polar_grid(a_ref, incl_ref, radres=0.3, angres=45.0, r_max=1e6):
    """Build the reference driver's polar observer-plane quadrature grid
    (sim5diskraytrace.py:79-90) from STATIC reference parameters."""
    radii, drs = [], []
    rx = float(r_bh(jnp.asarray(a_ref)))
    while rx < r_max * 1.1:
        dr = radres * (1.0 + rx / 5.0)
        radii.append(rx)
        drs.append(dr)
        rx += dr
    radii = np.asarray(radii)
    drs = np.asarray(drs)
    nphi = int(np.floor(angres / np.sqrt(np.cos(incl_ref))))
    dphi = 2.0 * np.pi / nphi
    phis = np.arange(nphi) * dphi
    rxx = np.repeat(radii, nphi)
    drx = np.repeat(drs, nphi)
    phi = np.tile(phis, len(radii))
    alpha = -rxx * np.cos(phi)
    beta = -rxx * np.sin(phi) * np.cos(incl_ref)
    dOmega = np.cos(incl_ref) * (rxx + drx / 2.0) * drx * dphi
    return PolarGrid(jnp.asarray(alpha), jnp.asarray(beta),
                     jnp.asarray(dOmega))


def disk_spectrum(grid: PolarGrid, energies, M, a, mdot, incl,
                  bh_dist_kpc=10.0, alpha_visc=0.1, limbdk=True,
                  hardening=0.0):
    """Observed NT-disk spectrum [erg/s/cm2/keV] -- pure and differentiable
    in (M, a, mdot, incl)."""
    energies = jnp.asarray(energies, jnp.float64)
    disk = nt_setup(M, a, mdot, alpha_visc, f32_state=False)
    thin = ThinDisk(disk)

    g = geodesic_init_inf(incl, disk.a, grid.alpha, grid.beta)
    P = geodesic_find_midplane_crossing(g, 0)
    r = geodesic_position_rad(g, P)
    # build the FULL validity mask before sanitizing r: crossings inside
    # the ISCO (or below the horizon) must never reach the tetrad/momentum
    # math, whose intermediates are NaN there and would poison gradients
    ok = jnp.isfinite(r) & (g.status == 0) & (r > disk.rms)
    r_s = jnp.where(ok, r, disk.rms + 1.0)
    m_s = jnp.zeros_like(r_s)
    # the tiny floor keeps d(x^0.25)/dx finite where flux is masked to zero
    # (0**0.25 has an infinite derivative that would NaN-poison grads)
    T = jnp.where(r_s > disk.rms,
                  (jnp.maximum(thin.flux(r_s), 1e-30) / consts.sb_sigma) ** 0.25,
                  0.0)
    ok = ok & (T > 1e2)

    k, k_valid = photon_momentum_checked(
        disk.a, r_s, m_s, g.l, g.q,
        g.Rpc - jnp.where(ok, P, 1.0), jnp.ones_like(r_s))
    ok = ok & k_valid
    tet = disk_tetrad(disk.a, r_s, m_s, thin)
    # exclude lanes whose surface tetrad is unphysical (e.g. Keplerian
    # Omega inside the ergosphere); vector_norm_to keeps such lanes finite
    # so they cannot NaN-poison gradients of valid lanes
    from ..core import tetrad_valid
    ok = ok & tetrad_valid(tet)
    gf = observed_gfactor(k, tet)
    mue = jnp.where(limbdk, emission_angle(k, tet), -1.0)
    ok = ok & (gf > 0.0) & jnp.isfinite(gf)
    gf_s = jnp.where(ok, gf, 1.0)

    # evaluate the Planck factor only with safe temperatures: cold masked
    # pixels would overflow expm1 and NaN-poison reverse-mode gradients
    T_eval = jnp.where(ok, T, 1e6)
    f = jnp.where(hardening > 0, hardening,
                  spectral_hardening(T_eval, disk.mdot))
    Iv = blackbody_Iv(T_eval[:, None], f[:, None], mue[:, None],
                      energies[None, :] / gf_s[:, None])
    Iv = jnp.where(ok[:, None], Iv, 0.0)

    scale = ((M * consts.grav_radius)
             / (bh_dist_kpc * consts.parsec * 1e3)) ** 2
    w = jnp.where(ok, gf_s ** 3 * grid.dOmega_unit * scale, 0.0)
    return jnp.sum(Iv * w[:, None], axis=0)
