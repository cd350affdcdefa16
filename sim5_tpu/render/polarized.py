"""Polarized disk images: Stokes I/Q/U maps via Walker-Penrose transport.

BASELINE config #3.  For each pixel the polarization plane at the disk is
transported analytically to infinity through the conserved Walker-Penrose
constant; the local polarization degree is a pluggable function of the
emission angle (default: Chandrasekhar (1960) electron-scattering
atmosphere fit), since the reference provides the transport machinery
(sim5polarization.c) but no intrinsic emission model.
"""

import jax.numpy as jnp

from ..core import kerr_metric, photon_momentum
from ..disk import NTDisk, nt_flux
from ..geodesic import (geodesic_init_inf, geodesic_find_midplane_crossing,
                        geodesic_position_rad)
from ..polarization import polarization_constant, polarization_angle_rotation
from ..render.driver import disk_tetrad, observed_gfactor, emission_angle
from ..render.image import image_grid
from ..disk.base import ThinDisk


def chandrasekhar_poldeg(mu):
    """Polarization degree of a semi-infinite electron-scattering
    atmosphere vs emission cosine (Chandrasekhar 1960 table XXIV fit)."""
    return 0.1171 * (1.0 - mu) / (1.0 + 3.582 * mu)


def render_polarized_image(disk: NTDisk, incl, npix_x=256, npix_y=256,
                           rmax=None, poldeg_fn=chandrasekhar_poldeg):
    """Render Stokes (I, Q, U) maps of an equatorial NT disk.

    The local polarization vector lies in the disk plane perpendicular to
    the photon's projected momentum (electron-scattering polarization);
    its angle at the observer is chi0 + chi_rot where chi_rot is the
    WP-transport rotation (sim5polarization.c:271-285).
    """
    a = disk.a
    rms = disk.rms - 1e-3
    if rmax is None:
        rmax = rms + 12.0
    alpha, beta = image_grid(npix_x, npix_y, rmax)

    g = geodesic_init_inf(incl, a, alpha, beta)
    P = geodesic_find_midplane_crossing(g, 0)
    r = geodesic_position_rad(g, P)
    hit = jnp.isfinite(r) & (r >= rms) & (g.status == 0)
    r_s = jnp.where(hit, r, rms + 1.0)
    m_s = jnp.zeros_like(r_s)
    P_s = jnp.where(hit, P, 1.0)

    # outward photon momentum at the disk (reference driver convention)
    k = photon_momentum(a, r_s, m_s, g.l, g.q, g.Rpc - P_s,
                        jnp.ones_like(r_s))
    thin = ThinDisk(disk)
    tet = disk_tetrad(a, r_s, m_s, thin)
    gf = observed_gfactor(k, tet)
    mue = jnp.clip(emission_angle(k, tet), 1e-4, 1.0)

    # intensity: local flux boosted, limb-darkened
    F = nt_flux(disk, r_s)
    I = jnp.where(hit, F * gf ** 4 * (0.5 + 0.75 * mue), 0.0)

    # local polarization vector: in the local orthonormal frame, electron-
    # scattering polarization is perpendicular to the meridian plane of the
    # emitted ray -> take f along the local azimuthal direction (e3)
    metric = kerr_metric(a, r_s, m_s)
    f_loc = tet.e[..., 3, :]
    wp1, wp2 = polarization_constant(k, f_loc, metric)
    chi = polarization_angle_rotation(a, g.incl, alpha, beta, wp1, wp2)

    pd = poldeg_fn(mue)
    Q = jnp.where(hit, I * pd * jnp.cos(2.0 * chi), 0.0)
    U = jnp.where(hit, I * pd * jnp.sin(2.0 * chi), 0.0)
    return I, Q, U


def polarized_spectrum(disk: NTDisk, incl, energies, npix=256, rmax=None,
                       poldeg_fn=chandrasekhar_poldeg,
                       bh_mass=10.0, bh_dist=10.0, hardening=1.7):
    """Energy-resolved Stokes spectra (I_E, Q_E, U_E) [erg/s/cm2/keV] of an
    equatorial NT disk -- the product completion of BASELINE configs #3+#5
    (the reference has neither an intrinsic polarization model nor any
    polarized spectral product; it only ships the WP transport machinery,
    sim5polarization.c).

    Per image-plane pixel: blackbody specific intensity at the local
    effective temperature, redshifted (I_E ~ Iv(E/g) g^3), polarized by
    poldeg_fn(mu_e) along the transported polarization plane (WP rotation
    chi), and accumulated over pixel solid angle.  Returns (I_E, Q_E, U_E)
    on the detector `energies` grid [keV]; degree = sqrt(Q^2+U^2)/I and
    angle = atan2(U, Q)/2 follow.

    Validated limits (tests/test_polarized_spectrum.py): face-on -> degree
    ~ poldeg_fn(1) = 0; a=0 symmetry -> U/I small; degree bounded by the
    Chandrasekhar maximum at the disk inclination.
    """
    from ..radiation import blackbody_Iv
    from .. import consts

    a = disk.a
    rms = disk.rms - 1e-3
    if rmax is None:
        rmax = rms + 18.0
    alpha, beta = image_grid(npix, npix, rmax)

    g = geodesic_init_inf(incl, a, alpha, beta)
    P = geodesic_find_midplane_crossing(g, 0)
    r = geodesic_position_rad(g, P)
    hit = jnp.isfinite(r) & (r >= rms) & (g.status == 0)
    r_s = jnp.where(hit, r, rms + 1.0)
    m_s = jnp.zeros_like(r_s)
    P_s = jnp.where(hit, P, 1.0)

    k = photon_momentum(a, r_s, m_s, g.l, g.q, g.Rpc - P_s,
                        jnp.ones_like(r_s))
    thin = ThinDisk(disk)
    tet = disk_tetrad(a, r_s, m_s, thin)
    gf = observed_gfactor(k, tet)
    mue = jnp.clip(emission_angle(k, tet), 1e-4, 1.0)
    T = thin.t_eff(r_s)
    hit = hit & (T > 100.0) & jnp.isfinite(gf) & (gf > 0.0)
    gf = jnp.where(hit, gf, 1.0)

    metric = kerr_metric(a, r_s, m_s)
    f_loc = tet.e[..., 3, :]
    wp1, wp2 = polarization_constant(k, f_loc, metric)
    chi = polarization_angle_rotation(a, g.incl, alpha, beta, wp1, wp2)
    chi = jnp.where(hit & jnp.isfinite(chi), chi, 0.0)
    # zero-weight lanes can still carry NaN (0 * NaN = NaN in the energy
    # sums), so the polarized weights are masked explicitly
    pd = poldeg_fn(mue)
    pd = jnp.where(hit & jnp.isfinite(pd), pd, 0.0)

    energies = jnp.asarray(energies, jnp.float64)
    # pixel solid angle: (2 rmax/npix)^2 rg^2 at distance D
    dOmega = ((2.0 * rmax / npix) ** 2
              * ((bh_mass * consts.grav_radius)
                 / (bh_dist * consts.parsec * 1e3)) ** 2)
    Iv = blackbody_Iv(T[..., None], jnp.full_like(T, hardening)[..., None],
                      mue[..., None], energies / gf[..., None])
    w = jnp.where(hit, gf ** 3, 0.0)[..., None] * dOmega
    I_E = jnp.sum(Iv * w, axis=(0, 1))
    Q_E = jnp.sum(Iv * w * (pd * jnp.cos(2.0 * chi))[..., None], axis=(0, 1))
    U_E = jnp.sum(Iv * w * (pd * jnp.sin(2.0 * chi))[..., None], axis=(0, 1))
    return I_E, Q_E, U_E
