"""Relativistic line profiles and Cunningham transfer functions.

Derived products of the equatorial crossing maps: the observed profile of
an intrinsically narrow emission line (e.g. Fe K-alpha) from a Keplerian
disk, and the g-binned transfer function T(g; r) used by spectral-fitting
pipelines (the "multi-energy transfer-function grid" of BASELINE config #5).

Everything is a pure reduction over the per-pixel (r, g) maps, so profiles
are differentiable in (a, incl) and batch over parameter grids.
"""

import jax
import jax.numpy as jnp

from ..core import gfactorK, r_ms
from ..geodesic import (geodesic_init_inf, geodesic_find_midplane_crossing,
                        geodesic_position_rad)
from .image import image_grid


def disk_g_map(a, incl, npix=256, rmax=None, r_in=None, r_out=None,
               order=0):
    """Per-pixel (r, g, hit) maps of an equatorial Keplerian disk annulus."""
    rms = r_ms(jnp.asarray(a))
    if r_in is None:
        r_in = rms
    if r_out is None:
        r_out = 400.0
    if rmax is None:
        rmax = min(float(r_out) * 1.1, 60.0)
    alpha, beta = image_grid(npix, npix, rmax)
    g = geodesic_init_inf(incl, a, alpha, beta)
    P = geodesic_find_midplane_crossing(g, order)
    r = geodesic_position_rad(g, P)
    hit = jnp.isfinite(r) & (g.status == 0) & (r >= r_in) & (r <= r_out)
    r_s = jnp.where(hit, r, 10.0)
    gf = gfactorK(r_s, a, g.l)
    hit = hit & jnp.isfinite(gf) & (gf > 0.0)
    return r_s, jnp.where(hit, gf, 1.0), hit, (2.0 * rmax / npix) ** 2


def line_profile(a, incl, emissivity_index=3.0, npix=256, r_in=None,
                 r_out=None, g_bins=200, g_range=(0.2, 1.4), orders=2):
    """Observed profile of a narrow line from a Keplerian disk with
    emissivity ~ r^-q: photon flux per unit g, binned over the image.

    Returns (g_centers, profile).  Includes Doppler boosting/gravitational
    redshift (g^3 photon-flux boost) and lensing via image orders.
    """
    g_lo, g_hi = g_range
    edges = jnp.linspace(g_lo, g_hi, g_bins + 1)
    centers = 0.5 * (edges[1:] + edges[:-1])
    prof = jnp.zeros(g_bins)
    for order in range(orders):
        r, gf, hit, dA = disk_g_map(a, incl, npix, None, r_in, r_out, order)
        w = jnp.where(hit, r ** (-emissivity_index) * gf ** 3 * dA, 0.0)
        idx = jnp.clip(((gf - g_lo) / (g_hi - g_lo) * g_bins).astype(jnp.int32),
                       0, g_bins - 1)
        prof = prof + jax.ops.segment_sum(w.reshape(-1), idx.reshape(-1),
                                          num_segments=g_bins)
    dg = (g_hi - g_lo) / g_bins
    return centers, prof / dg


def transfer_function(a, incl, r_edges, g_bins=64, g_range=(0.2, 1.4),
                      npix=384):
    """Cunningham-style transfer table T[r_bin, g_bin]: solid-angle weight
    reaching the observer per (emission radius, redshift) cell.

    Line profiles / reverberation kernels for ANY radial emissivity follow
    by weighting this table -- the reusable grid product of config #5.
    """
    r_edges = jnp.asarray(r_edges, jnp.float64)
    nr = r_edges.shape[0] - 1
    g_lo, g_hi = g_range
    r, gf, hit, dA = disk_g_map(a, incl, npix,
                                None, float(r_edges[0]), float(r_edges[-1]))
    r_idx = jnp.clip(jnp.searchsorted(r_edges, r) - 1, 0, nr - 1)
    g_idx = jnp.clip(((gf - g_lo) / (g_hi - g_lo) * g_bins).astype(jnp.int32),
                     0, g_bins - 1)
    flat = r_idx * g_bins + g_idx
    w = jnp.where(hit, dA, 0.0)
    T = jax.ops.segment_sum(w.reshape(-1), flat.reshape(-1),
                            num_segments=nr * g_bins)
    return T.reshape(nr, g_bins)
