"""Black-hole shadow / horizon-scale imaging.

Renders the FULL equatorial plane down to the horizon: Keplerian disk
outside the ISCO, the Cunningham (1975) plunging flow inside it (conserved
ISCO energy/angular momentum, radial infall from normalization), and the
captured-ray silhouette (the shadow).

This is a beyond-reference product: the reference's driver can only image
r >= r_isco because its analytic engine returns NaN positions for the
plunging trajectory types (RC past periastron never occurs; RR_BH/CC are
unimplemented, sim5kerr-geod.c:322-352).  sim5_tpu's geodesic inversions
cover all types, so pixels whose rays terminate in the hole still yield
the radius/redshift of every midplane crossing above the horizon.

Everything is batched, jittable and differentiable like the rest of the
render layer.
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..core import (kerr_metric_contravariant, photon_momentum, r_bh, r_ms,
                    gfactorK, keplerian_EL)
from ..disk import nt_flux
from ..geodesic import (geodesic_init_inf, geodesic_find_midplane_crossing,
                        geodesic_position_rad, geodesic_is_captured)
from .image import image_grid


class BHImage(NamedTuple):
    captured: jnp.ndarray   # bool: ray falls into the hole (silhouette)
    hit: jnp.ndarray        # bool: midplane emission above the horizon
    r: jnp.ndarray          # emission radius (NaN where no hit)
    g: jnp.ndarray          # redshift factor (0 where no hit)
    flux: jnp.ndarray       # observed flux F*g^4 (0 where no hit)


def gfactor_plunge(r, a, k):
    """Redshift factor for emission from the plunging flow inside the
    ISCO: gas on the Cunningham (1975) trajectory that left the circular
    ISCO orbit conserving its E and L, with u_r < 0 from normalization.

    `k` is the contravariant photon 4-momentum (E_photon = -k_t = 1), so
    g = 1 / (-k . u) = 1 / (E k^t - u_r k^r - L k^phi); u_theta = 0 makes
    the k[2] sign convention irrelevant here.
    """
    E, L = keplerian_EL(r_ms(a), a)
    mc = kerr_metric_contravariant(a, r, jnp.zeros_like(r))
    u_r2 = (-1.0 - (mc.g00 * E * E - 2.0 * mc.g03 * E * L
                    + mc.g33 * L * L)) / mc.g11
    u_r = -jnp.sqrt(jnp.maximum(u_r2, 0.0))
    return 1.0 / (E * k[..., 0] - u_r * k[..., 1] - L * k[..., 3])


def render_bh_image(a, incl, npix_x=512, npix_y=512, rmax=12.0, disk=None,
                    inner_emissivity=None):
    """Image the equatorial plane to the horizon plus the shadow mask.

    disk: optional NTDisk for the flux outside the ISCO (flux is zero
    there otherwise).  inner_emissivity: optional callable F(r) for the
    plunging region (e.g. a power law) -- physically the plunging gas is
    usually taken as non-radiating, so the default inside flux is zero,
    but the redshift map `g` is always filled (Doppler/gravitational
    shift of scattered or line emission).

    Returns a BHImage of (npix_y, npix_x) maps.
    """
    alpha, beta = image_grid(npix_x, npix_y, rmax)
    g = geodesic_init_inf(incl, a, alpha, beta)
    captured = geodesic_is_captured(g)

    rh = r_bh(g.a)
    rms = r_ms(g.a)
    P0 = geodesic_find_midplane_crossing(g, 0)
    r0 = geodesic_position_rad(g, P0)
    hit = jnp.isfinite(r0) & (r0 > 1.01 * rh) & (g.status == 0)
    r_safe = jnp.where(hit, r0, rms + 1.0)

    # the photon that reaches the observer leaves the crossing point moving
    # OUTWARD (dr > 0) -- geodesic_momentum's along-increasing-P orientation
    # would flip k^r on pre-periastron crossings, which matters here
    # because the plunging emitter has u_r != 0 (Keplerian emitters don't,
    # which is why the disk drivers are insensitive to this sign)
    kph = photon_momentum(g.a, r_safe, jnp.zeros_like(r_safe), g.l, g.q,
                          jnp.ones_like(r_safe), jnp.ones_like(r_safe))
    kph = jnp.where(jnp.isfinite(kph), kph, 0.0)
    inside = hit & (r0 < rms)
    gf_kep = gfactorK(jnp.maximum(r_safe, rms), g.a, g.l)
    gf_plg = gfactor_plunge(jnp.where(inside, r_safe, rms - 1e-3), g.a, kph)
    gf = jnp.where(inside, gf_plg, gf_kep)
    gf = jnp.where(hit, gf, 0.0)

    flux = jnp.zeros_like(gf)
    if disk is not None:
        flux = jnp.where(hit & ~inside, nt_flux(disk, r_safe), 0.0)
    if inner_emissivity is not None:
        flux = jnp.where(inside, inner_emissivity(r_safe), flux)
    flux = flux * gf ** 4

    return BHImage(captured=captured, hit=hit,
                   r=jnp.where(hit, r0, jnp.nan), g=gf, flux=flux)
