"""Black-hole shadow / horizon-scale imaging (render/shadow.py).

Beyond-reference product (the reference cannot image inside the ISCO);
oracles: Bardeen's exact shadow geometry, GR continuity conditions, and
the Keplerian limit of the plunging flow at the ISCO.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sim5_tpu.core import r_bh, r_ms, gfactorK, keplerian_EL
from sim5_tpu.disk import nt_setup
from sim5_tpu.geodesic import (geodesic_init_inf,
                               geodesic_find_midplane_crossing,
                               geodesic_position_rad, geodesic_momentum)
from sim5_tpu.render import render_bh_image
from sim5_tpu.render.shadow import gfactor_plunge


class TestKeplerianEL:
    def test_isco_marginal_stability(self):
        """At the ISCO, E and L are minima of the circular-orbit family
        (marginal stability): dE/dr = dL/dr = 0."""
        import jax
        for a in (0.0, 0.5, 0.9, 0.998):
            rms = float(r_ms(a))
            dE = jax.grad(lambda r: keplerian_EL(r, a)[0])(rms)
            dL = jax.grad(lambda r: keplerian_EL(r, a)[1])(rms)
            assert abs(float(dE)) < 1e-6 and abs(float(dL)) < 1e-5

    def test_ratio_is_ellK(self):
        from sim5_tpu.core import ellK
        r = np.array([3.0, 6.0, 20.0])
        E, L = keplerian_EL(r, 0.7)
        np.testing.assert_allclose(np.asarray(L / E),
                                   np.asarray(ellK(r, 0.7)), rtol=1e-12)

    def test_schwarzschild_isco_energy(self):
        E, _ = keplerian_EL(6.0, 1e-8)
        assert abs(float(E) - np.sqrt(8.0 / 9.0)) < 1e-9


class TestPlungeGfactor:
    def test_continuous_at_isco(self):
        """The plunging flow starts from the circular ISCO orbit, so its
        redshift must match the Keplerian one there (same photons)."""
        a, inc = 0.9, np.radians(60.0)
        al = jnp.linspace(-8.0, 8.0, 41)
        be = jnp.linspace(0.3, 6.0, 21)
        A, B = jnp.meshgrid(al, be)
        g = geodesic_init_inf(inc, a, A, B)
        P0 = geodesic_find_midplane_crossing(g, 0)
        r0 = np.asarray(geodesic_position_rad(g, P0))
        rms = float(r_ms(a))
        near = np.isfinite(r0) & (np.abs(r0 - rms) < 0.15 * rms) \
            & (np.asarray(g.status) == 0)
        assert near.sum() > 5
        # evaluate both flows at exactly the ISCO radius with each
        # pixel's outward-oriented photon momentum (some rays turn above
        # rms: R(rms) < 0 gives NaN momentum there -- excluded)
        from sim5_tpu.core import photon_momentum
        k_at = photon_momentum(g.a, jnp.full_like(A, rms),
                               jnp.zeros_like(A), g.l, g.q,
                               jnp.ones_like(A), jnp.ones_like(A))
        gp = np.asarray(gfactor_plunge(jnp.full_like(A, rms), g.a, k_at))
        gk = np.asarray(gfactorK(jnp.full_like(A, rms), g.a, g.l))
        near = near & np.isfinite(gp) & np.isfinite(gk)
        assert near.sum() > 5
        rel = np.abs(gp - gk)[near] / np.abs(gk)[near]
        assert rel.max() < 1e-6

    def test_infinite_redshift_at_horizon(self):
        """g -> 0 as the emission radius approaches the horizon."""
        im = render_bh_image(0.9, np.radians(70.0), 128, 128, rmax=10.0)
        r = np.asarray(im.r)
        gmap = np.asarray(im.g)
        inside = np.asarray(im.hit) & (r < float(r_ms(0.9)))
        assert inside.sum() > 100
        assert np.isfinite(gmap[inside]).all() and (gmap[inside] > 0).all()
        deep = inside & (r < 1.05 * float(r_bh(0.9)))
        assert deep.sum() > 0 and gmap[deep].max() < 0.35


class TestBHImage:
    def test_shadow_area_schwarzschild(self):
        """a -> 0: captured solid angle = pi*27 in image-plane units."""
        rmax = 10.0
        im = render_bh_image(1e-3, np.radians(60.0), 256, 256, rmax=rmax)
        area = np.asarray(im.captured).mean() * (2 * rmax) ** 2
        assert abs(area - np.pi * 27.0) / (np.pi * 27.0) < 0.02

    def test_masks_and_flux(self):
        a, inc = 0.998, np.radians(80.0)
        disk = nt_setup(10.0, a, 0.1, 0.1)
        im = render_bh_image(a, inc, 128, 128, rmax=8.0, disk=disk,
                             inner_emissivity=lambda r: 1e22 * r ** -3)
        cap = np.asarray(im.captured)
        hit = np.asarray(im.hit)
        r = np.asarray(im.r)
        flux = np.asarray(im.flux)
        # captured rays that cross the midplane above the horizon first
        # still emit (plunging matter in front of the shadow)
        assert (cap & hit).sum() > 0
        assert np.isfinite(flux).all() and (flux >= 0).all()
        assert flux[hit & (r < float(r_ms(a)))].max() > 0  # inner glow
        # flux only where something was hit
        assert (flux[~hit] == 0).all()
