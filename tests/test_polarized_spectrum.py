"""Stokes-resolved disk spectra (render.polarized_spectrum) -- physics
limits vs the Chandrasekhar electron-scattering atmosphere, plus the
table-layer export.  The reference has no polarized spectral product at all
(it ships only the WP transport of sim5polarization.c), so the oracles are
the analytic limits of the intrinsic model."""

import numpy as np
import jax.numpy as jnp

from sim5_tpu.disk import nt_setup
from sim5_tpu.render import polarized_spectrum, chandrasekhar_poldeg


E = np.geomspace(0.3, 8.0, 12)


def _degree(I, Q, U):
    ok = I > 1e-12 * I.max()
    return np.where(ok, np.hypot(Q, U) / np.where(ok, I, 1.0), 0.0)


class TestPolarizedSpectrum:
    def test_faceon_degree_vanishes(self):
        """mu_e -> 1 face-on: Chandrasekhar degree -> 0."""
        disk = nt_setup(10.0, 0.5, 0.1, 0.1)
        I, Q, U = polarized_spectrum(disk, np.radians(3.0), jnp.asarray(E),
                                     npix=96)
        I, Q, U = map(np.asarray, (I, Q, U))
        assert I.max() > 0 and np.isfinite(I).all()
        assert _degree(I, Q, U).max() < 5e-3

    def test_inclined_degree_bounded_and_nonzero(self):
        """At incl=75 deg the integrated degree must be nonzero but below
        the Chandrasekhar maximum at that emission cosine (relativistic
        aberration and chi dispersion only depolarize the integral)."""
        disk = nt_setup(10.0, 0.5, 0.1, 0.1)
        inc = np.radians(75.0)
        I, Q, U = polarized_spectrum(disk, inc, jnp.asarray(E), npix=96)
        I, Q, U = map(np.asarray, (I, Q, U))
        deg = _degree(I, Q, U)
        sel = I > 1e-6 * I.max()
        assert deg[sel].max() > 5e-3            # genuinely polarized
        assert deg[sel].max() < float(chandrasekhar_poldeg(np.cos(inc)))

    def test_degree_grows_with_inclination(self):
        """Electron-scattering disk polarization grows toward edge-on
        (Chandrasekhar pd(mu) increasing as mu -> 0); the relativistic
        integral preserves that ordering."""
        disk = nt_setup(10.0, 0.5, 0.1, 0.1)

        def deg(inc_deg):
            I, Q, U = polarized_spectrum(disk, np.radians(inc_deg),
                                         jnp.asarray(E), npix=96)
            I, Q, U = map(np.asarray, (I, Q, U))
            sel = I > 1e-3 * I.max()
            return np.median(_degree(I, Q, U)[sel])

        d30, d75 = deg(30.0), deg(75.0)
        assert d75 > 2.0 * d30 > 0.0, (d30, d75)

    def test_table_export_and_resume(self, tmp_path):
        from sim5_tpu.tables import generate_polarized_table
        from sim5_tpu.tables.spectable import SpectralTable
        path = str(tmp_path / "pol.npz")
        Es = np.geomspace(0.5, 5.0, 6)
        t = generate_polarized_table(path, spins=[0.0, 0.9], incls=[60.0],
                                     energies=Es, npix=48)
        assert t.spectra.shape == (2, 18)
        assert np.isfinite(t.spectra).all()
        # resume: reopening finds every row done
        t2 = SpectralTable.open(path)
        remaining = list(t2.generator())
        assert remaining == []
