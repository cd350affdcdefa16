"""Golden tests: NT disk model and end-to-end disk images (BASELINE #1/#2),
plus gradient validation of the differentiable render path."""

import numpy as np
import pytest

from sim5_tpu.disk import (nt_setup, nt_flux, nt_lumi, nt_sigma, nt_ell,
                           DISK_NT_OPTION_LUMINOSITY, ThinDisk)
from sim5_tpu.render import render_disk_image
from tests.conftest import GOLDEN


class TestNTDisk:
    def test_setup_and_lumi(self, golden_disknt):
        for a, rmin_ref, lumi_ref in golden_disknt["setup"]:
            disk = nt_setup(10.0, a, 0.1, 0.1)
            assert np.isclose(float(disk.rms), rmin_ref, rtol=1e-5)
            assert np.isclose(float(nt_lumi(disk)), lumi_ref, rtol=1e-5)

    def test_profiles(self, golden_disknt):
        p = golden_disknt["prof"]
        for a in np.unique(p[:, 0]):
            rows = p[p[:, 0] == a]
            dk = nt_setup(10.0, a, 0.1, 0.1)
            np.testing.assert_allclose(np.asarray(nt_flux(dk, rows[:, 1])),
                                       rows[:, 2], rtol=1e-10)
            np.testing.assert_allclose(np.asarray(nt_sigma(dk, rows[:, 1])),
                                       rows[:, 3], rtol=1e-6)
            np.testing.assert_allclose(np.asarray(nt_ell(dk, rows[:, 1])),
                                       rows[:, 4], rtol=1e-7)

    def test_luminosity_mode(self, golden_disknt):
        ref = golden_disknt["lmode"][0]
        dk = nt_setup(10.0, ref[0], 0.1, 0.1, DISK_NT_OPTION_LUMINOSITY)
        # rtbis tolerance in the reference is 1e-6 absolute on mdot
        assert abs(float(dk.mdot) - ref[1]) < 2e-6

    def test_thin_disk_model_protocol(self):
        dm = ThinDisk.create(10.0, 0.5, 0.1)
        r = np.asarray([5.0, 10.0, 30.0])
        assert np.all(np.asarray(dm.flux(r)) >= 0)
        assert np.all(np.asarray(dm.t_eff(r)) >= 0)
        assert np.all(np.asarray(dm.h(r)) == 0)
        assert float(dm.r_min()) > 4.0


class TestDiskImage:
    @pytest.mark.parametrize("fname,a,inc", [
        ("image128_a0.txt", 0.0, 60.0),
        ("image128_a998.txt", 0.998, 80.0),
    ])
    def test_image_matches_reference(self, fname, a, inc):
        d = np.loadtxt(GOLDEN / fname)
        ref_f = d[:, 2].reshape(128, 128)
        ref_g = d[:, 3].reshape(128, 128)
        disk = nt_setup(10.0, a, 0.1, 0.1)
        imf, img = render_disk_image(disk, np.radians(inc), 128, 128)
        imf, img = np.asarray(imf), np.asarray(img)
        # BASELINE gate: pixel values match <= 1e-6 (relative to peak)
        assert np.max(np.abs(imf - ref_f)) / ref_f.max() < 1e-6
        # identical hit footprint
        assert ((imf > 0) == (ref_f > 0)).all()
        both = (img > 0) & (ref_g > 0)
        assert np.max(np.abs(img - ref_g)[both] / ref_g[both]) < 1e-5

    def test_gradients_vs_finite_differences(self):
        import jax
        import jax.numpy as jnp

        def total_flux(a, incl):
            disk = nt_setup(10.0, a, 0.1, 0.1, f32_state=False)
            imf, _ = render_disk_image(disk, incl, 32, 32)
            return jnp.sum(imf) / 1e26   # scale to O(1)

        a0, i0 = 0.41, 1.05   # interior point (no type-boundary crossing)
        ga, gi = jax.grad(total_flux, argnums=(0, 1))(a0, i0)
        eps = 1e-6
        fda = (total_flux(a0 + eps, i0) - total_flux(a0 - eps, i0)) / (2 * eps)
        fdi = (total_flux(a0, i0 + eps) - total_flux(a0, i0 - eps)) / (2 * eps)
        assert np.isfinite(float(ga)) and np.isfinite(float(gi))
        assert np.isclose(float(ga), float(fda), rtol=1e-4), (float(ga), float(fda))
        assert np.isclose(float(gi), float(fdi), rtol=1e-4), (float(gi), float(fdi))
