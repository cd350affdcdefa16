"""Golden tests for Walker-Penrose polarization transport."""

import numpy as np

from sim5_tpu import polarization as pol
from sim5_tpu.core import kerr_metric, dotprod


class TestWPConstant:
    def test_wp_constant_golden(self, golden_polarization):
        d = golden_polarization["wp"]
        # columns: a r m  k0..k3  f0..f3  wp1 wp2
        g = kerr_metric(d[:, 0], d[:, 1], d[:, 2])
        wp1, wp2 = pol.polarization_constant(d[:, 3:7], d[:, 7:11], g)
        np.testing.assert_allclose(np.asarray(wp1), d[:, 11], rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(wp2), d[:, 12], rtol=1e-10, atol=1e-12)

    def test_vector_reconstruction_golden(self, golden_polarization):
        d = golden_polarization["wp"]
        ref = golden_polarization["pvec"]
        g = kerr_metric(d[:, 0], d[:, 1], d[:, 2])
        f = pol.polarization_vector(d[:, 3:7], d[:, 11], d[:, 12], g)
        np.testing.assert_allclose(np.asarray(f), ref, rtol=1e-8, atol=1e-9)

    def test_reconstruction_properties(self, golden_polarization):
        d = golden_polarization["wp"]
        g = kerr_metric(d[:, 0], d[:, 1], d[:, 2])
        f = pol.polarization_vector(d[:, 3:7], d[:, 11], d[:, 12], g)
        # f.f = 1, f.k = 0, f[0] = 0
        np.testing.assert_allclose(np.asarray(dotprod(f, f, g)), 1.0, rtol=1e-10)
        assert np.max(np.abs(np.asarray(dotprod(f, d[:, 3:7], g)))) < 1e-9
        assert np.max(np.abs(np.asarray(f[..., 0]))) == 0.0

    def test_angle_rotation_golden(self, golden_polarization):
        d = golden_polarization["prot"]
        # columns: a inc alpha beta wp1 wp2 chi
        wp1, wp2 = pol.polarization_constant_infinity(d[:, 0], d[:, 2],
                                                     d[:, 3], d[:, 1])
        np.testing.assert_allclose(np.asarray(wp1), d[:, 4], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(wp2), d[:, 5], rtol=1e-12)
        chi = pol.polarization_angle_rotation(d[:, 0], d[:, 1], d[:, 2],
                                              d[:, 3], wp1, wp2)
        np.testing.assert_allclose(np.asarray(chi), d[:, 6], rtol=1e-10, atol=1e-12)
