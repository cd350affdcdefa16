"""Tests of the high-level disk raytracing driver (images & spectra)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sim5_tpu.disk import ThinDisk
from sim5_tpu.render import (DiskRaytrace, DiskSpectrum_BlackBody,
                             disk_tetrad, observed_gfactor, emission_angle,
                             spectral_hardening)
from sim5_tpu.core import gfactorK, photon_momentum, r_ms
from sim5_tpu import geodesic as gd


@pytest.fixture(scope="module")
def rt():
    disk = ThinDisk.create(10.0, 0.7, 0.1)
    return DiskRaytrace(10.0, 0.7, 10.0, disk, DiskSpectrum_BlackBody())


class TestLocalFrame:
    def test_gfactor_matches_keplerian(self, rt):
        """For a razor-thin Keplerian disk the tetrad-based g-factor must
        reproduce the closed-form gfactorK (reference cross-check:
        __gfactor vs __gfactor_keplerian, sim5diskraytrace.py:353-373)."""
        a = rt.bh_spin
        n = 32
        rng = np.random.default_rng(5)
        inc = np.radians(rng.uniform(20, 80, n))
        alpha = rng.uniform(-15, 15, n)
        beta = rng.uniform(1, 10, n)
        g = gd.geodesic_init_inf(inc, a, alpha, beta)
        P = gd.geodesic_find_midplane_crossing(g, 0)
        r = np.asarray(gd.geodesic_position_rad(g, P))
        ok = (np.asarray(g.status) == 0) & np.isfinite(r) & (r > float(r_ms(a)) + 0.1)
        m = np.zeros(n)
        k = photon_momentum(a, np.where(ok, r, 10.0), m, g.l, g.q,
                            np.asarray(g.Rpc) - np.where(ok, np.asarray(P), 1.0),
                            np.ones(n))
        tet = disk_tetrad(a, jnp.asarray(np.where(ok, r, 10.0)), jnp.zeros(n), rt.disk)
        gf = np.asarray(observed_gfactor(k, tet))
        gfK = np.asarray(gfactorK(np.where(ok, r, 10.0), a, g.l))
        np.testing.assert_allclose(gf[ok], gfK[ok], rtol=1e-8)

    def test_emission_angle_range(self, rt):
        a = rt.bh_spin
        n = 16
        rng = np.random.default_rng(6)
        inc = np.radians(rng.uniform(20, 80, n))
        alpha = rng.uniform(-10, 10, n)
        beta = rng.uniform(1, 8, n)
        g = gd.geodesic_init_inf(inc, a, alpha, beta)
        P = gd.geodesic_find_midplane_crossing(g, 0)
        r = np.asarray(gd.geodesic_position_rad(g, P))
        ok = (np.asarray(g.status) == 0) & np.isfinite(r) & (r > float(r_ms(a)))
        k = photon_momentum(a, np.where(ok, r, 10.0), np.zeros(n), g.l, g.q,
                            np.asarray(g.Rpc) - np.where(ok, np.asarray(P), 1.0),
                            np.ones(n))
        tet = disk_tetrad(a, jnp.asarray(np.where(ok, r, 10.0)), jnp.zeros(n),
                          rt.disk)
        mue = np.asarray(emission_angle(k, tet))
        assert (mue[ok] > 0.0).all() and (mue[ok] <= 1.0 + 1e-9).all()

    def test_hardening_fit(self):
        # You+15 regimes
        assert np.isclose(float(spectral_hardening(5e3, 0.1)), 1.0)
        f_mid = float(spectral_hardening(5e4, 0.1))
        assert 1.0 < f_mid < 1.6
        assert np.isclose(float(spectral_hardening(2e5, 0.1)), 1.6)


class TestImage:
    def test_image_maps(self, rt):
        im = rt.image(60.0, 20.0, 32)
        F = np.asarray(im["flux"])
        g = np.asarray(im["gfactor"])
        hit = np.isfinite(F)
        assert hit.mean() > 0.2
        assert (F[hit] > 0).all()
        assert (g[hit] > 0.1).all() and (g[hit] < 2.0).all()
        # H=0 for thin disk
        assert np.allclose(np.asarray(im["H"])[hit], 0.0, atol=1e-10)


class TestSpectrum:
    def test_spectrum_shape_and_scaling(self, rt):
        E = np.geomspace(0.1, 20.0, 32)
        spec_f, spec_0 = rt.spectrum(60.0, E, radres=1.0, angres=20,
                                     hardening=1.7)
        assert spec_f.shape == (32,)
        assert (spec_f >= 0).all() and spec_f.max() > 0
        # spectrum peaks at a keV-ish energy for a 10 Msun disk and falls
        # at both ends
        pk = spec_f.argmax()
        assert 0 < pk < 31
        # hardened spectrum is harder: more flux at high E than unhardened
        tail = slice(-6, None)
        assert spec_f[tail].sum() > spec_0[tail].sum()

    def test_spectrum_distance_scaling(self):
        disk = ThinDisk.create(10.0, 0.7, 0.1)
        E = np.geomspace(0.5, 10.0, 8)
        s1, _ = DiskRaytrace(10.0, 0.7, 10.0, disk,
                             DiskSpectrum_BlackBody()).spectrum(
            60.0, E, radres=2.0, angres=10, hardening=1.7)
        s2, _ = DiskRaytrace(10.0, 0.7, 20.0, disk,
                             DiskSpectrum_BlackBody()).spectrum(
            60.0, E, radres=2.0, angres=10, hardening=1.7)
        np.testing.assert_allclose(s1 / s2, 4.0, rtol=1e-10)


class TestGoldenDriver:
    """End-to-end goldens generated from the reference's Python layer
    (SWIG build of sim5lib + sim5diskraytrace; see tools/golden_dump.c
    provenance notes)."""

    def test_image_matches_reference_python_layer(self):
        from tests.conftest import GOLDEN
        ref = np.load(GOLDEN / "driver_image_a07.npy")
        disk = ThinDisk.create(10.0, 0.7, 0.1, 0.1)
        rt2 = DiskRaytrace(10.0, 0.7, 10.0, disk, DiskSpectrum_BlackBody())
        im = rt2.image(60.0, 20.0, 32, limbdk=1)
        keys = ("flux", "gfactor", "mue", "T", "R", "H", "V")
        for i, k in enumerate(keys):
            got = np.asarray(im[k])
            want = ref[i]
            hit_g, hit_w = np.isfinite(got), np.isfinite(want)
            assert (hit_g == hit_w).mean() > 0.99, f"{k}: hit footprint"
            both = hit_g & hit_w
            if k == "mue":
                tol = dict(rtol=1e-3, atol=1e-3)
            else:
                tol = dict(rtol=1e-4, atol=1e-12)
            ok = np.isclose(got[both], want[both], **tol)
            assert ok.mean() > 0.99, (
                f"{k}: {(~ok).sum()} mismatches, max rel "
                f"{np.max(np.abs(got[both]-want[both])/(np.abs(want[both])+1e-30)):.2e}")

    def test_spectrum_matches_reference_python_layer(self):
        """Tight comparison on an ODD-nphi grid (angres=11 -> nphi=15):
        no quadrature lane sits at sin(phi) ~ 1e-16, where the reference
        rejects rays at random (its theta-root margin falls below even
        long-double resolution; see PARITY.md)."""
        from tests.conftest import GOLDEN
        ref = np.load(GOLDEN / "driver_spectrum_a07_odd.npy")
        E, sf_ref, s0_ref = ref
        disk = ThinDisk.create(10.0, 0.7, 0.1, 0.1)
        rt2 = DiskRaytrace(10.0, 0.7, 10.0, disk, DiskSpectrum_BlackBody())
        sf, s0 = rt2.spectrum(60.0, E, limbdk=1, flat=1, radres=2.0,
                              angres=11.0, hardening=1.7)
        # same polar grid, same physics; tolerate small per-ray
        # differences at the hit/miss boundary of the grid
        nz = sf_ref > 1e-3 * sf_ref.max()
        np.testing.assert_allclose(sf[nz], sf_ref[nz], rtol=3e-2)
        np.testing.assert_allclose(s0[nz], s0_ref[nz], rtol=3e-2)

    def test_spectrum_vs_reference_even_grid_one_sided(self):
        """On an even-nphi grid (angres=10 -> nphi=14) the reference DROPS
        the sin(phi) ~ 1e-16 lanes (phi = pi) into its dOmega_err
        accumulator; we integrate them (round-4 validity-gate slack).
        Our spectrum must therefore bound the reference's from ABOVE,
        by at most those lanes' share of the quadrature (~2/nphi) plus
        the ordinary grid tolerance."""
        from tests.conftest import GOLDEN
        ref = np.load(GOLDEN / "driver_spectrum_a07.npy")
        E, sf_ref, s0_ref = ref
        disk = ThinDisk.create(10.0, 0.7, 0.1, 0.1)
        rt2 = DiskRaytrace(10.0, 0.7, 10.0, disk, DiskSpectrum_BlackBody())
        sf, s0 = rt2.spectrum(60.0, E, limbdk=1, flat=1, radres=2.0,
                              angres=10.0, hardening=1.7)
        nz = sf_ref > 1e-3 * sf_ref.max()
        assert (sf[nz] >= sf_ref[nz] * (1.0 - 3e-2)).all()
        assert (sf[nz] <= sf_ref[nz] * (1.0 + 2.0 / 14.0 + 3e-2)).all()


class TestThickDisk:
    """Surface intersection for a non-razor-thin disk (the reference's
    __find_surface path, sim5diskraytrace.py:257-336)."""

    class ConeDisk:
        """Toy thick disk: photosphere at H = s*R with inner edge."""
        slope = 0.05

        def r_min(self):
            return 6.0

        def mdot(self):
            return jnp.asarray(0.1)

        def lumi(self):
            return jnp.asarray(0.1)

        def flux(self, r):
            return jnp.where(r > 6.0, 1.0 / jnp.maximum(r, 1.0) ** 3, 0.0)

        def t_eff(self, r):
            return jnp.where(r > 6.0, 1e7 / jnp.maximum(r, 1.0) ** 0.75, 0.0)

        def sigma(self, r):
            return jnp.ones_like(r)

        def ell(self, r):
            from sim5_tpu.core import ellK
            return ellK(jnp.maximum(r, 6.0), 0.5)

        def vr(self, r):
            return jnp.zeros_like(r)

        def h(self, r):
            return self.slope * r

        def dhdr(self, r):
            return jnp.full_like(r, self.slope)

    def test_find_surface_lands_on_surface(self):
        """The production root-find lands ON the photosphere (residual at
        rounding), and agrees with the reference-parity march within the
        march's own step accuracy."""
        from sim5_tpu.render import find_surface, find_surface_march
        disk = self.ConeDisk()
        n = 24
        rng = np.random.default_rng(3)
        inc = np.radians(55.0)
        alpha = rng.uniform(-25, 25, n)
        beta = rng.uniform(2, 20, n)
        g = gd.geodesic_init_inf(inc, 0.5, alpha, beta)
        P, r, m, ok = map(np.asarray, find_surface(g, disk))
        assert ok.mean() > 0.5, "most sightlines should hit the cone"
        R = r[ok] * np.sqrt(1 - m[ok] ** 2)
        H = r[ok] * m[ok]
        Hd = disk.slope * R
        # the root-find converges to the surface itself (vs the march's
        # `accuracy`-bounded stop)
        assert np.max(np.abs(H - Hd)) < 1e-9
        Pm, rm, mm, okm = map(np.asarray, find_surface_march(g, disk))
        both = ok & okm
        assert (ok == okm).mean() > 0.9
        # march endpoints stop within ~accuracy of the surface
        assert np.abs(r[both] - rm[both]).max() < 0.05

    def test_find_surface_march_lands_on_surface(self):
        from sim5_tpu.render import find_surface_march
        disk = self.ConeDisk()
        n = 24
        rng = np.random.default_rng(3)
        inc = np.radians(55.0)
        alpha = rng.uniform(-25, 25, n)
        beta = rng.uniform(2, 20, n)
        g = gd.geodesic_init_inf(inc, 0.5, alpha, beta)
        P, r, m, ok = map(np.asarray, find_surface_march(g, disk))
        assert ok.mean() > 0.5, "most sightlines should hit the cone"
        R = r[ok] * np.sqrt(1 - m[ok] ** 2)
        H = r[ok] * m[ok]
        Hd = disk.slope * R
        # the march stops within `accuracy` of the photosphere
        assert np.median(np.abs(H - Hd)) < 0.05
        assert (np.abs(H - Hd) < 0.3).mean() > 0.9

    def test_find_surface_implicit_gradient(self):
        """d(surface radius)/d(spin) through the bracketed root-find vs
        central differences: the implicit-function rule attached by the
        closed-form Newton polish (round-4 verdict task 3)."""
        import jax
        import jax.numpy as jnp
        from sim5_tpu.render import find_surface
        disk = self.ConeDisk()
        rng = np.random.default_rng(5)
        alpha = rng.uniform(-20, 20, 48)
        beta = rng.uniform(3, 18, 48)

        def hit_r_sum(a):
            g = gd.geodesic_init_inf(np.radians(55.0), a, alpha, beta)
            P, r, m, ok = find_surface(g, disk)
            return jnp.sum(jnp.where(ok, r, 0.0))

        ga = jax.grad(hit_r_sum)(jnp.float64(0.5))
        h = 1e-5
        fd = (float(hit_r_sum(jnp.float64(0.5 + h)))
              - float(hit_r_sum(jnp.float64(0.5 - h)))) / (2 * h)
        assert abs(float(ga) - fd) / max(abs(fd), 1e-12) < 1e-6

    def test_find_surface_matches_reference_python_layer(self):
        """Golden vs the reference's own __find_surface
        (sim5diskraytrace.py:257-336), run through its SWIG build on the
        same cone disk / ray set (tools/README.md provenance; the
        reference driver needed a gd.i -> gd.incl shim, a latent bug in
        its own code).  Both marchers take identical adaptive steps, so
        agreement is to machine precision, not just to `accuracy`."""
        from sim5_tpu.render import find_surface_march
        from tests.conftest import GOLDEN
        ref = np.load(GOLDEN / "thickdisk_cone_a05.npy")
        al, be, r_ref, m_ref, ok_ref = ref.T
        disk = self.ConeDisk()
        g = gd.geodesic_init_inf(np.radians(55.0), 0.5, al, be)
        P, r, m, ok = map(np.asarray, find_surface_march(g, disk))
        assert (ok == (ok_ref > 0)).all(), "hit set differs from reference"
        np.testing.assert_allclose(r[ok], r_ref[ok], rtol=1e-10)
        np.testing.assert_allclose(m[ok], m_ref[ok], atol=1e-12)

    def test_thick_disk_image_runs(self):
        disk = self.ConeDisk()
        rt2 = DiskRaytrace(10.0, 0.5, 10.0, disk, DiskSpectrum_BlackBody())
        im = rt2.image(55.0, 25.0, 24)
        F = np.asarray(im["flux"])
        H = np.asarray(im["H"])
        hit = np.isfinite(F)
        assert hit.mean() > 0.2
        # surface height is nonzero for the thick disk (off-midplane hits)
        assert np.nanmax(np.abs(H)) > 0.1


class TestFastModeSpectrum:
    """Round-4 f32 robustness work: the whole spectrum quadrature grid --
    equator-grazing (beta ~ 0) and near-polar (alpha ~ 0) lanes, and
    far-field cells out to 1e6 rg -- must classify and invert in f32.
    Before the fixes (power-of-two quartic rescale, resolvent
    discriminant-boundary rescue, precision-scaled validity gates) the
    f32 spectrum carried a 3-6% broadband deficit from silently dropped
    lanes; the same gates also dropped the reference's own alpha ~ 0
    lanes in f64 (it inherits that from long-double truncation,
    sim5kerr-geod.c:1141 m2p >= 1.0)."""

    def test_f32_spectrum_matches_f64(self):
        import jax
        E = np.geomspace(0.5, 10.0, 12)
        kw = dict(radres=1.0, angres=20.0)
        disk = ThinDisk.create(10.0, 0.7, 0.1)
        rt2 = DiskRaytrace(10.0, 0.7, 10.0, disk, DiskSpectrum_BlackBody())
        s64, _ = rt2.spectrum(60.0, E, **kw)
        with jax.enable_x64(False):
            disk32 = ThinDisk.create(10.0, 0.7, 0.1)
            rt32 = DiskRaytrace(10.0, 0.7, 10.0, disk32,
                                DiskSpectrum_BlackBody())
            s32, _ = rt32.spectrum(60.0, E, **kw)
        nz = s64 > 1e-6 * s64.max()
        rel = np.abs(s32[nz] - s64[nz]) / s64[nz]
        # measured 7.6e-7 max on this config (IEEE f32 CPU)
        assert rel.max() < 1e-5, f"f32 spectrum rel err {rel.max():.2e}"

    def test_far_field_classification_f32(self):
        import jax
        rr = np.geomspace(10.0, 1e6, 25)
        al, be = -rr, -1e-3 * rr
        with jax.enable_x64(False):
            g = gd.geodesic_init_inf(np.float32(np.radians(60.0)),
                                     np.float32(0.7),
                                     al.astype(np.float32),
                                     be.astype(np.float32))
            P = gd.geodesic_find_midplane_crossing(g, 0)
            r = np.asarray(gd.geodesic_position_rad(g, P))
        assert (np.asarray(g.status) == 0).all()
        assert np.isfinite(r).all()
        # crossing radius ~ impact radius at large r
        np.testing.assert_allclose(r[5:], rr[5:] * np.cos(0.0), rtol=2e-2)

    def test_degenerate_grid_lanes_accepted(self):
        import jax
        # beta = 0 (observer at the theta turning point) and alpha ~ 0
        # (m2p rounds to 1): every polar grid contains these lanes
        for x64 in (True, False):
            with jax.enable_x64(x64):
                dt = np.float64 if x64 else np.float32
                al = np.asarray([-20.0, 1e-14], dt)
                be = np.asarray([0.0, -10.0], dt)
                g = gd.geodesic_init_inf(dt(np.radians(60.0)), dt(0.7),
                                         al, be)
                st = np.asarray(g.status)
                assert (st == 0).all(), f"x64={x64}: status {st}"
                P = gd.geodesic_find_midplane_crossing(g, 0)
                r = np.asarray(gd.geodesic_position_rad(g, P))
                assert np.isfinite(r).all()


class TestLineProfile:
    def test_broad_line_shape(self):
        from sim5_tpu.render import line_profile
        g, prof = line_profile(0.9, np.radians(45.0), npix=128,
                               r_in=None, r_out=50.0)
        g, prof = np.asarray(g), np.asarray(prof)
        assert np.isfinite(prof).all() and prof.max() > 0
        nz = prof > 0
        # relativistically broadened: flux both redward and blueward of g=1
        assert g[nz].min() < 0.7 and g[nz].max() > 1.05

        # classic double-horned annulus profile with Doppler-boosted blue horn
        g2, prof2 = line_profile(0.9, np.radians(45.0), npix=128,
                                 r_in=10.0, r_out=14.0)
        g2, prof2 = np.asarray(g2), np.asarray(prof2)
        nz2 = prof2 > 0.01 * prof2.max()
        blue = prof2[g2 > 1.0].max()
        red = prof2[(g2 < 1.0) & nz2].max() if ((g2 < 1.0) & nz2).any() else 0.0
        assert blue > red

    def test_transfer_function_consistency(self):
        from sim5_tpu.render import transfer_function, disk_g_map
        r_edges = np.geomspace(3.0, 50.0, 9)
        T = np.asarray(transfer_function(0.5, np.radians(60.0), r_edges,
                                         npix=128))
        assert T.shape == (8, 64)
        assert (T >= 0).all() and T.sum() > 0
        # total solid angle equals direct pixel count x area
        r, gf, hit, dA = disk_g_map(0.5, np.radians(60.0), 128, None,
                                    3.0, 50.0)
        assert np.isclose(T.sum(), float(np.asarray(hit).sum()) * dA, rtol=1e-10)


class TestSpectrumFit:
    def test_matches_driver_and_differentiates(self):
        import jax
        from sim5_tpu.render import make_polar_grid, disk_spectrum
        E = np.geomspace(0.3, 15.0, 16)
        grid = make_polar_grid(0.7, np.radians(60.0), radres=2.0, angres=10.0)
        spec = np.asarray(disk_spectrum(grid, E, 10.0, 0.7, 0.1,
                                        np.radians(60.0), hardening=1.7))
        # matches the driver-path spectrum on the same quadrature
        disk = ThinDisk.create(10.0, 0.7, 0.1, 0.1)
        rt2 = DiskRaytrace(10.0, 0.7, 10.0, disk, DiskSpectrum_BlackBody())
        ref, _ = rt2.spectrum(60.0, E, flat=1, radres=2.0, angres=10.0,
                              hardening=1.7)
        nz = ref > 1e-3 * ref.max()
        np.testing.assert_allclose(spec[nz], ref[nz], rtol=2e-2)

        # gradient w.r.t. spin is finite and matches finite differences
        def total(a):
            return jnp.log(jnp.sum(disk_spectrum(grid, E, 10.0, a, 0.1,
                                                 np.radians(60.0),
                                                 hardening=1.7)))
        gval = float(jax.grad(total)(0.7))
        # NOTE: eps must stay coarse -- the spectrum has tiny jump
        # discontinuities where grid lanes cross the ISCO mask, and
        # central differences amplify them as 1/eps (verified: fd(1e-3)
        # agrees with autodiff, fd(1e-5) is two orders off)
        eps = 1e-3
        fd = (float(total(0.7 + eps)) - float(total(0.7 - eps))) / (2 * eps)
        assert np.isfinite(gval)
        assert np.isclose(gval, fd, rtol=0.05), (gval, fd)
