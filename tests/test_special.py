"""Golden tests for special functions vs the compiled C reference."""

import numpy as np
import pytest

from sim5_tpu import special as sp


def _check(got, want, rtol, atol=1e-14, frac=1.0):
    got = np.asarray(got)
    finite = np.isfinite(want)  # reference returns NaN where it rejects args
    got, want = got[finite], np.asarray(want)[finite]
    ok = np.isclose(got, want, rtol=rtol, atol=atol)
    assert ok.mean() >= frac, (
        f"{(~ok).sum()}/{ok.size} mismatches; worst rel err "
        f"{np.nanmax(np.abs(got - want) / (np.abs(want) + 1e-30)):.3e}")


class TestCarlson:
    def test_rf(self, golden_special):
        d = golden_special["rf"]
        _check(sp.rf(d[:, 0], d[:, 1], d[:, 2]), d[:, 3], 1e-9)

    def test_rd(self, golden_special):
        d = golden_special["rd"]
        _check(sp.rd(d[:, 0], d[:, 1], d[:, 2]), d[:, 3], 1e-9)

    def test_rc(self, golden_special):
        d = golden_special["rc"]
        _check(sp.rc(d[:, 0], d[:, 1]), d[:, 2], 1e-9)

    def test_rj(self, golden_special):
        d = golden_special["rj"]
        _check(sp.rj(d[:, 0], d[:, 1], d[:, 2], d[:, 3]), d[:, 4], 1e-8)


class TestLegendre:
    def test_k(self, golden_special):
        d = golden_special["ek"]
        _check(sp.elliptic_k(d[:, 0]), d[:, 1], 1e-9)

    def test_f(self, golden_special):
        d = golden_special["ef"]
        _check(sp.elliptic_f(d[:, 0], d[:, 1]), d[:, 2], 1e-9)

    def test_e(self, golden_special):
        d = golden_special["ee"]
        _check(sp.elliptic_e(d[:, 0], d[:, 1]), d[:, 2], 1e-9)


class TestJacobi:
    def test_sncndn(self, golden_special):
        d = golden_special["sncndn"]
        sn, cn, dn = sp.jacobi_sncndn(d[:, 0], d[:, 1])
        # AGM tolerance in reference is 1e-8 -> values agree to ~1e-7
        _check(sn, d[:, 2], 1e-6, atol=1e-7)
        _check(cn, d[:, 3], 1e-6, atol=1e-7)
        _check(dn, d[:, 4], 1e-6, atol=1e-7)

    def test_isn(self, golden_special):
        d = golden_special["isn"]
        _check(sp.jacobi_isn(d[:, 0], d[:, 1]), d[:, 2], 1e-9)

    def test_icn(self, golden_special):
        d = golden_special["icn"]
        _check(sp.jacobi_icn(d[:, 0], d[:, 1]), d[:, 2], 1e-9)

    def test_itn(self, golden_special):
        d = golden_special["itn"]
        _check(sp.jacobi_itn(d[:, 0], d[:, 1]), d[:, 2], 1e-9)

    def test_roundtrip(self):
        # sn(isn(z)) == z across moduli
        z = np.linspace(-0.95, 0.95, 41)
        m = np.linspace(0.05, 0.95, 41)
        u = sp.jacobi_isn(z, m)
        sn, _, _ = sp.jacobi_sncndn(u, m)
        _check(sn, z, 1e-6, atol=1e-7)


class TestBFIntegrals:
    def test_T_mp(self, golden_special):
        d = golden_special["Tmp"]
        _check(sp.integral_T_mp(d[:, 0], d[:, 1], d[:, 2], d[:, 3]), d[:, 4], 1e-7)

    def test_T_m0(self, golden_special):
        d = golden_special["Tm0"]
        _check(sp.integral_T_m0(d[:, 0], d[:, 1], d[:, 2]), d[:, 3], 1e-7)

    def test_T_m2(self, golden_special):
        d = golden_special["Tm2"]
        _check(sp.integral_T_m2(d[:, 0], d[:, 1], d[:, 2]), d[:, 3], 1e-6, atol=1e-8)

    def test_R_rp_inf(self, golden_special):
        d = golden_special["Rrp_inf"]
        _check(sp.integral_R_rp_re_inf(d[:, 0], d[:, 1], d[:, 2], d[:, 3], d[:, 4]),
               d[:, 5], 1e-6)

    def test_R_rp(self, golden_special):
        d = golden_special["Rrp"]
        _check(sp.integral_R_rp_re(d[:, 0], d[:, 1], d[:, 2], d[:, 3], d[:, 4], d[:, 5]),
               d[:, 6], 1e-6)

    def test_R_r0(self, golden_special):
        d = golden_special["Rr0"]
        _check(sp.integral_R_r0_re(d[:, 0], d[:, 1], d[:, 2], d[:, 3], d[:, 4]),
               d[:, 5], 1e-7)

    def test_R_r1(self, golden_special):
        d = golden_special["Rr1"]
        _check(sp.integral_R_r1_re(d[:, 0], d[:, 1], d[:, 2], d[:, 3], d[:, 4]),
               d[:, 5], 1e-6)

    def test_R_r2(self, golden_special):
        d = golden_special["Rr2"]
        _check(sp.integral_R_r2_re(d[:, 0], d[:, 1], d[:, 2], d[:, 3], d[:, 4]),
               d[:, 5], 1e-6)


class TestPolyroots:
    def test_quartic_random(self):
        rng = np.random.default_rng(0)
        roots = rng.uniform(-10, 10, (256, 4))
        # build quartics from known real roots
        a3 = -roots.sum(1)
        a2 = (roots[:, 0] * roots[:, 1] + roots[:, 0] * roots[:, 2] + roots[:, 0] * roots[:, 3]
              + roots[:, 1] * roots[:, 2] + roots[:, 1] * roots[:, 3] + roots[:, 2] * roots[:, 3])
        a1 = -(roots[:, 0] * roots[:, 1] * roots[:, 2] + roots[:, 0] * roots[:, 1] * roots[:, 3]
               + roots[:, 0] * roots[:, 2] * roots[:, 3] + roots[:, 1] * roots[:, 2] * roots[:, 3])
        a0 = roots.prod(1)
        re, im, n = sp.quartic_roots(a3, a2, a1, a0)
        re, im, n = np.asarray(re), np.asarray(im), np.asarray(n)
        assert (n == 4).all()
        got = np.sort(re, axis=1)
        want = np.sort(roots, axis=1)
        assert np.allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_quartic_complex(self):
        # (x^2+1)(x^2-3x+2) = x^4 -3x^3 +3x^2 -3x + 2: roots 1,2,+-i
        re, im, n = sp.quartic_roots(-3.0, 3.0, -3.0, 2.0)
        re, im, n = np.asarray(re), np.asarray(im), np.asarray(n)
        assert n == 2
        sre, sim_, nr = sp.sort_quartic_roots(re, im)
        sre, sim_ = np.asarray(sre), np.asarray(sim_)
        assert np.allclose(sre[:2], [2.0, 1.0], atol=1e-9)
        assert np.allclose(np.abs(sim_[2:]), [1.0, 1.0], atol=1e-9)

    def test_quartic_roots_c(self):
        # the quartic_eq_c variant (sim5polyroots.c:450): same quartic as
        # above, roots unpacked as individual complex (re, im) pairs,
        # sorted real-first-descending with the conjugate pair adjacent
        n, z1, z2, z3, z4 = sp.quartic_roots_c(-3.0, 3.0, -3.0, 2.0)
        assert int(n) == 2
        assert np.allclose([float(z1[0]), float(z2[0])], [2.0, 1.0],
                           atol=1e-9)
        assert float(z1[1]) == 0.0 and float(z2[1]) == 0.0
        assert np.allclose(abs(float(z3[1])), 1.0, atol=1e-9)
        assert np.allclose(float(z3[1]) + float(z4[1]), 0.0, atol=1e-12)

    def test_duplication_mode_override(self):
        # the Carlson duplication chain must produce identical values under
        # both lowering strategies (the config flag exists for mixed
        # CPU+TPU processes where the backend-based default mis-picks)
        x, y, z = 0.3, 1.7, 4.2
        base = float(sp.rf(x, y, z))
        prev = sp.set_duplication_mode("unroll")
        try:
            import jax
            jax.clear_caches()  # drop the loop-form compiled entry
            # same op sequence; XLA fusion differences cost at most an ulp
            np.testing.assert_allclose(float(sp.rf(x, y, z)), base,
                                       rtol=1e-14)
        finally:
            sp.set_duplication_mode(prev)
            jax.clear_caches()


class TestGradients:
    def test_rf_grad(self):
        import jax
        g = jax.grad(lambda x: sp.rf(x, 2.0, 3.0))(1.0)
        # dRF/dx = -1/6 RD(y,z,x)
        want = -sp.rd(2.0, 3.0, 1.0) / 6.0
        assert np.isclose(float(g), float(want), rtol=1e-8)

    def test_elliptic_k_grad(self):
        import jax
        m = 0.3
        g = jax.grad(lambda mm: sp.elliptic_k(mm))(m)
        # dK/dm = (E - (1-m)K) / (2m(1-m))
        E = sp.elliptic_e(np.pi / 2, m)
        K = sp.elliptic_k(m)
        want = (E - (1 - m) * K) / (2 * m * (1 - m))
        assert np.isclose(float(g), float(want), rtol=1e-7)


class TestDnFormTIntegrals:
    """Vortical (q<0) poloidal integrals on the dn-band c <= x <= b --
    no reference equivalent exists (the cn-form integral_T_* of
    sim5elliptic.c:1119-1159 are invalid for q<0); oracle is direct
    quadrature in the nonsingular x(psi)^2 = b^2 cos^2 psi + c^2 sin^2 psi
    parametrization (dx/sqrt((x^2-c^2)(b^2-x^2)) = -dpsi/x)."""

    def test_vs_quadrature(self):
        rng = np.random.default_rng(0)
        for _ in range(6):
            c2 = rng.uniform(0.01, 0.5)
            b2 = min(c2 + rng.uniform(0.05, 0.9), 0.95)
            c, b = np.sqrt(c2), np.sqrt(b2)
            X = rng.uniform(c + 1e-6, b - 1e-6)
            psiX = np.arcsin(np.sqrt((b2 - X * X) / (b2 - c2)))
            ps = np.linspace(0, psiX, 200001)
            x = np.sqrt(b2 * np.cos(ps) ** 2 + c2 * np.sin(ps) ** 2)
            g0 = np.trapezoid(1.0 / x, ps)
            g2 = np.trapezoid(x, ps)
            gp = np.trapezoid(1.0 / ((1.0 - x * x) * x), ps)
            assert abs(float(sp.integral_T_m0_dn(c2, b2, X)) - g0) < 1e-9
            assert abs(float(sp.integral_T_m2_dn(c2, b2, X)) - g2) < 1e-9
            assert abs(float(sp.integral_T_mp_dn(c2, b2, 1.0, X)) - gp) < 1e-9

    def test_complete_at_lower_root(self):
        # X = c closes the band: am = pi/2 (complete integrals)
        c2, b2 = 0.2, 0.7
        mm = (b2 - c2) / b2
        K = float(sp.elliptic_k(mm))
        assert np.isclose(float(sp.integral_T_m0_dn(c2, b2, np.sqrt(c2))),
                          K / np.sqrt(b2), rtol=1e-12)


class TestBandRadialIntegrals:
    """Bound-band (RR_BH) radial integrals on [Y, r2] of the inner root
    band -- no reference equivalent (sim5elliptic.c has only the r >= r1
    from-infinity forms); oracle is quadrature in the nonsingular
    w = kappa sin^2 psi parametrization."""

    def test_vs_quadrature(self):
        rng = np.random.default_rng(1)
        done = 0
        while done < 4:
            r4, r3, r2, r1 = np.sort(rng.uniform(-3, 6, 4))
            if r2 - r3 < 0.1 or r1 - r2 < 0.05:
                continue
            done += 1
            Y = rng.uniform(r3 + 1e-6, r2 - 1e-6)
            mm4 = ((r2 - r3) * (r1 - r4)) / ((r2 - r4) * (r1 - r3))
            c4 = 2.0 / np.sqrt((r1 - r3) * (r2 - r4))
            kappa = (r2 - r3) / (r1 - r3)
            snY2 = (r1 - r3) / (r2 - r3) * (r2 - Y) / (r1 - Y)
            ps = np.linspace(0, np.arcsin(np.sqrt(snY2)), 200001)
            w = kappa * np.sin(ps) ** 2
            r = (r2 - w * r1) / (1 - w)
            ker = c4 / np.sqrt(1 - mm4 * np.sin(ps) ** 2)
            assert abs(float(sp.integral_R_r0_bh(r1, r2, r3, r4, Y))
                       - np.trapezoid(ker, ps)) < 1e-8
            assert abs(float(sp.integral_R_r1_bh(r1, r2, r3, r4, Y))
                       - np.trapezoid(r * ker, ps)) < 1e-8
            assert abs(float(sp.integral_R_r2_bh(r1, r2, r3, r4, Y))
                       - np.trapezoid(r * r * ker, ps)) < 1e-7
            for p in (r3 - rng.uniform(0.1, 2.0),       # pole below band
                      rng.uniform(r3 + 1e-2, Y - 1e-2)):  # n>1 branch
                got = float(sp.integral_R_rp_bh(r1, r2, r3, r4, p, Y))
                want = np.trapezoid(ker / (r - p), ps)
                assert abs(got - want) < 1e-6 * max(1.0, abs(want))


class TestCompleteKAGM:
    """elliptic_k_mc (the round-5 AGM complete-K slot) vs the RF-based
    elliptic_k across the full modulus range, including the near-critical
    complements where the engine relies on it."""

    def test_matches_rf_based_k(self):
        import jax.numpy as jnp
        mc = np.array([1e-12, 1e-9, 1e-6, 1e-3, 0.1, 0.5, 0.9, 1.0 - 1e-7])
        k_rf = np.asarray(sp.rf(np.zeros_like(mc), mc, np.ones_like(mc)))
        k_agm = np.asarray(sp.elliptic_k_mc(jnp.asarray(mc)))
        np.testing.assert_allclose(k_agm, k_rf, rtol=5e-14)

    def test_grad_vs_fd(self):
        import jax
        import jax.numpy as jnp
        for mc0 in (1e-6, 0.01, 0.3, 0.9):
            g = jax.grad(lambda m: sp.elliptic_k_mc(m))(jnp.float64(mc0))
            h = 1e-6 * max(mc0, 1e-4)
            fd = (float(sp.elliptic_k_mc(jnp.float64(mc0 + h)))
                  - float(sp.elliptic_k_mc(jnp.float64(mc0 - h)))) / (2 * h)
            assert abs(float(g) - fd) / max(abs(fd), 1e-12) < 1e-7
