"""Tests of the stepwise marching engine: conserved-quantity gates (the
reference's test_raytrace contract) and cross-engine consistency with the
analytic geodesic engine (the reference's test_geodesic_init_src contract).
"""

import numpy as np
import jax.numpy as jnp

from sim5_tpu import march
from sim5_tpu.core import (kerr_metric, tetrad_zamo, on2bl, dotprod,
                           photon_carter_const)
from sim5_tpu.core import bl2on as core_bl2on, on2bl as core_on2bl
from sim5_tpu import march


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0.0, 0.999, n)
    r = rng.uniform(4.0, 14.0, n)
    minc = np.cos(np.radians(rng.uniform(5.0, 85.0, n)))
    x = np.stack([np.zeros(n), r, minc, np.zeros(n)], -1)
    m = kerr_metric(a, x[:, 1], x[:, 2])
    t = tetrad_zamo(m)
    th = rng.uniform(0, np.pi, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    kloc = np.stack([np.ones(n), np.sin(th) * np.cos(ph),
                     np.sin(th) * np.sin(ph), np.cos(th)], -1)
    k = np.asarray(on2bl(kloc, t))
    return a, x, k, m


class TestConservation:
    def test_carter_and_null_conservation(self):
        # reference gates (sim5unittests.c:151-154): Carter drift < 1e-3
        a, x, k, m0 = _random_rays(128)
        kk0 = np.asarray(dotprod(k, k, m0))
        assert np.max(np.abs(kk0)) < 1e-10
        st = march.raytrace_prepare(a, x, k, precision=0.01)
        st, active = march.raytrace(st, r_max=500.0, max_steps=20000)
        r = np.asarray(st.x[:, 1])
        done = (r >= 500.0) | (r <= 1.06 * (1 + np.sqrt(1 - a ** 2)))
        assert done.mean() > 0.95, "rays did not finish"
        err = np.asarray(march.raytrace_error(st))
        escaped = r >= 500.0
        assert np.median(err[escaped]) < 1e-4
        assert (err[escaped] < 1e-3).mean() > 0.95

    def test_energy_momentum_conservation(self):
        a, x, k, _ = _random_rays(64, seed=3)
        st = march.raytrace_prepare(a, x, k, precision=0.01)
        st, _ = march.raytrace(st, r_max=200.0, max_steps=10000)
        m = kerr_metric(st.a, st.x[:, 1], st.x[:, 2])
        # E = -k_t and L = k_phi conserved
        E1 = np.asarray(st.k[:, 0] * m.g00 + st.k[:, 3] * m.g03)
        E0 = np.asarray(st.E)
        escaped = np.asarray(st.x[:, 1]) > 100.0
        np.testing.assert_allclose(E1[escaped], E0[escaped], rtol=1e-3)
        # null norm preserved
        kk = np.asarray(dotprod(st.k, st.k, m))
        assert np.median(np.abs(kk[escaped])) < 1e-5


class TestCrossEngine:
    def test_marching_reproduces_analytic_inclination(self):
        """Launch rays off the disk plane along analytic geodesics; the
        marching engine must carry them to the analytic engine's
        at-infinity inclination (reference: sim5unittests.c:218-235)."""
        from sim5_tpu import geodesic as gd
        n = 24
        rng = np.random.default_rng(7)
        a = rng.uniform(0.1, 0.95, n)
        inc = np.radians(rng.uniform(30, 75, n))
        alpha = rng.uniform(-8, 8, n)
        beta = rng.uniform(2, 8, n)
        g = gd.geodesic_init_inf(inc, a, alpha, beta)
        ok = np.asarray(g.status) == 0
        P = np.asarray(gd.geodesic_find_midplane_crossing(g, 0))
        r = np.asarray(gd.geodesic_position_rad(g, P))
        valid = ok & np.isfinite(P) & np.isfinite(r) & (r > 3.0)
        # traverse the same geodesic backwards (disk -> observer): negate the
        # 4-momentum (affine parameter reversal) -- except k[2], whose sign
        # in geodesic_momentum follows the reference's dm/dP convention
        # rather than dtheta/dlambda (see geodesic_momentum docstring)
        k = np.asarray(gd.geodesic_momentum(g, P, r, np.zeros(n)))
        k_out = np.stack([-k[:, 0], -k[:, 1], k[:, 2], -k[:, 3]], -1)
        x = np.stack([np.zeros(n), r, np.zeros(n), np.zeros(n)], -1)
        idx = np.where(valid)[0]
        st = march.raytrace_prepare(a[idx], x[idx], k_out[idx], precision=0.003)
        st, _ = march.raytrace(st, r_max=5e3, max_steps=40000)
        rf_ = np.asarray(st.x[:, 1])
        esc = rf_ >= 5e3
        assert esc.mean() > 0.8
        m_inf = np.asarray(st.x[:, 2])
        cos_i = np.asarray(g.cos_i)[idx]
        # at r=5e3 the poloidal coordinate is within ~1e-3 of its asymptote
        assert np.median(np.abs(m_inf[esc] - cos_i[esc])) < 5e-3
        assert (np.abs(m_inf[esc] - cos_i[esc]) < 3e-2).mean() > 0.9


class TestFlat:
    def test_flat_rays_are_straight(self):
        # in Minkowski space rays keep their direction: r*sin(theta) along
        # a radial ray stays constant etc.; simplest check: k stays constant
        # in cartesian terms => energy exactly conserved, no deflection
        n = 8
        x = np.stack([np.zeros(n), np.full(n, 20.0),
                      np.full(n, 0.3), np.zeros(n)], -1)
        k = np.stack([np.ones(n), np.ones(n) * 0.99,
                      np.zeros(n), np.zeros(n)], -1)
        # normalize to null in flat metric: -k0^2 + k1^2 + r^2 k2^2 + ... = 0
        k[:, 1] = 1.0
        st = march.raytrace_prepare(0.0, x, k, precision=0.01,
                                    options=march.RTOPT_FLAT)
        st, _ = march.raytrace(st, r_max=1e3, max_steps=5000)
        assert (np.asarray(st.x[:, 1]) >= 1e3).all()
        np.testing.assert_allclose(np.asarray(st.x[:, 2]), 0.3, atol=1e-12)


class TestPolarizationTransport:
    def test_wp_constant_conserved_along_march(self):
        """Parallel-transport the polarization vector with RTOPT_POLARIZATION
        and verify f.k=0, f norm and the Walker-Penrose constant are
        conserved (reference gates: sim5unittests.c:139-155)."""
        from sim5_tpu import polarization as pol
        a, x, k, m0 = _random_rays(32, seed=11)
        # build f orthogonal to k in the local ZAMO frame
        t = tetrad_zamo(m0)
        kloc = np.asarray(core_bl2on(k, t))
        # local spatial direction perpendicular to kloc spatial part
        ks = kloc[:, 1:]
        ref = np.zeros_like(ks)
        ref[:, 0] = -ks[:, 1]
        ref[:, 1] = ks[:, 0]
        deg = np.linalg.norm(ref, axis=1) < 1e-8
        ref[deg] = [1.0, 0.0, 0.0]
        ref /= np.linalg.norm(ref, axis=1, keepdims=True)
        floc = np.concatenate([np.zeros((32, 1)), ref], 1)
        f = np.asarray(core_on2bl(floc, t))
        kf0 = np.asarray(dotprod(k, f, m0))
        assert np.max(np.abs(kf0)) < 1e-10
        wp1_0, wp2_0 = pol.polarization_constant(k, f, m0)

        st = march.raytrace_prepare(a, x, k, f=f, precision=0.01,
                                    options=march.RTOPT_POLARIZATION)
        st, _ = march.raytrace(st, r_max=300.0, max_steps=20000)
        mf = kerr_metric(st.a, st.x[:, 1], st.x[:, 2])
        esc = np.asarray(st.x[:, 1]) >= 300.0
        kf = np.asarray(dotprod(st.k, st.f, mf))
        ff0 = np.asarray(dotprod(f, f, m0))
        ff = np.asarray(dotprod(st.f, st.f, mf))
        assert np.median(np.abs(kf[esc])) < 1e-6
        np.testing.assert_allclose(ff[esc], ff0[esc], rtol=1e-3)
        wp1, wp2 = pol.polarization_constant(st.k, st.f, mf)
        wp1, wp2 = np.asarray(wp1), np.asarray(wp2)
        wp1_0, wp2_0 = np.asarray(wp1_0), np.asarray(wp2_0)
        mag = np.hypot(wp1_0, wp2_0) + 1e-12
        drift = np.hypot(wp1 - wp1_0, wp2 - wp2_0) / mag
        assert np.median(drift[esc]) < 1e-2
        assert (drift[esc] < 0.1).mean() > 0.9


class TestDifferentiableMarch:
    """Round-4 verdict task 2 (SURVEY 7 item 7): the march is
    reverse-differentiable via the checkpointed fixed-trip scan engine
    (`_volume_march_scan`), and the analytic hot-spot light curve is
    differentiable in (a, r_spot)."""

    @staticmethod
    def _make_j(r_spot):
        import jax.numpy as jnp

        def j(t, r, m, phi):
            rho2 = (r - r_spot) ** 2 + (r * m) ** 2
            return jnp.exp(-0.5 * rho2 / 1.5 ** 2)
        return j

    _KW = dict(incl=float(np.radians(55.0)), npix=16, rmax=16.0,
               r_start=25.0, max_steps=384, precision=0.03,
               axisymmetric=True)

    def test_scan_engine_matches_while_loop(self):
        import jax.numpy as jnp
        from sim5_tpu.render.lightcurve import volume_image
        a0 = jnp.float64(0.7)
        Ix = volume_image(a0, emissivity_fn=self._make_j(8.0),
                          engine="xla", **self._KW)
        Is = volume_image(a0, emissivity_fn=self._make_j(8.0),
                          engine="scan", **self._KW)
        Ix, Is = np.asarray(Ix), np.asarray(Is)
        assert Ix.max() > 0
        # identical step sequence -> identical accumulation
        np.testing.assert_allclose(Is, Ix, rtol=1e-12)

    def test_volume_image_grad_vs_fd(self):
        """d(volume image)/d(spin, source radius) through seed + march +
        RT accumulation, vs central differences."""
        import jax
        import jax.numpy as jnp
        from sim5_tpu.render.lightcurve import volume_image

        def total(a, r_spot):
            I = volume_image(a, emissivity_fn=self._make_j(r_spot),
                             engine="scan", **self._KW)
            return jnp.sum(I)

        a0, rs0 = jnp.float64(0.7), jnp.float64(8.0)
        g = jax.grad(total, argnums=(0, 1))(a0, rs0)
        h = 1e-5
        for i, gv in enumerate(g):
            ap = [a0, rs0]
            am = [a0, rs0]
            ap[i] = ap[i] + h
            am[i] = am[i] - h
            fd = (float(total(*ap)) - float(total(*am))) / (2 * h)
            rel = abs(float(gv) - fd) / max(abs(fd), 1e-12)
            assert rel < 1e-5, f"arg {i}: grad {float(gv):.4e} fd {fd:.4e}"

    def test_volume_lightcurve_grad_vs_fd(self):
        """d(lightcurve)/d(a, r_spot, t_flare) through the march-based
        volume path: a time-dependent (flaring) source seen through the
        differentiable scan march at two observer times -- the light
        curve is a function of the retarded coordinate time along each
        ray, so the flare-time gradient exercises the full time
        bookkeeping of the march.  (The analytic hotspot_lightcurve is
        differentiable by construction since its Om/float() removal, but
        the azm+timedelay backward is a multi-10-minute XLA:CPU compile
        -- the volume path is the gradient-fitting engine, SURVEY 7.)"""
        import jax
        import jax.numpy as jnp
        from sim5_tpu.render.lightcurve import volume_image

        t_obs = (-20.0, -8.0)

        def lc_sum(a, r_spot, t_flare):
            def j(t, r, m, phi):
                rho2 = (r - r_spot) ** 2 + (r * m) ** 2
                return (jnp.exp(-0.5 * rho2 / 1.5 ** 2)
                        * jnp.exp(-0.5 * ((t - t_flare) / 10.0) ** 2))
            tot = 0.0
            for t0 in t_obs:
                tot = tot + jnp.sum(volume_image(
                    a, emissivity_fn=j, engine="scan", t0=t0, **self._KW))
            return tot

        p0 = [jnp.float64(0.7), jnp.float64(8.0), jnp.float64(-30.0)]
        g = jax.grad(lc_sum, argnums=(0, 1, 2))(*p0)
        h = 1e-4
        for i, gv in enumerate(g):
            ap = list(p0)
            am = list(p0)
            ap[i] = ap[i] + h
            am[i] = am[i] - h
            fd = (float(lc_sum(*ap)) - float(lc_sum(*am))) / (2 * h)
            rel = abs(float(gv) - fd) / max(abs(fd), 1e-9)
            assert rel < 1e-4, f"arg {i}: grad {float(gv):.4e} fd {fd:.4e}"
