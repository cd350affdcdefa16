"""Golden tests for the spacetime core vs the C reference."""

import numpy as np

from sim5_tpu import core


def _check(got, want, rtol=1e-12, atol=1e-13):
    got, want = np.asarray(got), np.asarray(want)
    finite = np.isfinite(want)  # reference yields NaN outside validity domains
    got, want = got[finite], want[finite]
    assert np.allclose(got, want, rtol=rtol, atol=atol), (
        f"max abs diff {np.nanmax(np.abs(got - want)):.3e}, "
        f"max rel diff {np.nanmax(np.abs(got - want) / (np.abs(want) + 1e-30)):.3e}")


class TestMetric:
    def test_kerr_metric(self, golden_kerr):
        d = golden_kerr["metric"]
        g = core.kerr_metric(d[:, 0], d[:, 1], d[:, 2])
        got = np.stack([g.g00, g.g11, g.g22, g.g33, g.g03], -1)
        _check(got, d[:, 3:8])

    def test_kerr_metric_contravariant(self, golden_kerr):
        d = golden_kerr["imetric"]
        g = core.kerr_metric_contravariant(d[:, 0], d[:, 1], d[:, 2])
        got = np.stack([g.g00, g.g11, g.g22, g.g33, g.g03], -1)
        _check(got, d[:, 3:8])

    def test_metric_inverse_consistency(self):
        # g^munu really is the inverse of g_munu
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 0.999, 100)
        r = rng.uniform(1.9, 50, 100)
        m = rng.uniform(-0.95, 0.95, 100)
        lo = core.kerr_metric(a, r, m)
        hi = core.kerr_metric_contravariant(a, r, m)

        def mat(g):
            M = np.zeros((100, 4, 4))
            M[:, 0, 0] = g.g00
            M[:, 1, 1] = g.g11
            M[:, 2, 2] = g.g22
            M[:, 3, 3] = g.g33
            M[:, 0, 3] = M[:, 3, 0] = g.g03
            return M
        prod = np.einsum('nij,njk->nik', mat(lo), mat(hi))
        _check(prod, np.broadcast_to(np.eye(4), (100, 4, 4)), rtol=1e-10, atol=1e-10)

    def test_connection(self, golden_kerr):
        d = golden_kerr["conn"]
        G = np.asarray(core.kerr_connection(d[:, 0], d[:, 1], d[:, 2]))
        # golden stores the 40 upper-triangle true Gamma^i_{jk} (j<=k)
        idx = [(i, j, k) for i in range(4) for j in range(4) for k in range(j, 4)]
        got = np.stack([G[:, i, j, k] for (i, j, k) in idx], -1)
        _check(got, d[:, 3:43], rtol=1e-10, atol=1e-11)

    def test_connection_vs_metric_autodiff(self):
        # Gamma^i_jk = 1/2 g^il (d_j g_lk + d_k g_lj - d_l g_jk): check the
        # closed forms against automatic differentiation of the metric
        import jax
        import jax.numpy as jnp

        def gmat(x):
            r, th = x
            g = core.kerr_metric(0.8, r, jnp.cos(th))
            M = jnp.zeros((4, 4))
            M = M.at[0, 0].set(g.g00).at[1, 1].set(g.g11).at[2, 2].set(g.g22)
            M = M.at[3, 3].set(g.g33).at[0, 3].set(g.g03).at[3, 0].set(g.g03)
            return M

        r, th = 4.3, 1.1
        x = jnp.array([r, th])
        dg = jax.jacfwd(gmat)(x)          # (4,4,2) derivative wrt (r, theta)
        dgfull = jnp.zeros((4, 4, 4))     # d_mu g_ab with mu in {t,r,th,phi}
        dgfull = dgfull.at[:, :, 1].set(dg[:, :, 0]).at[:, :, 2].set(dg[:, :, 1])
        gi = core.kerr_metric_contravariant(0.8, r, jnp.cos(th))
        giM = jnp.zeros((4, 4))
        giM = giM.at[0, 0].set(gi.g00).at[1, 1].set(gi.g11).at[2, 2].set(gi.g22)
        giM = giM.at[3, 3].set(gi.g33).at[0, 3].set(gi.g03).at[3, 0].set(gi.g03)
        # Gamma^i_jk = 1/2 g^il (d_j g_lk + d_k g_lj - d_l g_jk)
        d_ = dgfull.transpose(2, 0, 1)    # d_[mu][a][b] = d_mu g_ab
        G_ad = np.zeros((4, 4, 4))
        d_np = np.asarray(d_)
        gi_np = np.asarray(giM)
        for i in range(4):
            for j in range(4):
                for k in range(4):
                    s = 0.0
                    for l in range(4):
                        s += gi_np[i, l] * (d_np[j, l, k] + d_np[k, l, j] - d_np[l, j, k])
                    G_ad[i, j, k] = 0.5 * s
        G_cl = np.asarray(core.kerr_connection(0.8, r, np.cos(th)))
        _check(G_cl, G_ad, rtol=1e-8, atol=1e-9)


class TestTetrads:
    def test_zamo(self, golden_kerr):
        d = golden_kerr["tzamo"]
        g = core.kerr_metric(d[:, 0], d[:, 1], d[:, 2])
        t = core.tetrad_zamo(g)
        _check(np.asarray(t.e).reshape(len(d), 16), d[:, 3:19])

    def test_azimuthal(self, golden_kerr):
        d = golden_kerr["tazm"]
        g = core.kerr_metric(d[:, 0], d[:, 1], d[:, 2])
        t = core.tetrad_azimuthal(g, d[:, 3])
        _check(np.asarray(t.e).reshape(len(d), 16), d[:, 4:20], rtol=1e-10)

    def test_surface(self, golden_kerr):
        d = golden_kerr["tsurf"]
        g = core.kerr_metric(d[:, 0], d[:, 1], d[:, 2])
        t = core.tetrad_surface(g, d[:, 3], 0.1, 0.05)
        _check(np.asarray(t.e).reshape(len(d), 16), d[:, 4:20], rtol=1e-10)

    def test_orthonormality_and_roundtrip(self):
        rng = np.random.default_rng(2)
        n = 64
        a = rng.uniform(0, 0.999, n)
        r = rng.uniform(2.5, 40, n)
        m = rng.uniform(-0.9, 0.9, n)
        g = core.kerr_metric(a, r, m)
        t = core.tetrad_zamo(g)
        # eta_(ab) = e_(a).e_(b)
        eta = np.asarray([[core.dotprod(t.e[..., i, :], t.e[..., j, :], g)
                           for j in range(4)] for i in range(4)])
        want = np.zeros((4, 4, n))
        want[0, 0] = -1
        want[1, 1] = want[2, 2] = want[3, 3] = 1
        _check(eta, want, rtol=1e-10, atol=1e-10)
        # bl2on . on2bl == id
        v = rng.normal(size=(n, 4))
        v2 = core.bl2on(core.on2bl(v, t), t)
        _check(v2, v, rtol=1e-10, atol=1e-10)


class TestOrbits:
    def test_radii(self, golden_kerr):
        d = golden_kerr["orbit"]
        _check(core.r_bh(d[:, 0]), d[:, 1])
        _check(core.r_ms(d[:, 0]), d[:, 2], rtol=1e-10, atol=1e-10)
        _check(core.r_mb(d[:, 0]), d[:, 3])
        _check(core.r_ph(d[:, 0]), d[:, 4])

    def test_kepler(self, golden_kerr):
        d = golden_kerr["kepler"]
        _check(core.OmegaK(d[:, 1], d[:, 0]), d[:, 2])
        _check(core.ellK(d[:, 1], d[:, 0]), d[:, 3])
        _check(core.omega_r(d[:, 1], d[:, 0]), d[:, 4])
        _check(core.omega_z(d[:, 1], d[:, 0]), d[:, 5])
        _check(core.gfactorK(d[:, 1], d[:, 0],
                             core.ellK(d[:, 1], d[:, 0])), d[:, 6])


class TestPhoton:
    def test_momentum(self, golden_kerr):
        d = golden_kerr["pmom"]
        k = core.photon_momentum(d[:, 0], d[:, 1], d[:, 2], d[:, 3], d[:, 4],
                                 1.0, -1.0)
        _check(k, d[:, 5:9], rtol=1e-10)

    def test_motion_constants_roundtrip(self, golden_kerr):
        d = golden_kerr["pmc"]
        dm = golden_kerr["pmom"]
        l, q = core.photon_motion_constants(dm[:, 0], dm[:, 1], dm[:, 2],
                                            dm[:, 5:9])
        _check(l, d[:, 3], rtol=1e-8)
        _check(q, d[:, 4], rtol=1e-8)

    def test_carter(self, golden_kerr):
        d = golden_kerr["carter"]
        dm = golden_kerr["pmom"]
        g = core.kerr_metric(d[:, 0], d[:, 1], d[:, 2])
        _check(core.photon_carter_const(dm[:, 5:9], g), d[:, 3], rtol=1e-9)

    def test_null_norm(self, golden_kerr):
        dm = golden_kerr["pmom"]
        g = core.kerr_metric(dm[:, 0], dm[:, 1], dm[:, 2])
        kk = core.dotprod(dm[:, 5:9], dm[:, 5:9], g)
        assert np.max(np.abs(np.asarray(kk))) < 1e-10
