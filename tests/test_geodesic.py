"""Golden tests of the analytic geodesic engine vs the C reference.

The golden file geod.txt contains, per geodesic of a (a, incl, alpha, beta)
grid: init results (motion constants, roots, type, theta roots, rp, Rpc,
Tpp, Tip), midplane crossings, and position/momentum samples along the path.
"""

import numpy as np
import pytest

from sim5_tpu import geodesic as gd


def _parse_geod(path):
    """Group the interleaved golden records per geodesic."""
    recs = []
    cur = None
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            vals = [float(v) for v in parts[1:]]
            if tag == "ginit":
                cur = {"init": vals, "mid": [], "pos": [], "pint": [], "tip": None}
                recs.append(cur)
            elif tag == "gtip":
                cur["tip"] = vals[0]
            elif tag == "gmid":
                cur["mid"].append(vals)
            elif tag == "gpos":
                cur["pos"].append(vals)
            elif tag == "gpint":
                cur["pint"].append(vals)
    return recs


@pytest.fixture(scope="module")
def geod_records():
    import pathlib
    return _parse_geod(pathlib.Path(__file__).parent / "golden" / "geod.txt")


@pytest.fixture(scope="module")
def init_ok(geod_records):
    """Geodesics the reference initialized successfully."""
    recs = [r for r in geod_records if r["init"][4] == 1]
    arr = np.asarray([r["init"] for r in recs])
    g = gd.geodesic_init_inf(arr[:, 1], arr[:, 0], arr[:, 2], arr[:, 3])
    return recs, arr, g


def test_init_status_agreement(geod_records):
    arr = np.asarray([r["init"][:6] for r in geod_records])
    g = gd.geodesic_init_inf(arr[:, 1], arr[:, 0], arr[:, 2], arr[:, 3])
    ok_ref = arr[:, 4] == 1
    ok_new = np.asarray(g.status) == 0
    # status agreement on >99% of rays (boundary cases may flip either way)
    assert (ok_ref == ok_new).mean() > 0.99


class TestInit:
    def test_motion_constants(self, init_ok):
        recs, arr, g = init_ok
        # columns: a inc alpha beta ok err l q nrr type r1r r1i ... m2p m2m mm mK rp Rpc Tpp
        np.testing.assert_allclose(np.asarray(g.l), arr[:, 6], rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(g.q), arr[:, 7], rtol=1e-12, atol=1e-14)

    def test_type_and_nrr(self, init_ok):
        recs, arr, g = init_ok
        assert (np.asarray(g.nrr) == arr[:, 8]).mean() > 0.995
        assert (np.asarray(g.gtype) == arr[:, 9]).mean() > 0.995

    def test_roots(self, init_ok):
        recs, arr, g = init_ok
        ref_re = arr[:, [10, 12, 14, 16]]
        ref_im = arr[:, [11, 13, 15, 17]]
        same_type = np.asarray(g.gtype) == arr[:, 9]
        got_re = np.asarray(g.rr)[same_type]
        got_im = np.abs(np.asarray(g.ri))[same_type]
        np.testing.assert_allclose(got_re, ref_re[same_type], rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(got_im, np.abs(ref_im[same_type]), rtol=1e-6, atol=1e-8)

    def test_theta_roots(self, init_ok):
        recs, arr, g = init_ok
        np.testing.assert_allclose(np.asarray(g.m2p), arr[:, 18], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g.m2m), arr[:, 19], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g.mm), arr[:, 20], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g.mK), arr[:, 21], rtol=1e-10)

    def test_rp_Rpc_T(self, init_ok):
        recs, arr, g = init_ok
        same_type = np.asarray(g.gtype) == arr[:, 9]
        np.testing.assert_allclose(np.asarray(g.rp)[same_type], arr[same_type, 22],
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.Rpc)[same_type], arr[same_type, 23],
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.Tpp)[same_type], arr[same_type, 24],
                                   rtol=1e-6, atol=1e-9)
        tip = np.asarray([r["tip"] for r in recs])
        np.testing.assert_allclose(np.asarray(g.Tip)[same_type], tip[same_type],
                                   rtol=1e-6, atol=1e-9)


class TestMidplane:
    def test_midplane_crossings(self, init_ok):
        recs, arr, g = init_ok
        for order in (0, 1):
            ref = np.asarray([r["mid"][order] for r in recs])  # [order P r]
            P = np.asarray(gd.geodesic_find_midplane_crossing(g, order))
            r = np.asarray(gd.geodesic_position_rad(g, P))
            both = np.isfinite(ref[:, 1]) & np.isfinite(P)
            # NaN pattern must agree almost everywhere
            assert (np.isfinite(ref[:, 1]) == np.isfinite(P)).mean() > 0.99
            np.testing.assert_allclose(P[both], ref[both, 1], rtol=1e-6, atol=1e-9)
            rboth = both & np.isfinite(ref[:, 2]) & np.isfinite(r)
            assert (np.isfinite(ref[:, 2])[both] == np.isfinite(r)[both]).mean() > 0.99
            np.testing.assert_allclose(r[rboth], ref[rboth, 2], rtol=1e-6, atol=1e-8)


class TestPositions:
    def test_position_samples(self, init_ok):
        recs, arr, g = init_ok
        idx, Ps, ref = [], [], []
        for i, rec in enumerate(recs):
            for row in rec["pos"]:
                idx.append(i)
                Ps.append(row[0])
                ref.append(row[1:])
        idx = np.asarray(idx)
        Ps = np.asarray(Ps)
        ref = np.asarray(ref)  # [r m phi k0 k1 k2 k3]
        import jax
        take = lambda arr_: np.asarray(arr_)[idx]
        gsub = jax.tree.map(take, g)
        r = np.asarray(gd.geodesic_position_rad(gsub, Ps))
        m = np.asarray(gd.geodesic_position_pol(gsub, Ps))
        ok_r = np.isfinite(ref[:, 0]) & np.isfinite(r)
        assert (np.isfinite(ref[:, 0]) == np.isfinite(r)).mean() > 0.98
        np.testing.assert_allclose(r[ok_r], ref[ok_r, 0], rtol=1e-6, atol=1e-8)
        ok_m = np.isfinite(ref[:, 1]) & np.isfinite(m)
        np.testing.assert_allclose(m[ok_m], ref[ok_m, 1], rtol=1e-5, atol=1e-7)
        # azimuth
        phi = np.asarray(gd.geodesic_position_azm(gsub, r, m, Ps))
        ok_p = np.isfinite(ref[:, 2]) & np.isfinite(phi) & ok_r & ok_m
        frac_ok = np.isclose(phi[ok_p], ref[ok_p, 2], rtol=1e-4, atol=1e-6).mean()
        assert frac_ok > 0.97, f"azm agreement only {frac_ok:.3f}"
        # momentum
        k = np.asarray(gd.geodesic_momentum(gsub, Ps, r, m))
        ok_k = np.isfinite(ref[:, 3]) & np.isfinite(k[:, 0]) & ok_r & ok_m
        np.testing.assert_allclose(k[ok_k], ref[ok_k, 3:7], rtol=1e-5, atol=1e-7)

    def test_P_int_roundtrip(self, init_ok):
        recs, arr, g = init_ok
        idx, rs, ref0, ref1 = [], [], [], []
        for i, rec in enumerate(recs):
            for row in rec["pint"]:
                idx.append(i)
                rs.append(row[0])
                ref0.append(row[1])
                ref1.append(row[2])
        idx = np.asarray(idx)
        import jax
        gsub = jax.tree.map(lambda a_: np.asarray(a_)[idx], g)
        rs = np.asarray(rs)
        ref0, ref1 = np.asarray(ref0), np.asarray(ref1)
        P0 = np.asarray(gd.geodesic_P_int(gsub, rs, 0))
        P1 = np.asarray(gd.geodesic_P_int(gsub, rs, 1))
        ok0 = np.isfinite(ref0) & np.isfinite(P0)
        np.testing.assert_allclose(P0[ok0], ref0[ok0], rtol=1e-6, atol=1e-9)
        ok1 = np.isfinite(ref1) & np.isfinite(P1)
        np.testing.assert_allclose(P1[ok1], ref1[ok1], rtol=1e-6, atol=1e-9)
        # r(P(r)) == r
        rb = np.asarray(gd.geodesic_position_rad(gsub, P0))
        okr = ok0 & np.isfinite(rb)
        np.testing.assert_allclose(rb[okr], rs[okr], rtol=1e-8, atol=1e-9)


class TestInitSrcRoundTrip:
    def test_roundtrip_reproduces_observer(self):
        """init_inf -> midplane crossing -> momentum -> init_src must
        reproduce the motion constants, theta roots and observer
        inclination (reference gate ~1e-5: sim5unittests.c:239-246)."""
        import numpy as np
        n = 128
        rng = np.random.default_rng(17)
        a = rng.uniform(0.1, 0.95, n)
        inc = np.radians(rng.uniform(25, 80, n))
        alpha = rng.uniform(-12, 12, n)
        beta = rng.uniform(0.5, 10, n) * np.sign(rng.uniform(-1, 1, n))
        g = gd.geodesic_init_inf(inc, a, alpha, beta)
        P = np.asarray(gd.geodesic_find_midplane_crossing(g, 0))
        r = np.asarray(gd.geodesic_position_rad(g, P))
        ok = (np.asarray(g.status) == 0) & np.isfinite(P) & np.isfinite(r)
        ppc = (P > np.asarray(g.Rpc)) & ok
        r_s = np.where(ok, r, 10.0)
        m_s = np.zeros(n)
        k = np.asarray(gd.geodesic_momentum(g, np.where(ok, P, 1.0), r_s, m_s))
        ok = ok & np.isfinite(k).all(1)
        g2 = gd.geodesic_init_src(a, r_s, m_s, np.where(ok[:, None], k, 1.0),
                                  ppc.astype(int))
        ok = ok & (np.asarray(g2.status) == 0)
        assert ok.mean() > 0.5
        for field in ("l", "q", "m2p", "m2m", "mK"):
            v1 = np.asarray(getattr(g, field))[ok]
            v2 = np.asarray(getattr(g2, field))[ok]
            np.testing.assert_allclose(v2, v1, rtol=1e-6, atol=1e-8,
                                       err_msg=field)
        ci1 = np.asarray(g.cos_i)[ok]
        ci2 = np.asarray(g2.cos_i)[ok]
        match = np.isclose(ci2, ci1, atol=1e-5)
        assert match.mean() > 0.95, f"cos_i roundtrip {match.mean():.3f}"


class TestTimedelay:
    def test_timedelay_golden(self):
        """Travel time between two positions vs the C reference."""
        import pathlib
        rows = []
        with open(pathlib.Path(__file__).parent / "golden" / "timedelay.txt") as f:
            for line in f:
                parts = line.split()
                if parts and parts[0] == "td":
                    rows.append([float(v) for v in parts[1:]])
        d = np.asarray(rows)
        # columns: a inc alpha beta P1 r1 m1 P2 r2 dt
        g = gd.geodesic_init_inf(d[:, 1], d[:, 0], d[:, 2], d[:, 3])
        dt = np.asarray(gd.geodesic_timedelay(g, d[:, 4], d[:, 5], d[:, 6],
                                              d[:, 7], d[:, 8],
                                              np.zeros(len(d))))
        ref = d[:, 9]
        both = np.isfinite(ref) & np.isfinite(dt)
        assert (np.isfinite(ref) == np.isfinite(dt)).mean() > 0.95
        ok = np.isclose(dt[both], ref[both], rtol=1e-5, atol=1e-7)
        assert ok.mean() > 0.95, (
            f"{(~ok).sum()}/{ok.size} timedelay mismatches; "
            f"max rel {np.max(np.abs(dt[both]-ref[both])/(np.abs(ref[both])+1e-30)):.2e}")
