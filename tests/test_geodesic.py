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
    # no capability regression: every ray the reference initializes, we do
    assert not (ok_ref & ~ok_new).any()
    # we additionally accept rays the reference rejects ONLY through its
    # precision-truncated theta-root gates (round-4 validity-gate slack;
    # PARITY.md known deviations): near-polar alpha ~ 0 rays where m2p
    # rounds to 1.0 (its GD_ERROR_MUPLUS_RANGE = 8) and equator-grazing
    # beta ~ 0 rays (GD_ERROR_MU0_RANGE = 9)
    extra = ~ok_ref & ok_new
    ref_err = arr[:, 5].astype(int)
    assert np.isin(ref_err[extra], (8, 9)).all(), (
        f"unexpected extra acceptances: codes {set(ref_err[extra])}")


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
        # intentional deviations from the reference, excluded from parity:
        # * q<0 (vortical) Tip uses the dn-form integral -- the reference's
        #   cn-form is wrong there, proven against the stepwise integrator
        #   (TestBeyondReferenceInversions::test_cc_vortical_matches_stepwise)
        # * CC-type Rpc: the reference folds the tangent map at its pole
        #   and is wrong for every radius above r* (validated vs direct
        #   quadrature in test_cc_P_int_matches_quadrature)
        qpos = same_type & (arr[:, 7] > 0)
        not_cc = qpos & (arr[:, 9] != gd.GEOD_TYPE_CC)
        np.testing.assert_allclose(np.asarray(g.rp)[same_type], arr[same_type, 22],
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.Rpc)[not_cc], arr[not_cc, 23],
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.Tpp)[same_type], arr[same_type, 24],
                                   rtol=1e-6, atol=1e-9)
        tip = np.asarray([r["tip"] for r in recs])
        np.testing.assert_allclose(np.asarray(g.Tip)[qpos], tip[qpos],
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
        # vortical (q<0) samples deviate intentionally: the reference's
        # cn-form m(P) is wrong for q<0 (proven vs the stepwise engine,
        # TestBeyondReferenceInversions); the dn-form here is the fix
        qpos = np.asarray(gsub.q) > 0
        ok_r = np.isfinite(ref[:, 0]) & np.isfinite(r)
        assert (np.isfinite(ref[:, 0]) == np.isfinite(r)).mean() > 0.98
        np.testing.assert_allclose(r[ok_r], ref[ok_r, 0], rtol=1e-6, atol=1e-8)
        ok_m = np.isfinite(ref[:, 1]) & np.isfinite(m) & qpos
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


class TestFollow:
    def test_follow_small_step_ok(self):
        g = gd.geodesic_init_inf(np.radians(60.0), 0.5, 4.0, 2.0)
        P0 = gd.geodesic_P_int(g, 1000.0, 0)
        r0 = gd.geodesic_position_rad(g, P0)
        m0 = gd.geodesic_position_pol(g, P0)
        P, r, m, st = gd.geodesic_follow(g, 1.0, P0, r0, m0)
        assert int(st) == gd.FOLLOW_OK
        assert float(r) < float(r0)  # moving inward

    def test_follow_huge_step_reports_not_converged(self):
        """A step larger than the substep budget can consume must be flagged
        (the reference's while-loop has no cap, sim5kerr-geod.c:890-925,
        so silent truncation would be a divergence)."""
        g = gd.geodesic_init_inf(np.radians(60.0), 0.5, 4.0, 2.0)
        P0 = gd.geodesic_P_int(g, 1000.0, 0)
        r0 = gd.geodesic_position_rad(g, P0)
        m0 = gd.geodesic_position_pol(g, P0)
        # max substep is 5e-2*sqrt(r) ~ 1.6 at r=1000, so 64 substeps cover
        # ~100 affine units at most; ask for 1e4
        P, r, m, st = gd.geodesic_follow(g, 1e4, P0, r0, m0)
        assert int(st) == gd.FOLLOW_NOT_CONVERGED
        # raising the budget must let the same step make further progress
        P2, r2, m2, st2 = gd.geodesic_follow(g, 1e4, P0, r0, m0,
                                             max_substeps=256)
        assert float(P2) > float(P)


class TestTimedelayFull:
    """The full (radial + poloidal) travel time, validated against the
    stepwise integrator's coordinate-time accumulation -- the theta part
    is disabled in the reference (sim5kerr-geod.c:663-702), so the march
    is the only oracle."""

    @staticmethod
    def _march_cross_time(a, incl, alpha, beta, r_far, precision=0.01):
        import jax
        import jax.numpy as jnp
        from sim5_tpu.march import raytrace_prepare, raytrace_step

        g = gd.geodesic_init_inf(incl, a, alpha, beta)
        P1 = gd.geodesic_P_int(g, jnp.full_like(g.a, r_far), 0)
        r1 = gd.geodesic_position_rad(g, P1)
        m1 = gd.geodesic_position_pol(g, P1)
        ok = (g.status == 0) & jnp.isfinite(P1) & jnp.isfinite(r1)
        r1s = jnp.where(ok, r1, 10.0)
        m1s = jnp.where(ok, m1, 0.1)
        k = gd.geodesic_momentum(g, jnp.where(ok, P1, 1e-3), r1s, m1s)
        k = k.at[..., 2].multiply(-1.0)
        k = jnp.where(ok[..., None], k, jnp.stack(
            [jnp.ones_like(r1s), -jnp.ones_like(r1s), jnp.zeros_like(r1s),
             jnp.zeros_like(r1s)], -1))
        x0 = jnp.stack([jnp.zeros_like(r1s), r1s, m1s,
                        jnp.zeros_like(r1s)], -1)
        st = raytrace_prepare(a, x0, k, precision=precision)

        def body(carry):
            st, t_cross, active, it, xprev = carry
            st2, _dl = raytrace_step(st, active=active)
            m_new, m_old = st2.x[..., 2], xprev[..., 2]
            crossed = active & (m_new <= 0.0) & (m_old > 0.0)
            w = m_old / jnp.maximum(m_old - m_new, 1e-30)
            tc = xprev[..., 0] + w * (st2.x[..., 0] - xprev[..., 0])
            t_cross = jnp.where(crossed, tc, t_cross)
            active = (active & ~crossed & (st2.x[..., 1] > 1.1)
                      & (st2.x[..., 1] < 2.0 * r_far) & (st2.error < 1e-2))
            return st2, t_cross, active, it + 1, st2.x

        def cond(carry):
            _, _, active, it, _ = carry
            return jnp.any(active) & (it < 60000)

        t0 = jnp.full_like(r1s, np.nan)
        _, t_cross, _, _, _ = jax.lax.while_loop(
            cond, body, (st, t0, ok, jnp.asarray(0), st.x))
        return g, P1, r1, m1, t_cross

    def test_grid_agreement_vs_march(self):
        """50x50 impact-parameter grid: |dt_analytic - dt_march|/dt < 1e-3
        (VERDICT round-1 gate).  Measured agreement is ~1e-6 of the total
        (march precision limited); the radial-only delay misses by up to
        ~1e-3 of the total at this inclination, so the gate also proves
        the theta term is actually present."""
        a, incl = 0.7, np.radians(70.0)
        n = 50
        al = np.linspace(-9.0, 9.0, n)
        be = np.linspace(0.5, 9.0, n)
        A, B = [x.ravel() for x in np.meshgrid(al, be)]
        g, P1, r1, m1, t_march = self._march_cross_time(a, incl, A, B, 300.0)

        P2 = gd.geodesic_find_midplane_crossing(g, 0)
        r2 = gd.geodesic_position_rad(g, P2)
        dt = gd.geodesic_timedelay_full(g, P1, r1, m1, P2, r2,
                                        np.zeros(len(A)))
        dt = np.asarray(dt)
        tm = np.abs(np.asarray(t_march))
        ok = np.isfinite(dt) & np.isfinite(tm)
        assert ok.sum() > 0.8 * n * n
        rel = np.abs(dt[ok] - tm[ok]) / tm[ok]
        assert rel.max() < 1e-3, f"max rel delay error {rel.max():.2e}"
        # and the theta part is non-trivial: radial-only must be worse
        dt_rad = np.asarray(gd.geodesic_timedelay(
            g, P1, r1, m1, P2, r2, np.zeros(len(A))))
        rel_rad = np.abs(dt_rad[ok] - tm[ok]) / tm[ok]
        assert rel_rad.max() > 3.0 * rel.max()

    def test_farfield_anchor_consistency(self):
        """Relative delays anchored at two different far-field radii (with
        the b^2/2R wavefront correction) must agree -- validates the
        far-field expansion used by render/lightcurve.py."""
        a, incl = 0.9, np.radians(60.0)
        al = np.linspace(-8.0, 8.0, 15)
        be = np.linspace(0.5, 8.0, 15)
        A, B = [x.ravel() for x in np.meshgrid(al, be)]
        g = gd.geodesic_init_inf(incl, a, A, B)
        P2 = gd.geodesic_find_midplane_crossing(g, 0)
        r2 = gd.geodesic_position_rad(g, P2)
        hit = np.isfinite(np.asarray(r2)) & (np.asarray(g.status) == 0)

        def delays(R_FAR):
            P1 = gd.geodesic_P_int(g, np.full(len(A), R_FAR), 0)
            r1 = gd.geodesic_position_rad(g, P1)
            m1 = gd.geodesic_position_pol(g, P1)
            dt = gd.geodesic_timedelay_full(
                g, np.where(hit, np.asarray(P2), 1.0),
                np.where(hit, np.asarray(r2), 10.0), np.zeros(len(A)),
                P1, r1, m1)
            dt = np.asarray(dt) + (A ** 2 + B ** 2) / (2.0 * R_FAR)
            return dt - dt[hit].min()

        d1 = delays(1e4)
        d2 = delays(4e4)
        span = d1[hit].max() - d1[hit].min()
        assert span > 1.0
        assert np.abs(d1[hit] - d2[hit]).max() < 1e-3 * span


class TestBeyondReferenceInversions:
    """Position inversions for the trajectory types the reference leaves
    NaN (RR_BH bound-band and CC plunging rays, sim5kerr-geod.c:322-352)
    plus the dn-form poloidal motion of vortical (q < 0) rays.  No C
    oracle exists; the oracles are direct quadrature of 1/sqrt(R) and the
    stepwise integrator."""

    def _march_chunks(self, a, x0, k0, n_chunks=300, per=20,
                      precision=0.003, r_stop=1.95):
        """March one ray in chunks, yielding (r, m) samples."""
        import jax.numpy as jnp
        from sim5_tpu.march import raytrace_prepare, raytrace
        st = raytrace_prepare(np.float64(a), x0[None, :], k0[None, :],
                              precision=precision)
        out = []
        for _ in range(n_chunks):
            st, act = raytrace(st, r_max=100.0, max_steps=per)
            st = st._replace(steps=jnp.zeros_like(st.steps))
            rv, mv = float(st.x[0, 1]), float(st.x[0, 2])
            if not np.isfinite(rv):
                break
            out.append((rv, mv))
            if not bool(act[0]) or rv < r_stop:
                break
        return out

    @pytest.fixture(scope="class")
    def cc_vortical(self):
        """A CC-type vortical (q < 0) ray from infinity: a=0.5, incl=60deg,
        alpha=-0.3, beta=0.124375 (found by type scan; q = -0.0245)."""
        g = gd.geodesic_init_inf(np.radians(60.0), 0.5, -0.3, 0.124375)
        assert int(g.gtype) == gd.GEOD_TYPE_CC and int(g.status) == 0
        assert float(g.q) < 0.0
        return g

    def test_cc_P_int_matches_quadrature(self, cc_vortical):
        """The corrected CC position integral (monotone continuation past
        the tangent-map pole; the reference's even itn folds it back and
        returns negative P) against direct numerical quadrature."""
        g = cc_vortical
        a, l, q = 0.5, float(g.l), float(g.q)

        def P_num(r):
            ts = np.linspace(1e-9, 1 - 1e-9, 200001)
            rr = r + ts / (1 - ts)
            R = (rr ** 4 + (a * a - l * l - q) * rr ** 2
                 + 2 * (q + (l - a) ** 2) * rr - a * a * q)
            return np.trapezoid(1.0 / np.sqrt(R) / (1 - ts) ** 2, ts)

        for r in (30.0, 8.0, 4.0, 2.0):
            P = float(gd.geodesic_P_int(g, np.float64(r), 0))
            assert P > 0.0
            assert abs(P - P_num(r)) < 1e-6

    def test_cc_position_rad_roundtrip(self, cc_vortical):
        g = cc_vortical
        r = np.array([50.0, 20.0, 5.0, 2.5, 2.0])
        P = gd.geodesic_P_int(g, r, 0)
        # monotone: deeper radius = larger P
        assert (np.diff(np.asarray(P)) > 0).all()
        r2 = np.asarray(gd.geodesic_position_rad(g, P))
        np.testing.assert_allclose(r2, r, rtol=1e-10)

    @pytest.mark.parametrize("beta", [0.124375, -0.124375])
    def test_cc_vortical_matches_stepwise(self, beta):
        """March the same (l, q) ray with the stepwise engine: the
        analytic r(P) and the dn-form m(P) must track the integrated
        trajectory (the reference's cn-form theta gives O(3e-2) errors
        here and its r(P) is NaN)."""
        import jax.numpy as jnp
        g = gd.geodesic_init_inf(np.radians(60.0), 0.5, -0.3, beta)
        assert float(g.q) < 0.0
        r0 = 30.0
        P0 = gd.geodesic_P_int(g, np.float64(r0), 0)
        m0 = gd.geodesic_position_pol(g, P0)
        k = gd.geodesic_momentum(g, P0)
        km = k.at[2].set(-k[2])  # analytic k[2] signs dm; march uses theta
        x0 = jnp.array([0.0, r0, float(m0), 0.0])
        samples = self._march_chunks(0.5, x0, km)
        assert len(samples) > 50
        for rv, mv in samples[::10]:
            P = gd.geodesic_P_int(g, np.float64(rv), 0)
            assert abs(float(gd.geodesic_position_rad(g, P)) - rv) < 1e-8
            assert abs(float(gd.geodesic_position_pol(g, P)) - mv) < 1e-6
        # vortical: never crosses the equator, bounded by the theta roots
        ms = np.array([m for _, m in samples])
        assert (ms > 0).all()
        lo = np.sqrt(-float(g.m2m)) - 1e-9
        hi = np.sqrt(float(g.m2p)) + 1e-9
        assert ((ms >= lo) & (ms <= hi)).all()

    @pytest.fixture(scope="class")
    def bh_band(self):
        """An RR_BH bound-band geodesic: spherical-photon-orbit constants
        at r=2.5 (a=0.9) with q raised by 0.3 to open the band, source
        point r=1.8 inside it."""
        from sim5_tpu.core import photon_momentum
        a, rs, m0 = 0.9, 1.8, 0.1
        l = (2.5 ** 2 * (3 - 2.5) - a ** 2 * (2.5 + 1)) / (a * (2.5 - 1))
        q = 2.5 ** 3 * (4 * a ** 2 - 2.5 * (2.5 - 3) ** 2) \
            / (a ** 2 * (2.5 - 1) ** 2) + 0.3
        k = photon_momentum(a, rs, m0, l, q, 1.0, 1.0)
        g = gd.geodesic_init_src(a, np.float64(rs), np.float64(m0), k, 1)
        assert int(g.gtype) == gd.GEOD_TYPE_RR_BH and int(g.status) == 0
        return g, a, rs, m0, k

    def test_bh_band_roundtrip_and_periodicity(self, bh_band):
        g, a, rs, m0, k = bh_band
        r3, r2 = float(g.rr[2]), float(g.rr[1])
        Rpc = float(g.Rpc)
        assert abs(float(g.rp) - r2) < 1e-12  # apastron
        for frac in (0.1, 0.4, 0.99, 1.3, 1.9):
            P = frac * Rpc
            r = float(gd.geodesic_position_rad(g, P))
            assert r3 - 1e-9 <= r <= r2 + 1e-9
            P2 = float(gd.geodesic_P_int(g, r, 1.0 if P > Rpc else 0.0))
            assert abs(P2 - P) < 1e-12
        # apastron at P = Rpc; symmetric about it; exactly periodic
        assert abs(float(gd.geodesic_position_rad(g, 0.99 * Rpc))
                   - float(gd.geodesic_position_rad(g, 1.01 * Rpc))) < 1e-10
        P = 0.37 * Rpc
        assert abs(float(gd.geodesic_position_rad(g, P + 2 * Rpc))
                   - float(gd.geodesic_position_rad(g, P))) < 1e-12

    def test_bh_band_apastron_matches_stepwise(self, bh_band):
        """The marched trajectory must rise to the analytic apastron r2
        and then plunge through the horizon."""
        import jax.numpy as jnp
        g, a, rs, m0, k = bh_band
        km = k.at[2].set(-k[2])
        x0 = jnp.array([0.0, rs, m0, 0.0])
        samples = self._march_chunks(a, x0, km, n_chunks=150, per=100,
                                     precision=0.01, r_stop=1.46)
        rr = np.array([r for r, _ in samples])
        r2 = float(g.rr[1])
        assert abs(rr.max() - r2) < 1e-3          # reaches apastron
        assert rr[-1] < 1.6                        # then plunges


class TestShadow:
    """geodesic_is_captured vs the exact Bardeen (1973) shadow boundary:
    spherical-photon-orbit constants xi(rs), eta(rs) map to the image
    plane as alpha = -xi/sin i, beta^2 = q - cos^2 i (alpha^2 - a^2);
    points just inside that curve must be captured, just outside escape."""

    @pytest.mark.parametrize("a,inc_deg", [(0.2, 60.0), (0.9, 80.0),
                                           (0.998, 80.0)])
    def test_capture_boundary(self, a, inc_deg):
        inc = np.radians(inc_deg)
        # exact photon-orbit radius range (Bardeen 1973)
        r_ph_pro = 2.0 * (1.0 + np.cos(2.0 / 3.0 * np.arccos(-a)))
        r_ph_ret = 2.0 * (1.0 + np.cos(2.0 / 3.0 * np.arccos(a)))
        rs = np.linspace(r_ph_ret * 1.0005, r_ph_pro * 0.9995, 400)
        xi = (rs ** 2 * (3 - rs) - a ** 2 * (rs + 1)) / (a * (rs - 1))
        eta = rs ** 3 * (4 * a ** 2 - rs * (rs - 3) ** 2) \
            / (a ** 2 * (rs - 1) ** 2)
        alpha = -xi / np.sin(inc)
        beta2 = eta + np.cos(inc) ** 2 * (a ** 2 - alpha ** 2) \
            + (1 - np.cos(inc) ** 2) * 0.0
        # beta^2 = q - cos^2 i (alpha^2 - a^2) with q = eta:
        beta2 = eta - np.cos(inc) ** 2 * (alpha ** 2 - a ** 2)
        keep = beta2 > 0.05
        alpha, beta = alpha[keep], np.sqrt(beta2[keep])
        assert keep.sum() > 100
        for eps, want in ((1 - 2e-4, True), (1 + 2e-4, False)):
            g = gd.geodesic_init_inf(inc, a, eps * alpha, eps * beta)
            cap = np.asarray(gd.geodesic_is_captured(g))
            ok = np.asarray(g.status) == 0
            frac = (cap[ok] == want).mean()
            assert frac > 0.995, (eps, want, frac)

    def test_schwarzschild_radius(self):
        """a -> 0: capture radius must be sqrt(27) M for any direction."""
        inc = np.radians(70.0)
        for ang in (0.3, 1.2, 2.0):
            d = np.array([np.cos(ang), np.sin(ang)])
            lo, hi = 4.0, 6.0
            for _ in range(40):
                mid = 0.5 * (lo + hi)
                g = gd.geodesic_init_inf(inc, 1e-3, mid * d[0], mid * d[1])
                if bool(gd.geodesic_is_captured(g)):
                    lo = mid
                else:
                    hi = mid
            assert abs(0.5 * (lo + hi) - np.sqrt(27.0)) < 5e-3


class TestFullTypeSurface:
    """phi(P) and t(P) over the full trajectory-type surface (RR_BH band,
    CC plunges, vortical q<0 rays) -- the types the reference NaNs
    (sim5kerr-geod.c:489-521, 600-707).  Oracles: direct quadrature of the
    radial integrands (CC has no real roots, so the r-space integrand is
    smooth) and the stepwise integrator's phi / coordinate-time columns."""

    def _march_track(self, a, x0, k0, n_chunks=400, per=20,
                     precision=0.003, r_stop=1.95):
        """March one ray in chunks, yielding (t, r, m, phi) samples."""
        import jax.numpy as jnp
        from sim5_tpu.march import raytrace_prepare, raytrace
        st = raytrace_prepare(np.float64(a), x0[None, :], k0[None, :],
                              precision=precision)
        out = []
        for _ in range(n_chunks):
            st, act = raytrace(st, r_max=400.0, max_steps=per)
            st = st._replace(steps=jnp.zeros_like(st.steps))
            tv, rv, mv, pv = np.asarray(st.x[0])
            if not np.isfinite(rv):
                break
            out.append((tv, rv, mv, pv))
            if not bool(act[0]) or rv < r_stop:
                break
        return out

    def test_cc_radial_integrals_vs_quadrature(self):
        """Gauss-in-u CC radial phi/t integrals vs direct r-space
        quadrature (smooth integrand: no real roots)."""
        g = gd.geodesic_init_inf(np.radians(60.0), 0.5, -0.3, 0.124375)
        assert int(g.gtype) == gd.GEOD_TYPE_CC
        from sim5_tpu.geodesic.analytic import (_cc_setup, _cc_phi_radial,
                                                _cc_time_radial)
        a, l, q = float(g.a), float(g.l), float(g.q)
        a2 = a * a
        sq = np.sqrt(1 - a2)
        rph, rmh = 1 + sq, 1 - sq
        cp = (a * rph - l * a2 / 2) / sq
        cm = (a * rmh - l * a2 / 2) / sq
        Ac = (-a * l + 4) * rph - 2 * a2
        Bc = (a * l - 4) * rmh + 2 * a2

        def R(r):
            return (r ** 4 + (a2 - l * l - q) * r ** 2
                    + 2 * (q + (l - a) ** 2) * r - a2 * q)

        cc = _cc_setup(g)

        def quad_phi(y):
            # infinity-side: substitute r = y + s/(1-s)
            s = np.linspace(1e-12, 1 - 1e-9, 4000001)
            r = y + s / (1 - s)
            f = cp / (r - rph) - cm / (r - rmh)
            return np.trapezoid(f / np.sqrt(R(r)) / (1 - s) ** 2, s)

        for y in (2.2, 5.0, 60.0):
            P = float(gd.geodesic_P_int(g, np.float64(y), 0))
            got = float(_cc_phi_radial(g, cc, np.float64(P)))
            want = quad_phi(y)
            assert abs(got - want) < 1e-8, (y, got, want)

        def quad_t(y1, y2):
            r = np.linspace(y1, y2, 4000001)
            f = (r * r + 2 * r + 4
                 + (Ac / (r - rph) + Bc / (r - rmh)) / sq)
            return np.trapezoid(f / np.sqrt(R(r)), r)

        for (y1, y2) in ((2.2, 8.0), (3.0, 250.0)):
            P1 = float(gd.geodesic_P_int(g, np.float64(y1), 0))
            P2 = float(gd.geodesic_P_int(g, np.float64(y2), 0))
            got = float(_cc_time_radial(g, cc, np.float64(P1),
                                        np.float64(P2)))
            want = quad_t(y1, y2)
            assert abs(got - want) < 1e-7 * max(1.0, abs(want)), \
                (y1, y2, got, want)

    @pytest.mark.parametrize("beta", [0.124375, -0.124375])
    def test_cc_vortical_phi_time_vs_march(self, beta):
        """CC + vortical: Delta-phi and Delta-t along the ray must track the
        stepwise integrator (reference: NaN for both)."""
        import jax.numpy as jnp
        g = gd.geodesic_init_inf(np.radians(60.0), 0.5, -0.3, beta)
        assert int(g.gtype) == gd.GEOD_TYPE_CC and float(g.q) < 0.0
        r0 = 30.0
        P0 = gd.geodesic_P_int(g, np.float64(r0), 0)
        m0 = gd.geodesic_position_pol(g, P0)
        k = gd.geodesic_momentum(g, P0)
        km = k.at[2].set(-k[2])
        x0 = jnp.array([0.0, r0, float(m0), 0.0])
        track = self._march_track(0.5, x0, km)
        assert len(track) > 50
        phi0 = float(gd.geodesic_position_azm(
            g, np.float64(r0), np.float64(m0), P0))
        # one BATCHED evaluation over all samples (azm broadcasts over P)
        tv, rv, mv, pv = (np.asarray(c) for c in zip(*track[5::10]))
        P = gd.geodesic_P_int(g, rv, 0)
        phi = np.asarray(gd.geodesic_position_azm(g, rv, mv, P))
        dt = np.asarray(gd.geodesic_timedelay_full(
            g, np.broadcast_to(np.asarray(P0), P.shape),
            np.full_like(rv, r0), np.full_like(rv, float(m0)),
            P, rv, mv))
        # march phi accumulates from 0 at the start point
        assert (np.abs((phi - phi0) - pv)
                < 2e-3 * np.maximum(1.0, np.abs(pv))).all(), \
            (rv, phi - phi0, pv)
        assert (np.abs(dt - np.abs(tv))
                < 2e-3 * np.maximum(1.0, np.abs(tv))).all(), (rv, dt, tv)

    def test_bh_band_phi_time_vs_march(self):
        """RR_BH bound band: Delta-phi / Delta-t between band positions
        track the march (reference: NaN)."""
        import jax.numpy as jnp
        from sim5_tpu.core import photon_momentum
        a, rs, m0 = 0.9, 1.8, 0.1
        l = (2.5 ** 2 * (3 - 2.5) - a ** 2 * (2.5 + 1)) / (a * (2.5 - 1))
        q = 2.5 ** 3 * (4 * a ** 2 - 2.5 * (2.5 - 3) ** 2) \
            / (a ** 2 * (2.5 - 1) ** 2) + 0.3
        k = photon_momentum(a, rs, m0, l, q, 1.0, 1.0)
        # the start point moves OUTWARD (toward the apastron): in the band
        # parametrization that is the ascending P in [0, Rpc] branch, i.e.
        # pre-apastron ppc=0 (P_int returns Rpc - R there; ppc=1 is the
        # post-apastron descending branch)
        g = gd.geodesic_init_src(a, np.float64(rs), np.float64(m0), k, 0)
        assert int(g.gtype) == gd.GEOD_TYPE_RR_BH and int(g.status) == 0
        km = k.at[2].set(-k[2])
        x0 = jnp.array([0.0, rs, m0, 0.0])
        # outward to apastron and back down; stop above the horizon
        track = self._march_track(a, x0, km, n_chunks=600, per=20,
                                  precision=0.003, r_stop=1.55)
        assert len(track) > 50
        P0 = float(gd.geodesic_P_int(g, np.float64(rs), 0))
        phi0 = float(gd.geodesic_position_azm(
            g, np.float64(rs), np.float64(m0), np.float64(P0)))
        r2 = float(g.rr[1])
        tv_a, rv_a, mv_a, pv_a = (np.asarray(c) for c in zip(*track))
        # branch bookkeeping: outward until the apastron, then descending
        # (the band P parametrization maps the second pass to 2*Rpc - P)
        imax = int(np.argmax(rv_a))
        assert abs(rv_a[imax] - r2) < 1e-3    # reaches the apastron
        sel = np.arange(3, len(rv_a), 8)
        sel = sel[np.abs(rv_a[sel] - r2) > 1e-4]   # skip the turning point
        tv, rv, mv, pv = tv_a[sel], rv_a[sel], mv_a[sel], pv_a[sel]
        # ascending (pre-apastron) samples use ppc=0, descending ppc=1
        ppc = np.where(sel <= imax, 0.0, 1.0)
        P = np.asarray(gd.geodesic_P_int(g, rv, ppc))
        phi = np.asarray(gd.geodesic_position_azm(g, rv, mv, P))
        dt = np.asarray(gd.geodesic_timedelay_full(
            g, np.full_like(rv, P0), np.full_like(rv, rs),
            np.full_like(rv, m0), P, rv, mv))
        assert (np.abs((phi - phi0) - pv)
                < 4e-3 * np.maximum(1.0, np.abs(pv))).all(), \
            (rv, phi - phi0, pv)
        assert (np.abs(dt - np.abs(tv))
                < 4e-3 * np.maximum(1.0, np.abs(tv))).all(), (rv, dt, tv)

    def test_rr_multifold_phi_vs_march(self):
        """A q>0 RR ray followed through the periastron and back out with
        >1 theta oscillation: the fully folded theta term must track the
        march where the reference's single-break bookkeeping would not."""
        import jax.numpy as jnp
        a, incl = 0.9, np.radians(80.0)
        # near-critical impact parameters: long winding near the photon
        # sphere gives multiple theta folds
        al = np.linspace(-2.5, -2.0, 101)
        gs = gd.geodesic_init_inf(incl, a, al, np.full_like(al, 3.0))
        ok = ((np.asarray(gs.gtype) == gd.GEOD_TYPE_RR)
              & (np.asarray(gs.status) == 0)
              & ~np.asarray(gd.geodesic_is_captured(gs))
              & (np.asarray(gs.rp) > 2.2))
        ratio = np.where(ok, np.asarray(gs.Rpc) / np.asarray(gs.Tpp), -1.0)
        assert ratio.max() > 1.05, ratio.max()
        g = gd.geodesic_init_inf(incl, a, float(al[np.argmax(ratio)]), 3.0)
        r0 = 60.0
        P0 = gd.geodesic_P_int(g, np.float64(r0), 0)
        m0 = gd.geodesic_position_pol(g, P0)
        k = gd.geodesic_momentum(g, P0)
        km = k.at[2].set(-k[2])
        x0 = jnp.array([0.0, r0, float(m0), 0.0])
        track = self._march_track(a, x0, km, n_chunks=2500, per=40,
                                  precision=0.003, r_stop=1.95)
        rr = np.array([r for _, r, _, _ in track])
        assert rr.min() < float(g.rp) + 0.2      # reached periastron region
        assert rr[-1] > 30.0                     # and came back out
        phi0 = float(gd.geodesic_position_azm(
            g, np.float64(r0), np.float64(m0), P0))
        # branch (pre/post periastron) from where the march radius bottomed
        imin = int(np.argmin(rr))
        tv_a, rv_a, mv_a, pv_a = (np.asarray(c) for c in zip(*track))
        sel = np.arange(5, len(track) - 1, 25)
        sel = sel[np.abs(rv_a[sel] - float(g.rp)) > 1e-4]
        tv, rv, mv, pv = tv_a[sel], rv_a[sel], mv_a[sel], pv_a[sel]
        ppc = np.where(sel > imin, 1.0, 0.0)
        P = np.asarray(gd.geodesic_P_int(g, rv, ppc))
        phi = np.asarray(gd.geodesic_position_azm(g, rv, mv, P))
        dt = np.asarray(gd.geodesic_timedelay_full(
            g, np.broadcast_to(np.asarray(P0), P.shape),
            np.full_like(rv, r0), np.full_like(rv, float(m0)), P, rv, mv))
        assert (np.abs((phi - phi0) - pv)
                < 3e-3 * np.maximum(1.0, np.abs(pv))).all(), \
            (rv, phi - phi0, pv)
        assert (np.abs(dt - np.abs(tv))
                < 3e-3 * np.maximum(1.0, np.abs(tv))).all()
        assert len(sel) >= 8
        # the ray really does fold more than once in theta
        n_folds, _ = np.asarray(
            __import__("sim5_tpu.geodesic.analytic", fromlist=["x"])
            ._theta_fold(g, gd.geodesic_P_int(g, np.float64(rr[-1]), 1)))
        assert float(n_folds) >= 2.0
