"""Tests for the L1 numerics layer: interpolation, quadrature, roots,
distributions (vs the reference's test strategy: sim5unittests.c
test__interpolation / test__gauss_distribution)."""

import numpy as np
import jax
import jax.numpy as jnp

from sim5_tpu import special as sp


class TestInterp:
    def test_spline_gaussian(self):
        # reference test__interpolation (sim5unittests.c:271-297): spline
        # interpolation of a Gaussian reproduces analytic values
        x = np.linspace(-4, 4, 60)
        y = np.exp(-x * x / 2)
        tab = sp.interp_init(x, y, sp.INTERP_TYPE_SPLINE)
        xq = np.linspace(-3.9, 3.9, 301)
        got = np.asarray(sp.interp_eval(tab, xq))
        want = np.exp(-xq * xq / 2)
        assert np.max(np.abs(got - want)) < 2e-4

    def test_linear_and_loglog(self):
        x = np.geomspace(1, 100, 64)
        y = x ** -2.5
        lin = sp.interp_init(x, y, sp.INTERP_TYPE_LINLIN)
        log = sp.interp_init(x, y, sp.INTERP_TYPE_LOGLOG)
        xq = np.geomspace(1.5, 90, 50)
        np.testing.assert_allclose(np.asarray(sp.interp_eval(log, xq)),
                                   xq ** -2.5, rtol=1e-10)
        # linear interp of a power law has bounded error on this grid
        assert np.max(np.abs(np.asarray(sp.interp_eval(lin, xq))
                             - xq ** -2.5) / xq ** -2.5) < 0.02

    def test_incremental_build(self):
        # reference INTERP_DATA_BUILD / sim5_interp_data_push
        # (sim5interpolation.c:271,296-322): push samples one at a time,
        # then evaluate; unordered pushes are rejected
        import pytest
        b = sp.interp_init_build(sp.INTERP_TYPE_SPLINE)
        x = np.linspace(-4, 4, 60)
        for xi in x:
            b.push(xi, np.exp(-xi * xi / 2))
        assert len(b) == 60
        tab = b.finalize()
        xq = np.linspace(-3.9, 3.9, 101)
        got = np.asarray(sp.interp_eval(tab, xq))
        assert np.max(np.abs(got - np.exp(-xq * xq / 2))) < 2e-4
        with pytest.raises(ValueError):
            sp.interp_init_build().push(1.0, 0.0).push(0.5, 0.0)
        with pytest.raises(ValueError):
            sp.interp_init_build().push(1.0, 0.0).finalize()

    def test_extrapolation_policy(self):
        x = np.linspace(0, 1, 10)
        tab = sp.interp_init(x, x, sp.INTERP_TYPE_LINLIN)
        assert np.isnan(float(sp.interp_eval(tab, 1.5)))
        tab2 = sp.interp_init(x, x, sp.INTERP_TYPE_LINLIN,
                              options=sp.INTERP_OPT_ALLOW_EXTRAPOLATION)
        assert np.isclose(float(sp.interp_eval(tab2, 1.5)), 1.5)


class TestQuadrature:
    def test_simpson(self):
        val = float(sp.integrate_simpson(jnp.sin, 0.0, jnp.pi, 512))
        assert abs(val - 2.0) < 1e-10

    def test_trapezoid(self):
        val = float(sp.integrate_trapezoid(lambda x: x ** 2, 0.0, 1.0, 4096))
        assert abs(val - 1.0 / 3.0) < 1e-7

    def test_gauleg(self):
        x, w = sp.gauleg(0.0, 2.0, 20)
        assert abs(float(jnp.sum(w * x ** 5)) - 64.0 / 6.0) < 1e-10


class TestRoots:
    def test_rtbis(self):
        root = float(sp.rtbis(lambda x: x ** 3 - 2.0, 0.0, 10.0))
        assert abs(root - 2.0 ** (1 / 3)) < 1e-12

    def test_rtbis_batched(self):
        c = jnp.asarray([1.0, 8.0, 27.0])
        roots = np.asarray(sp.rtbis(lambda x: x ** 3 - c,
                                    jnp.zeros(3), jnp.full(3, 10.0)))
        np.testing.assert_allclose(roots, [1.0, 2.0, 3.0], rtol=1e-12)


class TestDistributions:
    def test_gauss_sampling(self):
        # reference test__gauss_distribution (sim5unittests.c:301-339):
        # samples from an inverse-CDF table follow the PDF
        d = sp.distrib_init(lambda x: jnp.exp(-x * x / 2), -6.0, 6.0)
        key = jax.random.PRNGKey(0)
        s = np.asarray(d.sample(key, (200000,)))
        assert abs(s.mean()) < 0.02
        assert abs(s.std() - 1.0) < 0.01
        # icdf of median is ~0
        assert abs(float(d.icdf(0.5))) < 1e-3


class TestAccurateLog:
    """utils/fastmath.log_accurate: software f32 log with exact exponent
    split + atanh series (XLA's TPU f32 log is ~1e-4 relative; this one
    restores ~2 ulp, which the fast-render accuracy gate relies on)."""

    def test_f32_accuracy_vs_f64(self):
        import jax
        from sim5_tpu.utils.fastmath import log_accurate
        rng = np.random.default_rng(0)
        y64 = rng.lognormal(0.0, 6.0, 100000)
        with jax.enable_x64(False):
            la = np.float64(np.asarray(jax.jit(log_accurate)(
                jnp.asarray(y64, jnp.float32))))
        ref = np.log(y64.astype(np.float32).astype(np.float64))
        rel = np.abs(la - ref) / np.maximum(np.abs(ref), 1e-6)
        assert rel.max() < 5e-7

    def test_edge_cases(self):
        import jax
        from sim5_tpu.utils.fastmath import log_accurate
        with jax.enable_x64(False):
            vals = np.asarray(log_accurate(
                jnp.asarray([0.0, -1.0, np.inf, 1.0], jnp.float32)))
        assert vals[0] == -np.inf
        assert np.isnan(vals[1])
        assert vals[2] == np.inf
        assert vals[3] == 0.0

    def test_f64_passthrough(self):
        from sim5_tpu.utils.fastmath import log_accurate
        y = jnp.asarray([0.5, 3.7, 1e200])
        np.testing.assert_array_equal(np.asarray(log_accurate(y)),
                                      np.asarray(jnp.log(y)))


class TestAccurateExp:
    """utils/fastmath.exp_accurate / expm1_accurate (XLA's TPU f32 exp is
    ~8e-6 relative and expm1 ~1.1e-4; these restore ~2-4 ulp)."""

    def test_f32_accuracy_vs_f64(self):
        from sim5_tpu.utils.fastmath import exp_accurate, expm1_accurate
        x64 = np.linspace(-87.0, 88.0, 200001)
        with jax.enable_x64(False):
            x = jnp.asarray(x64, jnp.float32)
            e = np.float64(np.asarray(jax.jit(exp_accurate)(x)))
            em = np.float64(np.asarray(jax.jit(expm1_accurate)(x)))
        xr = x64.astype(np.float32).astype(np.float64)
        rel = np.abs(e - np.exp(xr)) / np.exp(xr)
        relm = np.abs(em - np.expm1(xr)) / np.maximum(np.abs(np.expm1(xr)),
                                                      1e-300)
        assert rel.max() < 1e-6
        assert relm.max() < 1e-6

    def test_expm1_small_x(self):
        from sim5_tpu.utils.fastmath import expm1_accurate
        with jax.enable_x64(False):
            x = jnp.asarray([1e-8, -1e-8, 1e-4, -1e-4], jnp.float32)
            em = np.float64(np.asarray(expm1_accurate(x)))
        ref = np.expm1(np.float64([1e-8, -1e-8, 1e-4, -1e-4]))
        np.testing.assert_allclose(em, ref, rtol=2e-7)

    def test_edges_and_f64(self):
        from sim5_tpu.utils.fastmath import exp_accurate, expm1_accurate
        with jax.enable_x64(False):
            v = np.asarray(exp_accurate(jnp.asarray([100.0, -100.0, 0.0],
                                                    jnp.float32)))
            vm = np.asarray(expm1_accurate(jnp.asarray([100.0, -100.0, 0.0],
                                                       jnp.float32)))
        assert v[0] == np.inf and v[1] == 0.0 and v[2] == 1.0
        assert vm[0] == np.inf and vm[1] == -1.0 and vm[2] == 0.0
        x = jnp.asarray([0.5, -3.0])
        np.testing.assert_array_equal(np.asarray(exp_accurate(x)),
                                      np.asarray(jnp.exp(x)))
