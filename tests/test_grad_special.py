"""Analytic-derivative layer gates: custom-jvp rules of the Carlson and
Jacobi special functions vs central finite differences (f64).

SURVEY build item 3 ("Carlson rf/rd/rc/rj with custom VJPs; derivatives of
Jacobi sn/cn/dn algebraic in sn/cn/dn"): reverse-mode gradients must match
FD to <=1e-8 relative at well-conditioned points (FD's own noise floor for
the chosen steps is ~1e-9; the rules themselves agree with autodiff of the
raw duplication chains to ~1e-12).  Both jvp (forward) and grad (reverse,
exercising JAX's automatic transposition of the rules) are gated.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sim5_tpu.special import rf, rd, rc, rj, jacobi_sncndn, jacobi_isn, jacobi_icn

GATE = 1e-8


def _fd(f, args, i, h):
    a = list(args)
    a[i] = args[i] + h
    fp = np.asarray(f(*a), np.float64)
    a[i] = args[i] - h
    fm = np.asarray(f(*a), np.float64)
    return (fp - fm) / (2.0 * h)


def _check_grads(f, pts, n_args, h_rel=1e-5, gate=GATE, skip=()):
    for p in pts:
        for i in range(n_args):
            if i in skip:
                continue
            g_rev = jax.grad(lambda *a: jnp.sum(f(*a)), argnums=i)(
                *map(jnp.float64, p))
            _, g_fwd = jax.jvp(lambda v: f(*(p[:i] + (v,) + p[i + 1:])),
                               (jnp.float64(p[i]),), (jnp.float64(1.0),))
            h = h_rel * max(abs(p[i]), 1e-3)
            fd = _fd(f, p, i, h)
            scale = max(abs(float(fd)), 1e-12)
            assert abs(float(g_rev) - float(fd)) / scale < gate, (
                f"{f.__name__ if hasattr(f, '__name__') else f} arg {i} at {p}: "
                f"rev {float(g_rev):.6e} vs fd {float(fd):.6e}")
            assert abs(float(g_fwd) - float(fd)) / scale < gate, (
                f"jvp arg {i} at {p}")
            # rule self-consistency: transpose(jvp) == grad to rounding
            assert abs(float(g_rev) - float(g_fwd)) <= 1e-12 * scale + 1e-300


class TestCarlsonGrads:
    def test_rf(self):
        _check_grads(rf, [(0.3, 1.7, 1.0), (2.0, 2.0, 2.0),
                          (1e-3, 0.5, 1.0), (5.0, 0.01, 1.0),
                          (0.7, 0.7 + 1e-12, 1.0)], 3)

    def test_rd(self):
        # includes argument coincidences x == z and y ~ z, where the
        # divided differences are evaluated cancellation-free through the
        # shared duplication chain
        _check_grads(rd, [(0.3, 1.7, 1.0), (1.0, 1.0, 1.0),
                          (2.0, 0.5, 0.5 + 1e-11), (1e-3, 3.0, 1.0),
                          (1.0, 2.0, 1.0)], 3)

    def test_rc(self):
        # positive and principal-value (y < 0) branches
        _check_grads(rc, [(0.5, 2.0), (2.0, 0.1), (0.8, -1.5),
                          (1e-3, 1.0)], 2)

    def test_rj(self):
        # positive and principal-value (p < 0) branches
        _check_grads(rj, [(0.3, 1.7, 1.0, 2.5), (0.5, 1.0, 2.0, 0.25),
                          (1.0, 1.0, 1.0, 3.0), (0.2, 0.9, 1.4, -0.7)], 4,
                     h_rel=1e-6)

    def test_rf_zero_arg_tangent_is_zero(self):
        # complete integrals RF(0, y, 1): the floored slot's coefficient is
        # zeroed (maximum()-subgradient semantics), so differentiating
        # through a CONSTANT zero first argument stays finite
        g = jax.grad(lambda m: rf(jnp.float64(0.0), 1.0 - m,
                                  jnp.float64(1.0)))(jnp.float64(0.3))
        assert np.isfinite(float(g))
        h = 1e-6
        fd = (float(rf(0.0, 1.0 - (0.3 + h), 1.0))
              - float(rf(0.0, 1.0 - (0.3 - h), 1.0))) / (2 * h)
        assert abs(float(g) - fd) / abs(fd) < 1e-8


class TestJacobiGrads:
    def test_sncndn_midrange(self):
        for (u, m) in [(0.3, 0.5), (1.2, 0.9), (2.5, 0.3), (-1.3, 0.4),
                       (4.0, 0.6), (0.7, 0.999)]:
            for j in range(3):
                for i in range(2):
                    g = jax.grad(
                        lambda u_, m_: jacobi_sncndn(u_, m_)[j],
                        argnums=i)(jnp.float64(u), jnp.float64(m))
                    h = 1e-6 * max(abs((u, m)[i]), 1e-2)
                    fd = _fd(lambda u_, m_: jacobi_sncndn(u_, m_)[j],
                             (u, m), i, h)
                    scale = max(abs(float(fd)), 1e-6)
                    assert abs(float(g) - float(fd)) / scale < 1e-6, (
                        f"sncndn[{j}] d{i} at u={u}, m={m}")

    def test_sncndn_u_derivative_is_algebraic(self):
        # d sn/du = cn dn etc., exactly (the identities the rule encodes)
        u, m = jnp.float64(1.1), jnp.float64(0.7)
        sn, cn, dn = jacobi_sncndn(u, m)
        for j, want in [(0, cn * dn), (1, -sn * dn), (2, -m * sn * cn)]:
            g = jax.grad(lambda u_: jacobi_sncndn(u_, m)[j])(u)
            assert abs(float(g) - float(want)) < 1e-10

    def test_sncndn_mc_path_near_one(self):
        # the exact-complement path (near-critical rays): derivative wrt mc
        # at mc = 1e-8 via the m -> 1 asymptotic branch
        u = jnp.float64(1.5)
        for j in range(3):
            g = jax.grad(lambda mc: jacobi_sncndn(u, 1.0 - mc,
                                                  mc=mc)[j])(jnp.float64(1e-8))
            mc = 1e-8
            h = 0.01 * mc
            fd = (float(jacobi_sncndn(u, 1 - (mc + h), mc=mc + h)[j])
                  - float(jacobi_sncndn(u, 1 - (mc - h), mc=mc - h)[j])) \
                / (2 * h)
            assert abs(float(g) - fd) / max(abs(fd), 1e-6) < 1e-4

    def test_sncndn_small_m_series(self):
        # m -> 0 endpoint branch (the closed form cancels there)
        u = jnp.float64(0.9)
        for j in range(3):
            g = jax.grad(lambda m: jacobi_sncndn(u, m)[j])(jnp.float64(1e-9))
            fd = _fd(lambda u_, m_: jacobi_sncndn(u_, m_)[j],
                     (0.9, 1e-9), 1, 3e-10)
            assert abs(float(g) - float(fd)) / max(abs(float(fd)), 1e-6) < 1e-4

    def test_inverse_grads_compose_through_rf(self):
        # isn/icn differentiate through rf's rule; d isn/dz must equal the
        # closed inverse-function form 1/sqrt((1-z^2)(1-m z^2))
        z, m = 0.6, 0.4
        g = jax.grad(lambda z_: jacobi_isn(z_, jnp.float64(m)))(jnp.float64(z))
        want = 1.0 / np.sqrt((1 - z * z) * (1 - m * z * z))
        assert abs(float(g) - want) / want < 1e-10
        g2 = jax.grad(lambda m_: jacobi_icn(jnp.float64(z), m_))(jnp.float64(m))
        fd = _fd(jacobi_icn, (z, m), 1, 1e-6)
        assert abs(float(g2) - float(fd)) / abs(float(fd)) < 1e-8


class TestPipelineGrads:
    def test_image_jvp_vs_fd_small(self):
        # end-to-end: d(flux image)/d(spin) through the full fast path
        # (quartic roots, rf slots, complement-parametrized AGM) on a 32^2
        # frame, vs central differences.  Mirrors bench.py's on-device gate.
        from sim5_tpu.disk import nt_setup
        from sim5_tpu.render import render_disk_image

        incl = jnp.float64(np.radians(60.0))

        @jax.jit
        def img(a):
            disk = nt_setup(10.0, a, 0.1, 0.1)
            return render_disk_image(disk, incl, 32, 32)[0]

        a0 = jnp.float64(0.9)
        _, dimg = jax.jvp(img, (a0,), (jnp.float64(1.0),))
        # h at the FD balance point (bench.py's measured V-curve: smaller h
        # amplifies branch-threshold noise as 1/h); 1e-3 is the FD method
        # floor, not the AD error (the two agree to ~1e-4 here)
        h = 1e-4
        fd = (np.asarray(img(a0 + h)) - np.asarray(img(a0 - h))) / (2 * h)
        dimg = np.asarray(dimg)
        interior = ((np.asarray(img(a0 + h)) > 0)
                    == (np.asarray(img(a0 - h)) > 0)) & np.isfinite(dimg)
        assert interior.mean() > 0.9
        scale = np.abs(fd[interior]).max()
        err = np.abs(dimg - fd)[interior].max() / scale
        assert err < 1e-3, f"image jvp vs fd: {err:.2e}"

    def test_image_grad_finite(self):
        # reverse mode through the full pipeline: no NaN poisoning
        from sim5_tpu.disk import nt_setup
        from sim5_tpu.render import render_disk_image

        @jax.jit
        def loss(a, incl, mdot):
            disk = nt_setup(10.0, a, mdot, 0.1)
            return jnp.sum(render_disk_image(disk, incl, 32, 32)[0])

        g = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.float64(0.998), jnp.float64(np.radians(80.0)),
            jnp.float64(0.1))
        assert all(np.isfinite(float(v)) for v in g)
        assert any(abs(float(v)) > 0 for v in g)
