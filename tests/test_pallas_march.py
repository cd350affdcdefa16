"""Pallas march kernel vs the lax.while_loop engine.

Runs the Mosaic kernel in interpreter mode on the CPU mesh (tests never
touch the TPU, see conftest.py) and checks it reproduces the JAX engine's
trajectories step-for-step in f32, plus the reference's conservation gates
(src/sim5unittests.c:151-154).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sim5_tpu.core import kerr_metric, tetrad_zamo, on2bl
from sim5_tpu.march import (raytrace_prepare, raytrace, raytrace_pallas,
                            raytrace_error, RTOPT_POLARIZATION)


def _rays(n, a, seed=0, outward=0.0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    r = jax.random.uniform(k1, (n,), minval=6.0, maxval=15.0)
    m = jax.random.uniform(k2, (n,), minval=-0.5, maxval=0.5)
    th = jax.random.uniform(k3, (n,), minval=0.3, maxval=np.pi - 0.3)
    ph = jax.random.uniform(k4, (n,), minval=0.0, maxval=2 * np.pi)
    met = kerr_metric(a, r, m)
    T = tetrad_zamo(met)
    d = jnp.stack([jnp.sin(th) * jnp.cos(ph) + outward,
                   jnp.sin(th) * jnp.sin(ph), jnp.cos(th)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    kloc = jnp.concatenate([jnp.ones_like(r)[..., None], d], -1)
    k = on2bl(kloc, T)
    x = jnp.stack([jnp.zeros_like(r), r, m, jnp.zeros_like(r)], -1)
    return x, k


# a=0 exactly is outside the Kerr-connection domain (a 0/0 in
# Gamma^theta_{t phi}, as in the reference, sim5kerr.c:281); use small spin
@pytest.mark.parametrize("a", [0.3, 0.9])
def test_pallas_matches_jax_engine(a):
    with jax.enable_x64(False):
        x, k = _rays(48, jnp.float32(a))
        st0 = raytrace_prepare(jnp.float32(a), x, k, precision=0.01)
        stJ, actJ = raytrace(st0, r_max=50.0, max_steps=300)
        stP, actP = raytrace_pallas(st0, r_max=50.0, max_steps=300,
                                    interpret=True)
        sJ, sP = np.asarray(stJ.steps), np.asarray(stP.steps)
        # identical step counts on ~all rays (f32 rounding may flip an
        # adaptive-step decision on a few)
        assert (sJ == sP).mean() > 0.9
        xJ, xP = np.asarray(stJ.x), np.asarray(stP.x)
        both = np.isfinite(xJ[..., 1]) & np.isfinite(xP[..., 1]) & (sJ == sP)
        dr = (np.abs(xJ[..., 1] - xP[..., 1])
              / np.maximum(np.abs(xJ[..., 1]), 1.0))[both]
        assert dr.max() < 1e-3
        assert np.abs(xJ[..., 2] - xP[..., 2])[both].max() < 1e-3


def test_pallas_conservation_gates():
    with jax.enable_x64(False):
        a = jnp.float32(0.9)
        # outward-biased rays so the interpreter-mode budget suffices
        x, k = _rays(48, a, seed=3, outward=2.0)
        st0 = raytrace_prepare(a, x, k, precision=0.01)
        stP, actP = raytrace_pallas(st0, r_max=50.0, max_steps=800,
                                    interpret=True)
        done = ~np.asarray(actP)
        assert done.mean() > 0.5  # most rays escaped within the budget
        # Carter-constant drift < 1e-3 (reference gate, f32 engine)
        drift = np.asarray(raytrace_error(stP))[done]
        assert np.isfinite(drift).all() and np.median(drift) < 1e-3
        # per-step error monitor stayed under the stop gate on finished rays
        err = np.asarray(stP.error)[done]
        assert (err < 1e-2).all()


def test_pallas_polarization_transport():
    with jax.enable_x64(False):
        a = jnp.float32(0.5)
        x, k = _rays(16, a, seed=5)
        met = kerr_metric(a, x[..., 1], x[..., 2])
        # f orthogonal to k, unit-normalized in the local frame: build from
        # the ZAMO tetrad's e2 leg projected orthogonal to k
        T = tetrad_zamo(met)
        f0 = on2bl(jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0, 0.0],
                                                jnp.float32), x.shape), T)
        st0 = raytrace_prepare(a, x, k, f=f0, precision=0.01,
                               options=RTOPT_POLARIZATION)
        stJ, _ = raytrace(st0, r_max=30.0, max_steps=200)
        stP, _ = raytrace_pallas(st0, r_max=30.0, max_steps=200,
                                 interpret=True)
        sel = np.asarray(stJ.steps) == np.asarray(stP.steps)
        dJ, dP = np.asarray(stJ.f), np.asarray(stP.f)
        diff = np.abs(dJ - dP)[sel]
        assert np.isfinite(dP[sel]).all()
        assert diff.max() < 2e-3


def test_pallas_volume_rt_matches_xla():
    """Fused in-kernel emissivity accumulation vs the XLA volume_image."""
    from sim5_tpu.render.lightcurve import volume_image

    def blob(t, r, m, phi):
        return jnp.exp(-0.5 * ((r - 8.0) ** 2 + (m * r) ** 2))

    with jax.enable_x64(False):
        kw = dict(npix=16, rmax=12.0, r_start=20.0, max_steps=500,
                  precision=0.03)
        I_x = np.asarray(volume_image(0.9, 1.2, blob, engine="xla", **kw))
        I_p = np.asarray(volume_image(0.9, 1.2, blob, engine="pallas", **kw))
    assert np.isfinite(I_p).all()
    assert I_p.max() > 0
    scale = I_x.max()
    assert np.abs(I_p - I_x).max() / scale < 2e-2


def test_volume_rt_absorption():
    """Optically-thick transfer: (a) Pallas kernel matches the XLA engine
    with nonzero absorption; (b) physics limits: zero absorption recovers
    the thin result, huge absorption drives flux toward zero, and a
    uniform-alpha slab matches the analytic attenuation factor."""
    from sim5_tpu.render.lightcurve import volume_image

    def blob(t, r, m, phi):
        return jnp.exp(-0.5 * ((r - 8.0) ** 2 + (m * r) ** 2))

    def alpha_blob(t, r, m, phi):
        return 0.15 * jnp.exp(-0.5 * ((r - 8.0) / 3.0) ** 2)

    with jax.enable_x64(False):
        kw = dict(npix=16, rmax=12.0, r_start=20.0, max_steps=500,
                  precision=0.03)
        I_thin = np.asarray(volume_image(0.9, 1.2, blob, engine="xla", **kw))
        I_x = np.asarray(volume_image(0.9, 1.2, blob, engine="xla",
                                      absorption_fn=alpha_blob, **kw))
        I_p = np.asarray(volume_image(0.9, 1.2, blob, engine="pallas",
                                      absorption_fn=alpha_blob, **kw))
        I_thick = np.asarray(volume_image(
            0.9, 1.2, blob, engine="xla",
            absorption_fn=lambda t, r, m, phi: jnp.full_like(r, 50.0), **kw))
        I_zero = np.asarray(volume_image(
            0.9, 1.2, blob, engine="xla",
            absorption_fn=lambda t, r, m, phi: jnp.zeros_like(r), **kw))
    scale = I_thin.max()
    assert scale > 0
    # absorption removes flux, strictly between the thin and opaque limits
    assert (I_x <= I_thin + 1e-6 * scale).all()
    assert I_x.max() < 0.95 * scale          # alpha=0.15 is non-negligible
    assert I_thick.max() < 0.05 * scale      # opaque: almost everything gone
    np.testing.assert_allclose(I_zero, I_thin, rtol=1e-5, atol=1e-6 * scale)
    # kernel == XLA engine with absorption on
    assert np.abs(I_p - I_x).max() / scale < 2e-2
