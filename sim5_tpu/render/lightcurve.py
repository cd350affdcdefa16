"""Time-dependent observables: orbiting hot-spot light curves and
optically-thin volume radiative transfer (BASELINE config #4).

Two engines:

* `hotspot_lightcurve` uses the ANALYTIC engine: every image-plane ray's
  equatorial crossing (radius, azimuth, g-factor, travel-time delay) is
  precomputed once; a light curve for any spot trajectory is then a pure
  reduction over pixels -- ideal for fitting QPO phase curves.

* `volume_image` / `volume_lightcurve` use BOTH engines: the analytic
  engine supplies exact initial conditions on a sphere r=r_start (position
  + momentum per pixel), and the stepwise engine marches inward
  accumulating j(x) dl (optically thin transfer).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..core import gfactorK, OmegaK, r_bh, r_ms
from ..geodesic import (geodesic_init_inf, geodesic_find_midplane_crossing,
                        geodesic_position_rad, geodesic_position_azm,
                        geodesic_timedelay_full, geodesic_position_pol,
                        geodesic_P_int, geodesic_momentum)
from ..march import raytrace_prepare, raytrace_step
from ..render.image import image_grid


from functools import partial


@partial(jax.jit, static_argnames=("npix", "order"))
def equatorial_crossing_map(a, incl, npix, rmax, order=0):
    """Precompute, for every image-plane pixel, the equatorial crossing:
    (r, phi, g-factor, relative time delay, hit mask).

    phi follows geodesic_position_azm (angle change from infinity);
    time delays are relative to the earliest-arriving hit pixel.
    """
    alpha, beta = image_grid(npix, npix, rmax)
    g = geodesic_init_inf(incl, a, alpha, beta)
    P = geodesic_find_midplane_crossing(g, order)
    r = geodesic_position_rad(g, P)
    hit = jnp.isfinite(r) & (g.status == 0)
    r_s = jnp.where(hit, r, 10.0)
    m0 = jnp.zeros_like(r_s)
    phi = geodesic_position_azm(g, r_s, m0, jnp.where(hit, P, 1.0))
    gf = gfactorK(r_s, a, g.l)
    # Keplerian g-factor is undefined inside the marginally stable orbit
    # (no circular orbits there) -- such crossings carry no spot emission
    hit = hit & jnp.isfinite(gf) & (r_s > r_ms(jnp.asarray(a)))
    gf = jnp.where(hit, gf, 1.0)
    phi = jnp.where(hit & jnp.isfinite(phi), phi, 0.0)
    # Travel time to the crossing, anchored at a COMMON far-field sphere
    # r=R_FAR plus the analytic plane-wavefront correction: along an
    # incoming ray with impact parameter b, the coordinate time from the
    # observer satisfies t(r) = r + 2 ln r + (4 + b^2/2 + ...)/r + const,
    # so relative to a plane wavefront the ray reaches r=R_FAR late by
    # b^2/(2 R_FAR); residual pixel-dependent error is O(b^2/R_FAR^2).
    # The delay itself uses the FULL time integral (radial + poloidal) --
    # the reference disables the theta part (sim5kerr-geod.c:663-702),
    # which is wrong at moderate/high inclination.
    R_FAR = 1e4
    P_far = geodesic_P_int(g, jnp.full_like(r_s, R_FAR), 0)
    P_far = jnp.where(jnp.isfinite(P_far), P_far, 1e-4)
    r_far = geodesic_position_rad(g, P_far)
    m_far = geodesic_position_pol(g, P_far)
    dt = geodesic_timedelay_full(g, jnp.where(hit, P, 1.0), r_s, m0,
                                 P_far, r_far, m_far)
    dt = dt + (alpha ** 2 + beta ** 2) / (2.0 * R_FAR)
    dt = jnp.where(hit & jnp.isfinite(dt), dt, 0.0)
    dt = dt - jnp.min(jnp.where(hit, dt, jnp.inf))
    return dict(r=r_s, phi=phi, g=gf, delay=dt, hit=hit,
                pixel_area=(2.0 * rmax / npix) ** 2)


def hotspot_lightcurve(a, incl, r_spot, spot_size, t_obs, npix=256,
                       rmax=None, n_orders=2):
    """Bolometric light curve of a Gaussian hot spot on a circular Keplerian
    orbit at radius r_spot, including Doppler/gravitational g-factor
    (g^4 boost), lensing (multiple image orders) and time delays.

    Args:
      t_obs: observer times [GM/c^3].
    Returns: flux array (arbitrary units, normalized to spot intensity 1).
    """
    if rmax is None:
        rmax = r_spot * 2.5
    # Om stays TRACED (no float()): the light curve is differentiable in
    # (a, r_spot) for QPO phase-curve fitting; FD-gated in test_march.py
    Om = OmegaK(r_spot, a)
    t_obs = jnp.asarray(t_obs, jnp.float64)

    total = 0.0
    for order in range(n_orders):
        m = equatorial_crossing_map(a, incl, npix, rmax, order)

        def flux_at(t):
            # spot center at emission (retarded) time
            phi_spot = Om * (t - m["delay"])
            dphi = jnp.mod(m["phi"] - phi_spot + jnp.pi, 2.0 * jnp.pi) - jnp.pi
            # distance on the disk plane
            d2 = (m["r"] - r_spot) ** 2 + (m["r"] * dphi) ** 2
            I_loc = jnp.exp(-0.5 * d2 / spot_size ** 2)
            return jnp.sum(jnp.where(m["hit"], I_loc * m["g"] ** 4, 0.0)
                           * m["pixel_area"])

        total = total + jax.vmap(flux_at)(t_obs)
    return total


@partial(jax.jit, static_argnames=("npix",))
def _volume_seed_geom(a, incl, npix, rmax, r_start):
    """Per-pixel analytic seed WITHOUT the azimuth (see _volume_seed)."""
    alpha, beta = image_grid(npix, npix, rmax)
    g = geodesic_init_inf(incl, a, alpha, beta)
    ok = g.status == 0
    P0 = geodesic_P_int(g, jnp.full(alpha.shape, r_start), 0)
    ok = ok & jnp.isfinite(P0)
    P0s = jnp.where(ok, P0, 1e-3)
    r0 = geodesic_position_rad(g, P0s)
    m0 = geodesic_position_pol(g, P0s)
    return g, ok, P0s, r0, m0


@jax.jit
def _volume_seed_azm(g, ok, P0s, r0, m0):
    """The azimuth stage of the seed, jitted as its OWN program: the azm
    graph (all four trajectory-type radial terms + the folded theta
    cumulative, under emulated f64) is by far the largest single program
    in the framework, and combining it with the init/inversion stage blew
    past the remote TPU compiler's memory (SIGKILL)."""
    return geodesic_position_azm(g, jnp.where(ok, r0, 40.0),
                                 jnp.where(ok, m0, 0.0), P0s)


@jax.jit
def _volume_seed_pack(g, ok, P0s, r0, m0, phi0, a, t0, r_start, precision):
    ok = ok & jnp.isfinite(r0) & jnp.isfinite(m0) & jnp.isfinite(phi0)
    r0 = jnp.where(ok, r0, r_start)
    m0 = jnp.where(ok, m0, 0.0)
    phi0 = jnp.where(ok, phi0, 0.0)
    k = geodesic_momentum(g, P0s, r0, m0)
    # marching convention: k[2] of geodesic_momentum is dm/dP-signed; the
    # integrator treats k^2 as dtheta/dlambda -> flip (see geodesic_momentum)
    k = k.at[..., 2].multiply(-1.0)
    k = jnp.where(ok[..., None], k, jnp.stack(
        [jnp.ones_like(r0), -jnp.ones_like(r0), jnp.zeros_like(r0),
         jnp.zeros_like(r0)], -1))
    x0 = jnp.stack([jnp.full_like(r0, t0), r0, m0, phi0], -1)
    st = raytrace_prepare(a, x0, k, precision=precision)
    return st, ok


def _volume_seed(a, incl, t0, npix, rmax, r_start, precision,
                 axisymmetric=False):
    """Seed every pixel's ray on its analytic geodesic at r=r_start:
    returns (march state, valid mask).  Three separately-jitted stages
    (geometry / azimuth / packing) -- one monolithic program chokes the
    remote TPU compiler.  axisymmetric=True skips the azimuth stage
    (phi0 = 0; see volume_image)."""
    g, ok, P0s, r0, m0 = _volume_seed_geom(a, incl, npix, rmax, r_start)
    phi0 = (jnp.zeros_like(r0) if axisymmetric
            else _volume_seed_azm(g, ok, P0s, r0, m0))
    return _volume_seed_pack(g, ok, P0s, r0, m0, phi0, a, t0, r_start,
                             precision)


@partial(jax.jit, static_argnames=("emissivity_fn", "absorption_fn",
                                   "max_steps"))
def _volume_march_xla(st, ok, r_start, emissivity_fn, max_steps,
                      absorption_fn=None):
    """lax.while_loop march + RT accumulation (any precision).

    Backward march (observer -> source): the carried optical depth tau is
    the attenuation between the current point and the observer, so
    I += j e^{-tau} s_eff with the exact piecewise-constant segment weight
    s_eff = (1 - e^{-alpha dl})/alpha (-> dl in the optically-thin limit).
    """
    r_min = 1.05 * r_bh(jnp.asarray(st.a).reshape(-1)[0])

    def body(carry):
        st, I, tau, active, it = carry
        st2, dl = raytrace_step(st, active=active)
        r = st2.x[..., 1]
        j = emissivity_fn(st2.x[..., 0], r, st2.x[..., 2], st2.x[..., 3])
        if absorption_fn is not None:
            al = absorption_fn(st2.x[..., 0], r, st2.x[..., 2],
                               st2.x[..., 3])
            dtau = al * dl
            seff = jnp.where(dtau > 1e-10,
                             -jnp.expm1(-dtau) / jnp.maximum(al, 1e-300),
                             dl)
            I = I + jnp.where(active, j * jnp.exp(-tau) * seff, 0.0)
            tau = tau + jnp.where(active, dtau, 0.0)
        else:
            I = I + jnp.where(active, j * dl, 0.0)
        active = (active & (r > r_min) & (r < r_start * 1.2)
                  & (st2.error < 1e-2) & jnp.isfinite(r))
        return st2, I, tau, active, it + 1

    def cond(carry):
        _, _, _, active, it = carry
        return jnp.any(active) & (it < max_steps)

    zero = jnp.zeros_like(ok, dtype=st.x.dtype)
    st, I, _tau, active, _ = jax.lax.while_loop(
        cond, body, (st, zero, zero, ok, jnp.asarray(0)))
    return I


@partial(jax.jit, static_argnames=("emissivity_fn", "absorption_fn",
                                   "n_steps", "segment_len"))
def _volume_march_scan(st, ok, r_start, emissivity_fn, n_steps=1024,
                       absorption_fn=None, segment_len=64):
    """REVERSE-DIFFERENTIABLE march + RT accumulation: fixed-trip
    `lax.scan` over segments of `segment_len` steps, each segment wrapped
    in `jax.checkpoint` -- SURVEY 7 item 7's reverse-replay option (a).
    Reverse-mode stores one integration state per SEGMENT (n_steps /
    segment_len checkpoints) and rematerializes the in-segment steps on
    the backward pass, so d(image)/d(spin, source params) costs ~2x the
    forward march instead of O(n_steps) residual memory.

    Same physics as `_volume_march_xla` (masked revert-and-retry steps,
    exact piecewise-constant RT weights); the while_loop engine remains
    the fast forward-only path (it exits when all rays finish, while the
    fixed trip count here pays every step -- the price of a
    differentiable loop under XLA's static-shape model).
    """
    r_min = 1.05 * r_bh(jnp.asarray(st.a).reshape(-1)[0])

    def step_once(carry, _):
        st, I, tau, active = carry
        st2, dl = raytrace_step(st, active=active)
        r = st2.x[..., 1]
        j = emissivity_fn(st2.x[..., 0], r, st2.x[..., 2], st2.x[..., 3])
        if absorption_fn is not None:
            al = absorption_fn(st2.x[..., 0], r, st2.x[..., 2],
                               st2.x[..., 3])
            dtau = al * dl
            seff = jnp.where(dtau > 1e-10,
                             -jnp.expm1(-dtau) / jnp.maximum(al, 1e-300),
                             dl)
            I = I + jnp.where(active, j * jnp.exp(-tau) * seff, 0.0)
            tau = tau + jnp.where(active, dtau, 0.0)
        else:
            I = I + jnp.where(active, j * dl, 0.0)
        active = (active & (r > r_min) & (r < r_start * 1.2)
                  & (st2.error < 1e-2) & jnp.isfinite(r))
        return (st2, I, tau, active), None

    @jax.checkpoint
    def segment(carry):
        carry, _ = jax.lax.scan(step_once, carry, None, length=segment_len)
        return carry

    zero = jnp.zeros_like(ok, dtype=st.x.dtype)
    carry = (st, zero, zero, ok)
    n_seg = max(1, n_steps // segment_len)
    carry, _ = jax.lax.scan(lambda c, _: (segment(c), None), carry, None,
                            length=n_seg)
    _st, I, _tau, _active = carry
    return I


def volume_image(a, incl, emissivity_fn, npix=128, rmax=25.0,
                 r_start=60.0, max_steps=4000, precision=0.03,
                 engine="xla", t0=0.0, absorption_fn=None,
                 axisymmetric=False):
    """Optically-thin image of a 3-D emissivity field: each pixel's ray is
    seeded exactly on its analytic geodesic at r=r_start and marched inward
    accumulating I = int j(t, r, m, phi) dl.

    `emissivity_fn(t, r, m, phi)` -> emissivity (pure, batched); rays start
    at t=t0 (traced; default 0) at r_start and t decreases into the past
    along the march (backward raytracing), so time-dependent sources see
    retarded time.  Sweeping t0 reuses one compilation for a whole light
    curve.  `absorption_fn(t, r, m, phi)` -> alpha (optional) switches on
    optically-thick transfer: I = int j e^{-tau} dl with
    tau = int alpha dl accumulated toward the observer (the reference's
    stepwise engine carries no radiative transfer at all; this completes
    BASELINE config #4 beyond the thin limit).

    engine="pallas" runs the march + RT accumulation inside the fused
    TPU kernel (sim5_tpu/march/pallas_march.py; f32, much faster than the
    XLA loop); "xla" is the lax.while_loop engine (any precision);
    "scan" is the REVERSE-DIFFERENTIABLE engine (`_volume_march_scan`:
    fixed-trip checkpointed-segment scan) for fitting light curves /
    source parameters by gradient -- d(image)/d(a, source params) is
    FD-validated in tests/test_march.py.

    The seeding and marching stages are jitted separately (one XLA program
    each) rather than as one monolith -- the combined program chokes the
    remote Mosaic+XLA compile path, and the split compiles in seconds and
    caches independently.

    `axisymmetric=True` declares the source independent of phi: the seed
    skips the azimuth stage entirely (by far the largest program in the
    framework -- all four trajectory-type radial integrals), starting
    every ray at phi=0.  Use for axisymmetric emissivities (tori, shells)
    and for gradient work where compiling the azm backward is pure waste.
    """
    st, ok = _volume_seed(a, incl, t0, npix, rmax, r_start, precision,
                          axisymmetric=axisymmetric)

    if engine == "pallas":
        from ..march import raytrace_pallas
        stP, _, I = raytrace_pallas(
            st, r_max=r_start * 1.2, max_steps=max_steps, error_stop=1e-2,
            emissivity_fn=emissivity_fn, absorption_fn=absorption_fn,
            active0=ok)
        return jnp.where(ok, I, 0.0)

    if engine == "scan":
        return _volume_march_scan(st, ok, r_start, emissivity_fn,
                                  n_steps=max_steps,
                                  absorption_fn=absorption_fn)

    return _volume_march_xla(st, ok, r_start, emissivity_fn, max_steps,
                             absorption_fn=absorption_fn)


def volume_lightcurve(a, incl, emissivity_fn_t, t_obs, **kw):
    """Light curve of a time-dependent optically-thin source: one
    `volume_image` per observer time, with the source evaluated at the
    ray-local (retarded) coordinate time.

    The observer time enters as the ray's initial t-coordinate (traced),
    so the whole curve shares one compiled render."""
    fluxes = []
    for t in np.asarray(t_obs):
        I = volume_image(a, incl, emissivity_fn_t, t0=float(t), **kw)
        fluxes.append(float(jnp.sum(I)))
    return np.asarray(fluxes)
