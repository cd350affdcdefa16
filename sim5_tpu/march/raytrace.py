"""Step-wise null-geodesic integrator (the "marching" engine).

Batched, lockstep equivalent of sim5raytrace.c: direct integration of
d2x/dlambda2 = -Gamma k k with curvature-adaptive per-ray step size and
conserved-quantity error tracking (energy kt drift per step, Carter
constant drift per ray).

TPU-native design: the reference's Dolence+09 predictor/corrector with
revert-and-RK4 fallback (sim5raytrace.c:164-227) is a scalar-CPU
optimization to save connection evaluations; under lockstep batching the
masked fallback would evaluate RK4 for every ray anyway, so this engine
always takes the classical RK4 step (4 fused connection evaluations, no
divergence) with the same adaptive step-size rule and the same error
gates.  Each ray carries its own dl; rays finish independently via active
masks inside one `lax.while_loop`.

Accuracy contract (matches the reference test gates,
src/sim5unittests.c:151-154): Carter-constant relative drift < 1e-3 over a
full ray at default precision.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import (kerr_metric, flat_metric,
                    kerr_transport_accel, flat_transport_accel,
                    dotprod, photon_carter_const, r_bh)

RTOPT_NONE = 0
RTOPT_FLAT = 1          # Minkowski instead of Kerr (sim5raytrace.h:21-23)
RTOPT_POLARIZATION = 2  # transport a polarization vector along the ray

_TINY = 1e-40


@partial(jax.tree_util.register_dataclass,
         data_fields=("x", "k", "f", "a", "E", "Q", "kt", "error", "steps",
                      "step_epsilon", "step_epsilon0"),
         meta_fields=("opt_gr", "opt_pol"))
@dataclasses.dataclass(frozen=True)
class RaytraceState:
    """Per-ray integration state (the reference's raytrace_data + x,k).

    `opt_gr`/`opt_pol` are static pytree metadata (compile-time switches).
    `step_epsilon` is the CURRENT per-ray step-size parameter: the
    revert-and-retry controller (reference semantics,
    sim5raytrace.c:217-227) halves it when a step's error trips the gate
    and relaxes it back toward `step_epsilon0` on accepted steps.
    """
    x: jnp.ndarray        # (...,4) position [t, r, m=cos(theta), phi]
    k: jnp.ndarray        # (...,4) photon momentum
    f: jnp.ndarray        # (...,4) polarization vector (zeros if unused)
    a: jnp.ndarray        # BH spin (broadcast)
    E: jnp.ndarray        # initial energy -k_t
    Q: jnp.ndarray        # initial Carter constant
    kt: jnp.ndarray       # current k_t (drift monitor)
    error: jnp.ndarray    # last ACCEPTED step's relative error
    steps: jnp.ndarray    # int32 trial counter ("pass" in the reference)
    step_epsilon: jnp.ndarray
    step_epsilon0: jnp.ndarray
    opt_gr: bool = True   # static: GR vs flat
    opt_pol: bool = False # static: transport f

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _transport(state, r, m, U, V):
    """-Gamma^i_jk U^j V^k at (r, m), fused (no dense connection tensor)."""
    if state.opt_gr:
        return kerr_transport_accel(state.a, r, m, U, V)
    return flat_transport_accel(r, m, U, V)


def raytrace_prepare(a, x, k, f=None, precision=0.01, options=RTOPT_NONE):
    """Initialize the integration state; checks are soft (NaN-poisoning).

    (reference: raytrace_prepare, sim5raytrace.c:44-94)
    """
    x = jnp.asarray(x, jnp.float64)
    k = jnp.asarray(k, jnp.float64)
    a = jnp.broadcast_to(jnp.asarray(a, jnp.float64), x.shape[:-1])
    opt_gr = not (options & RTOPT_FLAT)
    opt_pol = bool(options & RTOPT_POLARIZATION)
    if f is None:
        f = jnp.zeros_like(k)
    m = (kerr_metric(a, x[..., 1], x[..., 2]) if opt_gr
         else flat_metric(x[..., 1], x[..., 2]))
    E = k[..., 0] * m.g00 + k[..., 3] * m.g03
    Q = photon_carter_const(k, m)
    eps = jnp.broadcast_to(jnp.sqrt(jnp.asarray(precision, jnp.float64)) / 10.0,
                           a.shape)
    return RaytraceState(x, k, jnp.asarray(f, jnp.float64), a, E, Q, E,
                         jnp.zeros_like(E), jnp.zeros(a.shape, jnp.int32),
                         eps, eps, opt_gr, opt_pol)


def _rk4_step(state: RaytraceState, dl, dk_at_x=None):
    """One classical RK4 step of (x, k[, f]) with theta as the poloidal
    coordinate during the step (the reference does the same inside its RK4
    fallback, sim5raytrace.c:269-298).

    `dk_at_x`: optional precomputed -Gamma k k at the current point (the
    caller's adaptive-step curvature evaluation is the same quantity)."""
    x = state.x
    k = state.k
    f = state.f
    # switch m=cos(theta) -> theta
    xth = x.at[..., 2].set(jnp.arccos(jnp.clip(x[..., 2], -1.0, 1.0)))
    dl_ = dl[..., None]

    def accel(xp, kp, fp):
        rp, mp = xp[..., 1], jnp.cos(xp[..., 2])
        dk = _transport(state, rp, mp, kp, kp)
        # parallel transport: df^i = -Gamma^i_jk k^j f^k
        df = _transport(state, rp, mp, kp, fp) if state.opt_pol else fp
        return dk, df

    k1 = k
    if dk_at_x is None:
        dk1, df1 = accel(xth, k1, f)
    else:
        dk1 = dk_at_x
        df1 = (_transport(state, x[..., 1], x[..., 2], k, f)
               if state.opt_pol else f)
    k2 = k + dk1 * 0.5 * dl_
    dk2, df2 = accel(xth + k1 * 0.5 * dl_, k2, f + df1 * 0.5 * dl_)
    k3 = k + dk2 * 0.5 * dl_
    dk3, df3 = accel(xth + k2 * 0.5 * dl_, k3, f + df2 * 0.5 * dl_)
    k4 = k + dk3 * dl_
    dk4, df4 = accel(xth + k3 * dl_, k4, f + df3 * dl_)

    xn = xth + dl_ / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    kn = k + dl_ / 6.0 * (dk1 + 2.0 * dk2 + 2.0 * dk3 + dk4)
    fn = f + dl_ / 6.0 * (df1 + 2.0 * df2 + 2.0 * df3 + df4) \
        if state.opt_pol else f
    xn = xn.at[..., 2].set(jnp.cos(xn[..., 2]))
    return xn, kn, fn


def raytrace_step(state: RaytraceState, max_step=1e9, active=None,
                  error_gate=2.5e-3):
    """Advance every (active) ray by one adaptive step with masked
    revert-and-retry error control.

    Step size: dl = min(max_step, eps / sum_i |dk_i|/|k_i|)
    (reference: sim5raytrace.c:164-166).  When the step error exceeds
    `error_gate`, the step is REJECTED: position/momentum keep their old
    values and the ray's step_epsilon is halved, so the next trial retries
    the same step at half size -- the batched (masked, amortized) form of
    the reference's revert-and-redo (sim5raytrace.c:217-227).  Accepted
    steps relax epsilon back toward its initial value.  Epsilon is floored
    at eps0/64: once there, steps are accepted unconditionally and the
    caller's error_stop gate decides the ray's fate, as before.

    Returns (state, dl_taken); dl is 0 where inactive (rejected trials
    report the attempted dl).
    """
    if active is None:
        active = jnp.ones(state.x.shape[:-1], bool)
    eps0 = state.step_epsilon0
    dk = _transport(state, state.x[..., 1], state.x[..., 2], state.k, state.k)
    curv = jnp.sum(jnp.abs(dk) / (jnp.abs(state.k) + _TINY), axis=-1) + _TINY
    dl = jnp.minimum(jnp.asarray(max_step, jnp.float64), state.step_epsilon / curv)
    # progress floor, scaled down with the retry shrink so retries do bite
    dl = jnp.maximum(dl, 1e-3 * state.step_epsilon / eps0)
    dl = jnp.where(active, dl, 0.0)

    xn, kn, fn = _rk4_step(state, dl, dk_at_x=dk)
    mn = (kerr_metric(state.a, xn[..., 1], xn[..., 2]) if state.opt_gr
          else flat_metric(xn[..., 1], xn[..., 2]))
    kt_new = kn[..., 0] * mn.g00 + kn[..., 3] * mn.g03
    kk = jnp.abs(dotprod(kn, kn, mn))
    err = jnp.maximum(jnp.abs(kt_new - state.kt) / (jnp.abs(state.kt) + _TINY), kk)

    # reject non-finite or over-gate trials while the ray still has shrink
    # budget; at the floor a FINITE over-gate trial is accepted and the
    # driver's error_stop gate decides the ray's fate (as pre-retry), but
    # a NON-FINITE trial is never written: the ray FREEZES at its last
    # finite state with error = inf, so the driver deactivates it without
    # a NaN position ever entering the batch (the old behavior produced
    # ~1-in-1e5 NaN rays on polar-pass coordinate pathologies)
    bad = ~jnp.isfinite(err) | ~jnp.isfinite(xn[..., 1])
    reject = active & (bad | (err > error_gate)) \
        & (state.step_epsilon > eps0 / 64.0)
    fail_floor = active & bad & ~reject
    acc = active & ~reject & ~bad
    eps_new = jnp.where(reject, jnp.maximum(0.5 * state.step_epsilon,
                                            eps0 / 128.0),
                        jnp.where(acc, jnp.minimum(eps0,
                                                   1.3 * state.step_epsilon),
                                  state.step_epsilon))

    sel = acc[..., None]
    return state._replace(
        x=jnp.where(sel, xn, state.x),
        k=jnp.where(sel, kn, state.k),
        f=jnp.where(sel, fn, state.f),
        kt=jnp.where(acc, kt_new, state.kt),
        error=jnp.where(acc, err,
                        jnp.where(fail_floor, jnp.inf, state.error)),
        steps=state.steps + active.astype(jnp.int32),
        step_epsilon=eps_new,
    ), dl


def raytrace_error(state: RaytraceState):
    """Global integration error: relative Carter-constant drift.

    (reference: raytrace_error, sim5raytrace.c:327-343)
    """
    m = (kerr_metric(state.a, state.x[..., 1], state.x[..., 2]) if state.opt_gr
         else flat_metric(state.x[..., 1], state.x[..., 2]))
    Q = photon_carter_const(state.k, m)
    return jnp.abs(Q - state.Q) / (jnp.abs(state.Q) + _TINY)


@partial(jax.jit, static_argnames=("max_steps",))
def raytrace(state: RaytraceState, r_max=1e4, max_steps=10000,
             error_stop=1e-2):
    """Integrate all rays until they fall below 1.05*r_bh, escape past
    r_max, exceed the error gate, or hit max_steps.

    Returns (final_state, active_mask_still_running).
    """
    r_min = 1.05 * r_bh(state.a)

    def cond(carry):
        st, active = carry
        return jnp.any(active) & (jnp.max(st.steps) < max_steps)

    def body(carry):
        st, active = carry
        st, _ = raytrace_step(st, active=active,
                              error_gate=0.25 * error_stop)
        r = st.x[..., 1]
        active = (active & (r > r_min) & (r < r_max)
                  & (st.error < error_stop) & jnp.isfinite(r))
        return st, active

    active0 = jnp.ones(state.x.shape[:-1], bool)
    state, active = jax.lax.while_loop(cond, body, (state, active0))
    return state, active
