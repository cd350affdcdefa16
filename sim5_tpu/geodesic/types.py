"""Geodesic state pytree and type/status codes.

The `Geodesic` NamedTuple is the batched, immutable equivalent of the
reference's `geodesic` struct (sim5kerr-geod.h:42-68): it caches the motion
constants, quartic roots of R(r), trajectory type, theta-roots and the
key position-integral values.  All fields are arrays; batches come from
leading dims, so a whole image's worth of geodesics is one pytree.
"""

from typing import NamedTuple

import jax.numpy as jnp

# trajectory type codes (sim5kerr-geod.h:19-23)
GEOD_TYPE_RR = 40       # four real roots; allowed region r > r1
GEOD_TYPE_RR_DBL = 41   # four real roots, double root
GEOD_TYPE_RR_BH = 42    # four real roots; r3 < r < r2 (under horizon)
GEOD_TYPE_RC = 2        # two real + two complex roots; r > r1
GEOD_TYPE_CC = 0        # four complex roots

# status codes (sim5kerr-geod.h:26-37)
GD_OK = 0
GD_ERROR_Q_ZERO = 1
GD_ERROR_BOUND_GEODESIC = 2
GD_ERROR_UNKNOWN_SOLUTION = 3
GD_ERROR_TYPE_RR_DOUBLE = 4
GD_ERROR_TYPE_CC = 5
GD_ERROR_Q_RANGE = 7
GD_ERROR_MUPLUS_RANGE = 8
GD_ERROR_MU0_RANGE = 9
GD_ERROR_MM_RANGE = 10
GD_ERROR_INCL_RANGE = 11
GD_ERROR_SPIN_RANGE = 12


class Geodesic(NamedTuple):
    """Cached data of one (batch of) null geodesic(s)."""
    a: jnp.ndarray        # BH spin (clamped)
    alpha: jnp.ndarray    # impact parameter (horizontal)
    beta: jnp.ndarray     # impact parameter (vertical)
    incl: jnp.ndarray     # observer inclination [rad]
    cos_i: jnp.ndarray    # cos(incl)
    l: jnp.ndarray        # motion constant L_z/E
    q: jnp.ndarray        # Carter constant L/E^2
    rr: jnp.ndarray       # (...,4) real parts of R(r) roots (real desc first)
    ri: jnp.ndarray       # (...,4) imag parts
    nrr: jnp.ndarray      # int32 number of real roots
    gtype: jnp.ndarray    # int32 trajectory type (GEOD_TYPE_*)
    m2p: jnp.ndarray      # theta-root mu_plus^2
    m2m: jnp.ndarray      # theta-root mu_minus^2 (note sign convention)
    mm: jnp.ndarray       # modulus of theta integrals
    mK: jnp.ndarray       # scale of theta integrals
    rp: jnp.ndarray       # periastron radius
    Rpc: jnp.ndarray      # R-integral infinity..periastron
    Tpp: jnp.ndarray      # T-integral -mu_plus..mu_plus
    Tip: jnp.ndarray      # T-integral cos_i..mu_plus
    status: jnp.ndarray   # int32 GD_* status (0 = usable)
    # (...,4) low parts of rr: root_i = rr_i + rr_lo_i as an unevaluated
    # two-float pair, so root DIFFERENCES (the elliptic moduli are
    # cross-ratios of them) stay accurate to ~1 ulp of the difference even
    # for near-critical rays (r1 -> r2 at the photon ring) in f32 fast
    # mode.  Zeros when the engine ran in full f64.
    rr_lo: jnp.ndarray = None

    @property
    def ok(self):
        return self.status == GD_OK

    def root_diff(self, i, j):
        """Accurate root difference rr[i] - rr[j] using the two-float low
        parts (exact hi-difference by Sterbenz for close roots)."""
        d = self.rr[..., i] - self.rr[..., j]
        if self.rr_lo is None:
            return d
        return d + (self.rr_lo[..., i] - self.rr_lo[..., j])
