"""Radiative processes: blackbody emission with hardening and limb darkening.

(reference: sim5radiation.c)
"""

import jax
import jax.numpy as jnp

from .. import consts


# Planck prefactor 2 h (kev2freq)^3 / c^2 / freq2kev, folded in exact
# host-side f64 (see the device-range note inside blackbody_Iv)
_BB_PREF = float(2.0 * consts.planck_h * consts.kev2freq ** 3
                 / consts.speed_of_light ** 2 / consts.freq2kev)


def blackbody_Iv(T, hardf, cos_mu, E):
    """Specific intensity of blackbody radiation at energy E [keV] from a
    surface of temperature T [K], hardening factor `hardf` and limb
    darkening for cos_mu >= 0 (isotropic for cos_mu < 0).

    Returns [erg cm-2 s-1 keV-1 srad-1].  (sim5radiation.c:25-48)
    """
    T, hardf, cos_mu, E = jnp.broadcast_arrays(
        *(jnp.asarray(v, jnp.float64) for v in (T, hardf, cos_mu, E)))
    limbf = jnp.where(cos_mu >= 0.0, 0.5 + 0.75 * cos_mu, 1.0)
    Tsafe = jnp.where(T > 0.0, T, 1.0)
    # clamp the Planck exponent: beyond ~350 the intensity underflows to 0
    # anyway, while expm1's gradient (exp(u)/expm1(u)^2) overflows to
    # inf/inf = NaN and would poison reverse-mode through masked lanes
    u = jnp.minimum((consts.planck_h * consts.kev2freq * E)
                    / (consts.boltzmann_k * hardf * Tsafe), 350.0)
    # expm1_accurate: XLA's f32 TPU expm1 is ~1.1e-4 relative, which
    # would dominate fast-mode spectra (utils/fastmath.py); exact in f64.
    # The Planck prefactor 2 h freq^3 / c^2 is folded into ONE host-side
    # Python constant: TPU "f64" is an f32 pair with f32's EXPONENT RANGE
    # (max ~3.4e38), so the intermediate freq^3 ~ 1e52 would overflow to
    # NaN on device (it did -- every spectrum NaN'd on the chip while CPU
    # f64 passed); E^3 <= 1e9 stays comfortably in range
    from ..utils.fastmath import expm1_accurate
    val = (limbf * _BB_PREF * E ** 3 / hardf ** 4 / expm1_accurate(u))
    return jnp.where(T > 0.0, val, 0.0)


def blackbody(T, hardf, cos_mu, E):
    """Vectorized blackbody spectrum over an energy array.  (sim5radiation.c:53-78)"""
    return blackbody_Iv(T, hardf, cos_mu, E)


def blackbody_photons(T, hardf, cos_mu, E):
    """Specific photon intensity [photons cm-2 s-1 keV-1 srad-1].

    (sim5radiation.c:83-93)
    """
    return blackbody_Iv(T, hardf, cos_mu, E) / (E * consts.kev2erg)


def blackbody_photons_total(T, hardf):
    """Total photon rate from a blackbody surface [photons cm-2 s-1 srad-1].

    (sim5radiation.c:96-113)
    """
    T = jnp.asarray(T, jnp.float64)
    # (k_B/h)^3/c^2 folded host-side: k_B^3 ~ 2.6e-48 and h^3 ~ 2.9e-79
    # underflow the TPU f32-pair "f64" range (see blackbody_Iv)
    pref = float(consts.boltzmann_k ** 3 / consts.planck_h ** 3
                 / consts.speed_of_light2)
    return jnp.pi * 4.808227612 * T ** 3 * pref / hardf


def blackbody_photon_energy_random(key, T, shape=()):
    """Sample photon energies [keV] from a Planck distribution at temperature
    T [K] using the Barlow/Carter rejection-free scheme
    (arXiv:1307.3635 sec 3.3.1).

    The reference uses thread-local MT19937 (sim5radiation.c:118-140); here
    sampling is deterministic given a jax PRNG key (counter-based, shardable).
    """
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape, jnp.float64)
    u234 = jax.random.uniform(k2, shape + (3,), jnp.float64)
    # choose mode m with P(m) ~ 1/m^3 via inverse CDF against 1.202*u1
    MMAX = 64
    j = jnp.arange(1, MMAX + 1, dtype=jnp.float64)
    cum = jnp.cumsum(1.0 / j ** 3)
    m = 1.0 + jnp.sum((1.202 * u1[..., None] >= cum), axis=-1)
    return (consts.boltzmann_k * T * (-jnp.log(jnp.prod(u234, -1))) / m
            * consts.erg2kev)
