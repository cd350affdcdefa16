"""Radiative processes: blackbody emission with hardening and limb darkening.

(reference: sim5radiation.c)
"""

import jax
import jax.numpy as jnp

from .. import consts


def blackbody_Iv(T, hardf, cos_mu, E):
    """Specific intensity of blackbody radiation at energy E [keV] from a
    surface of temperature T [K], hardening factor `hardf` and limb
    darkening for cos_mu >= 0 (isotropic for cos_mu < 0).

    Returns [erg cm-2 s-1 keV-1 srad-1].  (sim5radiation.c:25-48)
    """
    T, hardf, cos_mu, E = jnp.broadcast_arrays(
        *(jnp.asarray(v, jnp.float64) for v in (T, hardf, cos_mu, E)))
    limbf = jnp.where(cos_mu >= 0.0, 0.5 + 0.75 * cos_mu, 1.0)
    freq = consts.kev2freq * E
    Tsafe = jnp.where(T > 0.0, T, 1.0)
    # clamp the Planck exponent: beyond ~350 the intensity underflows to 0
    # anyway, while expm1's gradient (exp(u)/expm1(u)^2) overflows to
    # inf/inf = NaN and would poison reverse-mode through masked lanes
    u = jnp.minimum((consts.planck_h * freq)
                    / (consts.boltzmann_k * hardf * Tsafe), 350.0)
    # expm1_accurate: XLA's f32 TPU expm1 is ~1.1e-4 relative, which
    # would dominate fast-mode spectra (utils/fastmath.py); exact in f64
    from ..utils.fastmath import expm1_accurate
    val = (limbf * 2.0 * consts.planck_h * freq ** 3 / consts.speed_of_light ** 2
           / hardf ** 4 / expm1_accurate(u) * (1.0 / consts.freq2kev))
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
    return (jnp.pi * 4.808227612 * T ** 3 * consts.boltzmann_k ** 3
            / consts.planck_h ** 3 / consts.speed_of_light2 / hardf)


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
