"""Example 11: optically-thick volume radiative transfer.

Images a translucent emitting torus around a Kerr black hole with BOTH
emissivity and absorption fused into the ray-march kernel
(I = int j e^{-tau} dl, tau = int alpha dl accumulated toward the
observer), and prints how the total flux saturates as the medium turns
optically thick -- the classic source-function limit.

Beyond the reference: sim5's stepwise engine carries no radiative
transfer at all (the march is geometry-only, sim5raytrace.c); here the
transfer runs inside the Pallas TPU kernel (or the XLA twin on CPU).

Usage: python examples/11_thick_volume_transfer.py [spin] [incl_deg]
"""

import pathlib as _pl
import sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import os as _os
if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # the container sitecustomize force-registers the TPU backend; honor
    # an explicit CPU request (CI runs the examples on the CPU backend)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import os
import sys

import numpy as np
import jax.numpy as jnp

from sim5_tpu.render.lightcurve import volume_image

spin = float(sys.argv[1]) if len(sys.argv) > 1 else 0.9
incl = float(sys.argv[2]) if len(sys.argv) > 2 else 70.0


def torus_j(t, r, m, phi):
    """Gaussian torus of emissivity at r=8, scale height 1.5."""
    R = r * jnp.sqrt(jnp.maximum(1.0 - m * m, 0.0))
    z = r * m
    return jnp.exp(-0.5 * (((R - 8.0) / 1.5) ** 2 + (z / 1.5) ** 2))


def make_alpha(alpha0):
    def torus_alpha(t, r, m, phi):
        return alpha0 * torus_j(t, r, m, phi)
    return torus_alpha


FAST = bool(os.environ.get("SIM5_FAST"))  # tiny-shape CI mode
kw = (dict(npix=24, rmax=16.0, r_start=30.0, max_steps=400,
           precision=0.03) if FAST else
      dict(npix=64, rmax=16.0, r_start=40.0, max_steps=2000,
           precision=0.02))
print(f"# optically-thick torus transfer: a={spin} incl={incl} deg")
print("# alpha0   total_flux   peak_I")
for alpha0 in ((0.0, 0.2) if FAST else (0.0, 0.05, 0.2, 1.0, 5.0)):
    I = np.asarray(volume_image(spin, np.radians(incl), torus_j,
                                absorption_fn=make_alpha(alpha0)
                                if alpha0 > 0 else None, **kw))
    print(f"{alpha0:7.2f}  {I.sum():12.5e}  {I.max():12.5e}")
print("# flux saturates as alpha grows: the torus becomes a photosphere")
