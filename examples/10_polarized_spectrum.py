"""Example 10: Stokes-resolved disk spectrum (energy-dependent polarization).

Renders the polarized NT-disk spectrum at two inclinations and prints the
energy-resolved polarization degree and angle -- the observable of X-ray
polarimetry missions (IXPE-style).  Beyond the reference: sim5 ships the
Walker-Penrose transport (sim5polarization.c) but no polarized spectral
product.

Usage: python examples/10_polarized_spectrum.py [spin] [incl_deg]
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

from sim5_tpu.disk import nt_setup
from sim5_tpu.render import polarized_spectrum

spin = float(sys.argv[1]) if len(sys.argv) > 1 else 0.9
incl = float(sys.argv[2]) if len(sys.argv) > 2 else 70.0

disk = nt_setup(10.0, spin, 0.1, 0.1)
FAST = bool(os.environ.get("SIM5_FAST"))  # tiny-shape CI mode
E = np.geomspace(0.3, 10.0, 8 if FAST else 20)
I, Q, U = polarized_spectrum(disk, np.radians(incl), jnp.asarray(E),
                             npix=48 if FAST else 192)
I, Q, U = map(np.asarray, (I, Q, U))

deg = np.hypot(Q, U) / np.maximum(I, 1e-300)
ang = 0.5 * np.degrees(np.arctan2(U, Q))

print(f"# polarized disk spectrum: a={spin} incl={incl} deg")
print("# E[keV]  I[erg/s/cm2/keV]  degree  angle[deg]")
for i in range(len(E)):
    print(f"{E[i]:8.3f}  {I[i]:.6e}  {deg[i]:.5f}  {ang[i]:8.3f}")
