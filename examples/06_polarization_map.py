"""Polarized disk image: Stokes I/Q/U maps (Walker-Penrose transport).

Run: python examples/06_polarization_map.py [spin] [incl_deg] [npix]
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

import sys

import numpy as np

from sim5_tpu.disk import nt_setup
from sim5_tpu.render import render_polarized_image
from sim5_tpu.polarization import stokes_poldeg, stokes_polang

a = float(sys.argv[1]) if len(sys.argv) > 1 else 0.9
inc = float(sys.argv[2]) if len(sys.argv) > 2 else 70.0
N = int(sys.argv[3]) if len(sys.argv) > 3 else 256

disk = nt_setup(10.0, a, 0.1, 0.1)
I, Q, U = render_polarized_image(disk, np.radians(inc), N, N)
I, Q, U = map(np.asarray, (I, Q, U))

np.save("stokes_I.npy", I)
np.save("stokes_Q.npy", Q)
np.save("stokes_U.npy", U)

hit = I > 0
pd = np.asarray(stokes_poldeg(I[hit], Q[hit], U[hit]))
print(f"pixels on disk: {hit.sum()}", file=sys.stderr)
print(f"integrated poldeg: {np.hypot(Q.sum(), U.sum())/I.sum():.4f}",
      file=sys.stderr)
print(f"integrated polangle: "
      f"{np.degrees(float(stokes_polang(I.sum(), Q.sum(), U.sum()))):.2f} deg",
      file=sys.stderr)
print("saved stokes_I.npy / stokes_Q.npy / stokes_U.npy", file=sys.stderr)
