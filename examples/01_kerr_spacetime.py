"""Characteristic Kerr orbit radii vs spin.

TPU-native twin of the reference example 01
(examples/01-kerr-spacetime/kerr-orbits.c): one vectorized evaluation over
the whole spin grid instead of a scalar loop.

Run: python examples/01_kerr_spacetime.py
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

import numpy as np

from sim5_tpu.core import r_bh, r_ph, r_mb, r_ms

a = np.arange(0.0, 1.0, 0.01)

print("# Locations of black-hole horizon (r_bh), photon orbit radius (r_ph),")
print("# marginally bound orbit (r_mb) and marginally stable orbit (r_ms)")
print("# in Kerr spacetime as a function of black-hole spin.")
print("# Line format: spin  r_bh  r_ph  r_mb  r_ms")
print("# Units: gravitational radius [GM/c2]")
print("# ----")

for ai, bh, ph, mb, ms in zip(a, np.asarray(r_bh(a)), np.asarray(r_ph(a)),
                              np.asarray(r_mb(a)), np.asarray(r_ms(a))):
    print(f"{ai:.4f}  {bh:e}  {ph:e}  {mb:e}  {ms:e}")
