"""Observed spectrum of a thin NT disk (blackbody + hardening + limb dk).

Mirrors the reference DiskRaytrace.spectrum driver
(python/sim5diskraytrace.py:43-134) with batched device-side raytracing.

Run: python examples/05_disk_spectrum.py [spin] [incl_deg]
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

from sim5_tpu.disk import ThinDisk
from sim5_tpu.render import DiskRaytrace, DiskSpectrum_BlackBody

a = float(sys.argv[1]) if len(sys.argv) > 1 else 0.7
inc = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0

disk = ThinDisk.create(bh_mass=10.0, bh_spin=a, mdot_or_L=0.1)
rt = DiskRaytrace(10.0, a, 10.0, disk, DiskSpectrum_BlackBody())

FAST = bool(os.environ.get("SIM5_FAST"))  # tiny-shape CI mode
E = np.geomspace(0.1, 50.0, 16 if FAST else 64)
spec_f, spec_0 = rt.spectrum(inc, E, radres=1.2 if FAST else 0.3,
                             angres=10 if FAST else 45)

print("# E[keV]  Fe_hardened[erg/s/cm2/keV]  Fe_bb[erg/s/cm2/keV]")
for e, s1, s2 in zip(E, spec_f, spec_0):
    print(f"{e:.5e}  {s1:.5e}  {s2:.5e}")
