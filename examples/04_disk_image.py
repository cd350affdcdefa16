"""Equatorial NT-disk image (flux + g-factor maps).

TPU-native twin of the reference example 04
(examples/04-disk-image-eqplane/disk-image.c): the whole pixel grid renders
as one jitted array program; prints the photon rate like the reference.

Run: python examples/04_disk_image.py <spin> <inclination_deg> [npix]
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
import time

import numpy as np

import jax
from sim5_tpu.disk import nt_setup
from sim5_tpu.render import render_disk_image

a = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
inc_deg = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
N = int(sys.argv[3]) if len(sys.argv) > 3 else 512

if not (0.0 <= a <= 0.999) or not (0.0 <= inc_deg <= 89.0):
    sys.exit("ERROR: parameters out of range (spin 0..0.999, incl 0..89)")

disk = nt_setup(10.0, a, 0.1, 0.1)
render = jax.jit(lambda incl: render_disk_image(disk, incl, N, N))

print("Computing ...", file=sys.stderr)
t0 = time.perf_counter()
image_f, image_g = render(np.radians(inc_deg))
image_f.block_until_ready()
t1 = time.perf_counter()
print("done", file=sys.stderr)
print("Profiling:", file=sys.stderr)
print(f"    photons: {N * N}", file=sys.stderr)
print(f"    time: {t1 - t0:.2f} s (incl. compile)", file=sys.stderr)
print(f"    rate: {N * N / (t1 - t0):.1f} photons/s", file=sys.stderr)

image_f, image_g = np.asarray(image_f), np.asarray(image_g)
np.save("disk_image_flux.npy", image_f)
np.save("disk_image_gfactor.npy", image_g)
print("saved disk_image_flux.npy / disk_image_gfactor.npy", file=sys.stderr)
