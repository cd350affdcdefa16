"""Example 12: fault-tolerant surveys -- a checkpointed hot-spot
lightcurve sweep plus a thick-disk image sharded over the device mesh.

Part 1 computes a long hot-spot lightcurve in chunks with
kill-and-resume checkpointing (render/checkpoint.py): interrupt this
script at any point and re-run it -- it continues from the last flushed
chunk and the final curve is bitwise identical to an uninterrupted run.
The reference can resume only spectral-table grids
(sim5fitstable.py:105-140); long imaging/timing jobs restart from zero.

Part 2 renders a slim (cone) disk image through the batched
surface-intersection march, sharded across all available devices with
`DiskRaytrace.image(mesh=...)` -- the reference's thick-disk path is a
per-pixel Python loop (sim5diskraytrace.py:257-336).

Usage: python examples/12_checkpointed_survey.py [spin] [incl_deg]
"""

import os
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the container sitecustomize force-registers the TPU backend; honor
    # an explicit CPU request (e.g. the 8-device virtual mesh) anyway
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from sim5_tpu.core import OmegaK, ellK
from sim5_tpu.parallel import make_mesh
from sim5_tpu.render import (DiskRaytrace, DiskSpectrum_BlackBody,
                             FrameCheckpoint,
                             hotspot_lightcurve_checkpointed)

a = float(sys.argv[1]) if len(sys.argv) > 1 else 0.7
inc = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0

# --- part 1: checkpointed lightcurve sweep -----------------------------
FAST = bool(os.environ.get("SIM5_FAST"))  # tiny-shape CI mode
r_spot = 8.0
period = 2 * np.pi / float(OmegaK(r_spot, a))
nt_ = 8 if FAST else 64
t = np.arange(nt_) / nt_ * 2 * period
ck_path = ("/tmp/sim5_example12_lc_fast.npz" if FAST
           else "/tmp/sim5_example12_lc.npz")
if FAST and os.path.exists(ck_path):
    os.remove(ck_path)   # CI exercises a fresh compute every run

t, lc = hotspot_lightcurve_checkpointed(
    ck_path, a, np.radians(inc), r_spot, 0.7, t,
    npix=32 if FAST else 128, n_orders=1 if FAST else 2,
    chunk=4 if FAST else 8)
done, total = FrameCheckpoint.open(ck_path).progress
print(f"# lightcurve checkpoint: {done}/{total} chunks at {ck_path}",
      file=sys.stderr)
print(f"# modulation: {lc.max() / lc.min():.2f}x", file=sys.stderr)

# --- part 2: mesh-sharded thick-disk image -----------------------------


class ConeDisk:
    """Toy slim disk: photosphere at H = 0.05 R outside r=6."""
    slope = 0.05

    def mdot(self):
        return jnp.asarray(0.1)

    def lumi(self):
        return jnp.asarray(0.1)

    def flux(self, r):
        return jnp.where(r > 6.0, 1.0 / jnp.maximum(r, 1.0) ** 3, 0.0)

    def t_eff(self, r):
        return jnp.where(r > 6.0, 1e7 / jnp.maximum(r, 1.0) ** 0.75, 0.0)

    def sigma(self, r):
        return jnp.ones_like(r)

    def ell(self, r):
        return ellK(jnp.maximum(r, 6.0), a)

    def vr(self, r):
        return jnp.zeros_like(r)

    def h(self, r):
        return self.slope * r

    def dhdr(self, r):
        return jnp.full_like(r, self.slope)


mesh = make_mesh()
rt = DiskRaytrace(10.0, a, 10.0, ConeDisk(), DiskSpectrum_BlackBody())
im = rt.image(inc, 25.0, 24 if FAST else 96, mesh=mesh)
F = np.asarray(im["flux"])
H = np.asarray(im["H"])
hit = np.isfinite(F)
print(f"# thick-disk image on {len(mesh.devices.ravel())} device(s): "
      f"{hit.mean():.0%} hit, max surface height "
      f"{np.nanmax(np.abs(H)):.2f} rg", file=sys.stderr)

print("# t[GM/c^3]  flux[arb]")
for ti, fi in zip(t, lc):
    print(f"{ti:.4e}  {fi:.6e}")
