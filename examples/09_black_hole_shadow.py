"""Black-hole shadow + plunging-region image (beyond the reference).

Renders the full equatorial plane down to the horizon: NT disk outside
the ISCO, the Cunningham plunging flow's redshift map inside it (with an
optional power-law inner emissivity so the inner glow is visible), and
the exact captured-ray silhouette.  The reference cannot produce this
image at all -- its analytic engine leaves the plunging trajectory types
NaN (sim5kerr-geod.c:322-352).

Run: python examples/09_black_hole_shadow.py <spin> <inclination_deg> [npix]
Outputs shadow_<spin>_<incl>.npz with captured/r/g/flux maps.
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
from sim5_tpu.render import render_bh_image

a = float(sys.argv[1]) if len(sys.argv) > 1 else 0.998
inc_deg = float(sys.argv[2]) if len(sys.argv) > 2 else 80.0
N = int(sys.argv[3]) if len(sys.argv) > 3 else 512

if not (0.0 <= a <= 0.999) or not (0.0 <= inc_deg <= 89.0):
    sys.exit("ERROR: parameters out of range (spin 0..0.999, incl 0..89)")

disk = nt_setup(10.0, a, 0.1, 0.1)
render = jax.jit(lambda incl: render_bh_image(
    a, incl, N, N, rmax=10.0, disk=disk,
    inner_emissivity=lambda r: 1e22 * r ** -3))

print("Computing ...", file=sys.stderr)
t0 = time.perf_counter()
im = jax.block_until_ready(render(np.radians(inc_deg)))
dt = time.perf_counter() - t0

cap = np.asarray(im.captured)
g = np.asarray(im.g)
print(f"time: {dt:.2f} s  rate: {N * N / dt:.3e} photons/s", file=sys.stderr)
print(f"shadow fraction: {cap.mean():.4f}; "
      f"g range on emission: [{g[np.asarray(im.hit)].min():.3f}, "
      f"{g[np.asarray(im.hit)].max():.3f}]", file=sys.stderr)

out = f"shadow_{a}_{inc_deg}.npz"
np.savez(out, captured=cap, r=np.asarray(im.r), g=g,
         flux=np.asarray(im.flux))
print(f"wrote {out}", file=sys.stderr)
