"""sim5_tpu -- a TPU-native differentiable framework for GR raytracing and
radiation transport in Kerr spacetime.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the SIM5 C
library (reference: mbursa/sim5): null geodesics in Kerr spacetime via both a
closed-form analytic engine (quartic roots + elliptic integrals) and a
batched stepwise integrator, Novikov-Thorne thin-disk models,
Walker-Penrose polarization transport, blackbody radiation, and
disk image / spectrum rendering -- all as pure, batched, differentiable
functions that shard over TPU device meshes.

Design notes
------------
* Everything is a pure function over (batches of) ray states; per-ray C
  loops of the reference become `vmap`/`lax` array programs.
* Double precision is required by the physics (elliptic moduli and root
  cancellations); the package enables jax x64 on import.  Hot paths offer
  explicit f32 variants where precision permits.
* Parallelism: pixels/rays shard over a `jax.sharding.Mesh`
  (`sim5_tpu.parallel`); ray path length stays device-local.
"""

import jax as _jax

# The analytic geodesic engine needs f64: quartic-root cancellations and
# elliptic moduli lose the 1e-6 image-accuracy gate in f32.
# (reference behaviour: C `double` throughout, see /root/reference/src/*.c)
_jax.config.update("jax_enable_x64", True)

from . import consts
from . import special
from . import core
from . import geodesic
from . import march
from . import polarization
from . import disk
from . import radiation
from . import render
from . import parallel
from . import tables

__version__ = "0.1.0"


def fast_precision():
    """Context manager: run the compute path in float32 ("fast mode").

    Inside `with sim5_tpu.fast_precision():` every pipeline runs f32 --
    on TPU this is ~10-20x faster than the (emulated) f64 default.
    Measured accuracy vs the f64 path (round 4): the 512^2 Kerr a=0.998
    disk image matches to 4.3e-6 of peak on-chip with an identical hit
    footprint (bench.py gates <=5e-6 every run), and disk spectra match
    to <=8e-7 relative across the full quadrature grid (far-field +
    degenerate-lane robust; docs/performance.md).  (TPU's approximate
    f32 transcendentals would cost 2-4 decades here; the hot paths use
    the software replacements in utils/fastmath.py.)  Use the default
    f64 mode when the full <=1e-6 parity with the C reference is
    required.
    """
    return _jax.enable_x64(False)
