"""Benchmark: rays/sec on the 512^2 Kerr (a=0.998) NT-disk image render.

This is BASELINE config #2 (the reference's headline workload,
examples/04-disk-image-eqplane).  The reference achieves ~1e5 photons/s on
one CPU core (examples/04-disk-image-eqplane/README.md:5); `vs_baseline`
is the speedup over that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever JAX platform the environment provides (real TPU chip under
the driver; CPU otherwise).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import sim5_tpu  # noqa: F401  (enables x64)
    from sim5_tpu.disk import nt_setup
    from sim5_tpu.render import render_disk_image

    NPIX = 512
    A, INCL, MDOT = 0.998, np.radians(80.0), 0.1

    @jax.jit
    def render(a, incl, mdot):
        disk = nt_setup(10.0, a, mdot, 0.1)
        return render_disk_image(disk, incl, NPIX, NPIX)

    # compile + warmup
    imf, img = render(A, INCL, MDOT)
    imf.block_until_ready()
    assert bool(jnp.isfinite(imf).all()), "render produced non-finite pixels"
    assert float(imf.max()) > 0.0, "render produced an empty image"

    # timed runs (vary spin slightly to defeat any result caching; block on
    # every iteration so async dispatch cannot hide device time)
    n_rep = 10
    t0 = time.perf_counter()
    for i in range(n_rep):
        imf, img = render(A - 1e-6 * i, INCL, MDOT)
        imf.block_until_ready()
    dt = time.perf_counter() - t0

    rays_per_sec = n_rep * NPIX * NPIX / dt
    baseline = 1e5  # reference: ~1e5 photons/s, 1 CPU core
    print(json.dumps({
        "metric": "rays_per_sec_512sq_kerr_image",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / baseline,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
