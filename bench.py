"""Benchmark: rays/sec on the 512^2 Kerr (a=0.998) NT-disk image render.

This is BASELINE config #2 (the reference's headline workload,
examples/04-disk-image-eqplane).  The reference achieves ~1e5 photons/s on
one CPU core (examples/04-disk-image-eqplane/README.md:5); `vs_baseline`
is the speedup over that number.

The timed path is the f32 fast mode; every benchmark run first renders the
f64 reference image (the accuracy-gated path validated to <=1e-6 against
the C reference in tests/) and asserts the fast image matches it to 2e-3
of peak with an identical hit footprint -- so the reported throughput is
for verified-correct output.  (Measured fast-path accuracy: 1.1e-3 of peak
on TPU whose f32 transcendentals are approximate, 1.1e-5 in IEEE f32 on
CPU; the f64 default path is the <=1e-6 parity-grade engine.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
    A, INCL, MDOT = 0.998, float(np.radians(80.0)), 0.1

    @jax.jit
    def render64(a, incl, mdot):
        disk = nt_setup(10.0, a, mdot, 0.1)
        return render_disk_image(disk, incl, NPIX, NPIX)

    # f64 reference image (accuracy anchor)
    ref_f, _ = render64(A, INCL, MDOT)
    ref_f = np.asarray(ref_f)
    assert np.isfinite(ref_f).all() and ref_f.max() > 0.0

    with jax.enable_x64(False):
        @jax.jit
        def render32(a, incl, mdot):
            disk = nt_setup(10.0, a, mdot, 0.1)
            return render_disk_image(disk, incl, NPIX, NPIX)

        imf, img = render32(A, INCL, MDOT)
        imf32 = np.asarray(imf)
        # verification: identical hit footprint, <=2e-3 of peak
        assert ((imf32 > 0) == (ref_f > 0)).all(), "hit footprint mismatch"
        err = np.max(np.abs(imf32 - ref_f)) / ref_f.max()
        assert err < 2e-3, f"fast-path accuracy {err:.2e} exceeds gate"

        # timed runs (vary spin in the last mantissa bits to defeat result
        # caching; block every iteration)
        n_rep = 20
        t0 = time.perf_counter()
        for i in range(n_rep):
            imf, img = render32(A - 1e-6 * i, INCL, MDOT)
            imf.block_until_ready()
        dt = time.perf_counter() - t0

    rays_per_sec = n_rep * NPIX * NPIX / dt
    baseline = 1e5  # reference: ~1e5 photons/s, 1 CPU core
    print(json.dumps({
        "metric": "rays_per_sec_512sq_kerr_image_f32_verified",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / baseline,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
