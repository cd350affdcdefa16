"""Error-budget decomposition of the f32 fast render path.

Renders the 512^2 a=0.998 i=80deg frame several ways and reports
max|img - img_f64| / peak for each, attributing the fast path's residual
to pipeline stages (round-3 VERDICT task #1: land <=5e-6 of peak).

Variants:
  full32      : the production f32 path (bench.py's timed configuration)
  init64      : geodesic_init_inf traced in f64, cache cast to f32,
                midplane crossing + r(P) + shading in f32
  mid64       : init + midplane P + r(P) in f64, shade (gfactor+flux) f32
  sens_lq     : full f64 pipeline, but (l, q) rounded through f32 --
                forward sensitivity of the image to motion-constant
                rounding alone (the round-3 "irreducible" claim)
  sens_ab     : full f64 pipeline with (alpha, beta) rounded through f32

Run on CPU (IEEE f32) by default; pass --tpu to measure on the chip.
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--npix", type=int, default=512)
    args = ap.parse_args()

    import os
    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_diag")
    import jax.numpy as jnp
    import sim5_tpu  # noqa: F401 (enables x64)
    from sim5_tpu.disk import nt_setup, nt_flux
    from sim5_tpu.render import render_disk_image
    from sim5_tpu.render.image import image_grid
    from sim5_tpu.core import gfactorK
    from sim5_tpu.geodesic import (
        geodesic_init_inf, geodesic_find_midplane_crossing,
        geodesic_position_rad)

    NPIX = args.npix
    A, INCL, MDOT = 0.998, float(np.radians(80.0)), 0.1

    def cast32(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, tree)

    @jax.jit
    def render64(a, incl, mdot):
        disk = nt_setup(10.0, a, mdot, 0.1)
        imf, _ = render_disk_image(disk, incl, NPIX, NPIX)
        return imf

    ref = np.asarray(render64(A, INCL, MDOT))
    peak = ref.max()

    def report(tag, img):
        img = np.asarray(img, np.float64)
        mis = (img > 0) != (ref > 0)
        err = np.abs(img - ref)[~mis].max() / peak
        print(f"{tag:10s}  err={err:.3e}  mismatched_px={int(mis.sum())}")
        return err

    # ---- full32 (production fast path)
    with jax.enable_x64(False):
        @jax.jit
        def render32(a, incl, mdot):
            disk = nt_setup(10.0, a, mdot, 0.1)
            imf, _ = render_disk_image(disk, incl, NPIX, NPIX)
            return imf
        img = render32(jnp.float32(A), jnp.float32(INCL), jnp.float32(MDOT))
    report("full32", img)

    # ---- staged pipeline with a precision split point
    def staged(split):
        """split: 'init64' (cast after init) or 'mid64' (cast after r)."""
        def fn(a64, incl64, mdot64):
            # f64 section
            disk64 = nt_setup(10.0, a64, mdot64, 0.1)
            rms = disk64.rms - 1e-3
            rmax = rms + 8.0
            alpha, beta = image_grid(NPIX, NPIX, rmax)
            g = geodesic_init_inf(incl64, a64, alpha, beta)
            if split == "init64":
                with jax.enable_x64(False):
                    g32 = cast32(g)
                    disk = cast32(disk64)
                    rms32 = jnp.float32(rms)

                    def shade(order):
                        P = geodesic_find_midplane_crossing(g32, order)
                        r = geodesic_position_rad(g32, P)
                        hit = jnp.isfinite(r) & (r >= rms32) & (g32.status == 0)
                        r_safe = jnp.where(hit, r, rms32 + 1.0)
                        gf = gfactorK(r_safe, disk.a, g32.l)
                        f = nt_flux(disk, r_safe)
                        return (jnp.isfinite(P), hit,
                                jnp.where(hit, f * gf ** 4, 0.0))
                    has0, hit0, f0 = shade(0)
                    _, hit1, f1 = shade(1)
                    use1 = has0 & ~hit0
                    return jnp.where(hit0, f0, jnp.where(use1, f1, 0.0))
            # mid64: midplane crossing and r in f64 too
            def solve(order):
                P = geodesic_find_midplane_crossing(g, order)
                r = geodesic_position_rad(g, P)
                return jnp.isfinite(P), r
            has0, r0 = solve(0)
            _, r1 = solve(1)
            with jax.enable_x64(False):
                disk = cast32(disk64)
                rms32 = jnp.float32(rms)
                l32 = g.l.astype(jnp.float32)

                def shade32(r64):
                    r = r64.astype(jnp.float32)
                    hit = jnp.isfinite(r) & (r >= rms32)
                    r_safe = jnp.where(hit, r, rms32 + 1.0)
                    gf = gfactorK(r_safe, disk.a, l32)
                    f = nt_flux(disk, r_safe)
                    return hit, jnp.where(hit, f * gf ** 4, 0.0)
                hit0, f0 = shade32(r0)
                hit1, f1 = shade32(r1)
                use1 = has0 & ~hit0
                return jnp.where(hit0, f0, jnp.where(use1, f1, 0.0))
        return jax.jit(fn)

    report("init64", staged("init64")(A, INCL, MDOT))
    report("mid64", staged("mid64")(A, INCL, MDOT))

    # ---- forward sensitivity: full f64 with f32-rounded inputs
    def sens(what):
        def fn(a, incl, mdot):
            disk = nt_setup(10.0, a, mdot, 0.1)
            rms = disk.rms - 1e-3
            rmax = rms + 8.0
            alpha, beta = image_grid(NPIX, NPIX, rmax)
            if what == "ab":
                alpha = alpha.astype(jnp.float32).astype(jnp.float64)
                beta = beta.astype(jnp.float32).astype(jnp.float64)
            g = geodesic_init_inf(incl, a, alpha, beta)
            if what == "lq":
                g = g._replace(l=g.l.astype(jnp.float32).astype(jnp.float64),
                               q=g.q.astype(jnp.float32).astype(jnp.float64))
                # re-derive everything downstream of (l, q) in f64
                g = geodesic_init_inf(incl, a, alpha, beta)._replace(
                    l=g.l, q=g.q)
                from sim5_tpu.geodesic.analytic import _R_roots, _T_roots
                rr, _rr_lo, ri, nrr, gtype, rp, Rpc, st_r = _R_roots(
                    g.a, g.l, g.q, jnp.full_like(g.a, 1e300))
                m2p, m2m, mm, mK, st_t = _T_roots(g.a, g.l, g.q, g.cos_i)
                g = g._replace(rr=rr, ri=ri, nrr=nrr, gtype=gtype, rp=rp,
                               Rpc=Rpc, m2p=m2p, m2m=m2m, mm=mm, mK=mK)
                # Tpp/Tip still from the unrounded init (theta-part only)
            def shade(order):
                P = geodesic_find_midplane_crossing(g, order)
                r = geodesic_position_rad(g, P)
                hit = jnp.isfinite(r) & (r >= rms) & (g.status == 0)
                r_safe = jnp.where(hit, r, rms + 1.0)
                gf = gfactorK(r_safe, disk.a, g.l)
                f = nt_flux(disk, r_safe)
                return jnp.isfinite(P), hit, jnp.where(hit, f * gf ** 4, 0.0)
            has0, hit0, f0 = shade(0)
            _, hit1, f1 = shade(1)
            use1 = has0 & ~hit0
            return jnp.where(hit0, f0, jnp.where(use1, f1, 0.0))
        return jax.jit(fn)

    report("sens_ab", sens("ab")(A, INCL, MDOT))
    report("sens_lq", sens("lq")(A, INCL, MDOT))
    return 0


if __name__ == "__main__":
    sys.exit(main())
