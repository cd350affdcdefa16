"""Scaling-efficiency harness: rays/s vs device count.

Two measurements, one JSON line:

* `virtual`: the 512^2 Kerr NT-disk render (BASELINE config #2), pixel-rows
  sharded over an N-device mesh for N in {1, 2, 4, 8} **virtual CPU
  devices** (`xla_force_host_platform_device_count`).  All collective
  structure (row sharding, psum'd reductions) is real; the devices share
  one host's cores, so these numbers validate partition/collective
  overhead (throughput must NOT degrade as N grows), not true multi-chip
  speedup -- there is no pod on this harness (BASELINE.md: >=85%
  multi-host efficiency target needs N>=2 hosts).  Each worker runs in a
  subprocess so the device count is set before jax import.

* `real_chip`: rays/s/chip on the actual TPU at two sweep batch sizes
  (the per-chip term of the pod-scaling product; multiply by N chips
  under the >=85% target the moment hardware exists).

The reference has no parallel runtime at all (README.md:200-202), so this
is north-star tooling, not parity.

Usage: python bench_scaling.py            # full harness, prints one JSON line
       python bench_scaling.py --worker N # internal: one virtual-mesh worker
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NPIX = 512
SWEEP_VIRTUAL = 4      # frames per dispatch on the CPU mesh
REPS = 3


def _sweep_rays_per_sec(mesh, sweep, reps, a0=0.9, npix=NPIX):
    """Time `reps` dispatches of a `sweep`-frame spin sweep of 512^2
    sharded renders; returns rays/s."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sim5_tpu.core import r_ms
    from sim5_tpu.parallel.mesh import _render_from_grid
    from sim5_tpu.render.image import image_grid

    rmax = float(r_ms(a0)) + 8.0
    alpha, beta = image_grid(npix, npix, rmax)
    sh = NamedSharding(mesh, P("rays", None))
    alpha = jax.device_put(jnp.broadcast_to(alpha, (npix, npix)), sh)
    beta = jax.device_put(jnp.broadcast_to(beta, (npix, npix)), sh)
    incl = float(np.radians(80.0))

    @jax.jit
    def render_sweep(a0):
        def one(a):
            imf, _ = _render_from_grid(10.0, a, 0.1, 0.1, incl,
                                       alpha, beta, npix, npix)
            return imf.sum() * 1e-25
        spins = a0 - 2e-4 * jnp.arange(sweep, dtype=alpha.dtype)
        return jax.lax.map(one, spins)

    out = np.asarray(render_sweep(a0))          # compile + warm
    assert np.isfinite(out).all() and (out > 0).all()
    t0 = time.perf_counter()
    for i in range(reps):
        float(np.asarray(render_sweep(a0 - 1e-6 * (i + 1))).sum())
    dt = time.perf_counter() - t0
    return reps * sweep * npix * npix / dt


def worker(n_devices):
    """One virtual-mesh measurement (run in a subprocess)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{n_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import sim5_tpu  # noqa: F401
    from sim5_tpu.parallel import make_mesh

    with jax.enable_x64(False):
        mesh = make_mesh(jax.devices()[:n_devices])
        rate = _sweep_rays_per_sec(mesh, SWEEP_VIRTUAL, REPS)
    print(json.dumps({"n_devices": n_devices, "rays_per_sec": rate}))
    return 0


def real_chip():
    """rays/s/chip on the real TPU at two sweep batch sizes."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import sim5_tpu  # noqa: F401
    from sim5_tpu.parallel import make_mesh

    if jax.default_backend() == "cpu":
        return {}
    out = {}
    with jax.enable_x64(False):
        mesh = make_mesh(jax.devices())
        for sweep in (64, 256):
            out[f"sweep{sweep}"] = _sweep_rays_per_sec(mesh, sweep, REPS)
    return out


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        return worker(int(sys.argv[2]))

    virtual = {}
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    for n in (1, 2, 4, 8):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            capture_output=True, text=True, env=env, timeout=1800)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-2000:])
            raise SystemExit(f"virtual worker n={n} failed")
        virtual[str(n)] = json.loads(p.stdout.strip().splitlines()[-1]
                                     )["rays_per_sec"]

    # partition overhead: all N virtual devices share the same cores, so
    # 1 -> 2 devices pays a one-time thread-pool split; the per-device
    # scaling signal is 2 -> 8 staying flat (sharding must not add
    # per-device collective/layout cost as the mesh grows)
    flatness = virtual["8"] / virtual["2"]
    chip = real_chip()

    print(json.dumps({
        "metric": "scaling_rays_per_sec",
        "value": chip.get("sweep256", virtual["8"]),
        "unit": "rays/s",
        "vs_baseline": (chip.get("sweep256", virtual["8"])) / 1e5,
        "virtual_mesh": virtual,
        "virtual_8dev_over_2dev": flatness,
        "virtual_8dev_over_1dev": virtual["8"] / virtual["1"],
        "real_chip": chip,
    }))
    assert flatness > 0.8, (
        f"mesh growth 2->8 lost {(1-flatness)*100:.0f}% throughput")
    return 0


if __name__ == "__main__":
    sys.exit(main())
