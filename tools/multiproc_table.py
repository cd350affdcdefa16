"""Real multi-process table generation over jax.distributed (CPU).

Round-3 VERDICT task #5: the multi-host path must be exercised by ACTUAL
concurrent OS processes, not sequential same-process calls.  This tool

1. spawns N worker processes; each calls jax.distributed.initialize
   against a shared coordinator (process 0 hosts it), asserts the global
   process count, and generates its own disjoint row-shard of a spectral
   table CONCURRENTLY with the others (tables/generate.py semantics:
   per-process shard files, no shared writes);
2. waits for all workers, merges the shards (merge_shards), and
3. compares the merged table bitwise against a single-process run of the
   same grid.

Run:  python tools/multiproc_table.py [--nproc 2] [--out MULTIPROC.json]
Exit code 0 + one JSON line on success.  Used by
tests/test_multiprocess.py and to produce the MULTIPROC_r04.json
artifact.
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GRID = dict(spins=[0.5, 0.9], mdots=[0.1], incls=[45.0],
            radres=1.0, angres=8.0)
ENERGIES = [1.0, 2.0, 4.0, 6.0]


def worker(coordinator, num_processes, process_id, path):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import sim5_tpu  # noqa: F401
    from sim5_tpu.parallel import init_distributed
    from sim5_tpu.tables import generate_disk_table

    init_distributed(coordinator=coordinator, num_processes=num_processes,
                     process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.process_index() == process_id, jax.process_index()

    import numpy as np
    generate_disk_table(path, energies=np.asarray(ENERGIES),
                        process_id=jax.process_index(),
                        num_processes=jax.process_count(),
                        merge=False, **GRID)
    print(f"[worker {process_id}] shard done "
          f"(process_count={jax.process_count()})")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--path", default=None)
    args = ap.parse_args()

    if args.worker is not None:
        return worker(args.coordinator, args.nproc, args.worker, args.path)

    import numpy as np

    tmp = tempfile.mkdtemp(prefix="sim5_multiproc_")
    path = os.path.join(tmp, "table.npz")
    port = 12000 + os.getpid() % 20000
    coordinator = f"localhost:{port}"

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid),
             "--nproc", str(args.nproc), "--coordinator", coordinator,
             "--path", path],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(args.nproc)
    ]
    logs = []
    rcs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out.decode(errors="replace"))
        rcs.append(p.returncode)
    wall = time.time() - t0
    if any(rc != 0 for rc in rcs):
        for i, log in enumerate(logs):
            sys.stderr.write(f"--- worker {i} (rc={rcs[i]}) ---\n{log}\n")
        print(json.dumps({"ok": False, "rcs": rcs}))
        return 1

    # merge the concurrent shards, then compare vs a single-process run
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import sim5_tpu  # noqa: F401
    from sim5_tpu.tables import generate_disk_table, merge_shards

    params = [("spin", GRID["spins"]), ("mdot", GRID["mdots"]),
              ("incl", GRID["incls"])]
    merged = merge_shards(path, params, np.asarray(ENERGIES),
                          num_processes=args.nproc)
    assert np.isfinite(merged.spectra).all(), "merged table has holes"

    single = generate_disk_table(
        os.path.join(tmp, "single.npz"), energies=np.asarray(ENERGIES),
        **GRID)
    if not np.array_equal(merged.spectra, single.spectra):
        print(json.dumps({"ok": False, "reason": "merged != single"}))
        return 1

    result = {
        "ok": True,
        "nproc": args.nproc,
        "rows": int(merged.spectra.shape[0]),
        "bitwise_equal_to_single_process": True,
        "jax_distributed_initialized": True,
        "wall_seconds": round(wall, 1),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
