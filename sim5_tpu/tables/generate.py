"""Spectral-grid generation driver (BASELINE config #5 pattern).

Sweeps a (spin, mdot, inclination) grid, raytraces the disk spectrum for
each grid point with the batched `DiskRaytrace` driver, and stores rows in
a resumable `SpectralTable`.

Multi-host: each process computes the rows whose index is congruent to its
process id (static row sharding; pass `mesh=` to additionally shard the
rays inside each row over the local device mesh) and persists them to its
OWN shard file
(``<path>.shardKofN.npz``), so concurrent processes never write the same
file; `merge_shards` combines the shards into the final table once all
processes finish (or to inspect partial progress).  This keeps the
reference's resume semantics (python/sim5fitstable.py:105-140) -- a
restarted process reopens its shard and skips rows already computed --
without the last-writer-wins clobbering a shared file would have.
"""

import glob
import os
import re

import numpy as np

from .spectable import SpectralTable
from ..disk import ThinDisk
from ..render import DiskRaytrace, DiskSpectrum_BlackBody


def shard_path(path, process_id, num_processes):
    """Per-process table filename; the unsharded path for a single process."""
    if num_processes <= 1:
        return path
    base = path[:-4] if path.endswith(".npz") else path
    return f"{base}.shard{process_id}of{num_processes}.npz"


def merge_shards(path, params, energies, meta=None, num_processes=None,
                 cleanup=False):
    """Combine per-process shard tables into the final table at `path`.

    Takes every computed (all-finite) row from each shard; row ownership is
    disjoint by construction (index mod num_processes), so no row can be
    written by two shards.  Returns the merged SpectralTable (saved).
    With num_processes=None, shards are discovered by filename glob.
    """
    base = path[:-4] if path.endswith(".npz") else path
    if num_processes is None:
        pat = re.compile(re.escape(os.path.basename(base))
                         + r"\.shard(\d+)of(\d+)\.npz$")
        shards = [p for p in sorted(glob.glob(base + ".shard*of*.npz"))
                  if pat.match(os.path.basename(p))]
    else:
        shards = [shard_path(path, pid, num_processes)
                  for pid in range(num_processes)]
    merged = SpectralTable.create(path, params, energies, meta=meta)
    for sp in shards:
        if not os.path.exists(sp):
            continue
        t = SpectralTable.open(sp)
        done = np.isfinite(t.spectra).all(axis=1)
        merged.spectra[done] = t.spectra[done]
    merged.save()
    if cleanup:
        for sp in shards:
            if os.path.exists(sp):
                os.remove(sp)
    return merged


def generate_disk_table(path, spins, mdots, incls, energies,
                        bh_mass=10.0, bh_dist=10.0, radres=0.3, angres=30.0,
                        process_id=0, num_processes=1, flush_every=1,
                        merge=True, verbose=False, mesh=None, fast=False):
    """Generate (or resume) a table of observed disk spectra.

    Grid axes: spin, mdot, incl [deg]; spectra on `energies` [keV].
    With num_processes > 1 this process computes and persists only its own
    row subset (see module docstring); pass merge=True (default) to have
    process 0 merge all shards present on its filesystem at the end --
    callers on disjoint filesystems should instead merge offline with
    `merge_shards` after collecting the shard files.  Returns this
    process's SpectralTable (the merged table on the merging process).

    `mesh` (optional 1-D jax.sharding.Mesh): shard each row's rays over
    the local devices (DiskRaytrace.spectrum's mesh argument) -- combine
    with num_processes for the two-level pod layout (rows across hosts,
    rays across each host's chips).

    `fast=True` computes rows in f32 fast mode: ~4.3x per-row device
    throughput vs TPU-emulated f64, verified to match f64 rows to
    <=1e-5 relative (measured 7.6e-7 max; docs/performance.md, the
    round-4 far-field/degenerate-lane robustness work).  Stored spectra
    are f64 either way; the mode is recorded in the table meta.
    """
    import contextlib
    import jax

    params = [("spin", spins), ("mdot", mdots), ("incl", incls)]
    meta = dict(bh_mass=bh_mass, bh_dist=bh_dist, radres=radres,
                angres=angres, fast=bool(fast))
    table = SpectralTable.create(
        shard_path(path, process_id, num_processes), params, energies,
        meta=meta)
    n_written = 0
    ctx = jax.enable_x64(False) if fast else contextlib.nullcontext()
    with ctx:
        for (indices, rowpars) in table.generator():
            idx = indices[0]
            if idx % num_processes != process_id:
                continue
            p = rowpars[0]
            disk = ThinDisk.create(bh_mass, float(p["spin"]),
                                   float(p["mdot"]))
            rt = DiskRaytrace(bh_mass, float(p["spin"]), bh_dist, disk,
                              DiskSpectrum_BlackBody())
            spec, _ = rt.spectrum(float(p["incl"]), energies,
                                  radres=radres, angres=angres, mesh=mesh)
            n_written += 1
            table.write(idx, spec, flush=(n_written % flush_every == 0))
            if verbose:
                done, total = table.progress
                print(f"[tables] row {idx} done ({done}/{total})")
    table.save()
    if num_processes > 1 and merge and process_id == 0:
        return merge_shards(path, params, energies, meta=meta,
                            num_processes=num_processes)
    return table


def generate_polarized_table(path, spins, incls, energies, bh_mass=10.0,
                             bh_dist=10.0, mdot=0.1, npix=128,
                             flush_every=1, verbose=False):
    """Generate (or resume) a table of Stokes-resolved disk spectra.

    Each row stores the concatenation [I_E, Q_E, U_E] (3 * len(energies)
    values) from `render.polarized_spectrum` -- the config #3 + #5 product
    the reference cannot produce (it has no polarized spectral model).
    The row layout is recorded in the table meta (`stokes_layout`), and the
    CRC/resume semantics are those of SpectralTable.
    """
    import jax.numpy as jnp
    from ..disk import nt_setup
    from ..render import polarized_spectrum

    params = [("spin", spins), ("incl", incls)]
    energies = np.asarray(energies, np.float64)
    ncol = np.concatenate([energies, energies, energies])
    meta = dict(bh_mass=bh_mass, bh_dist=bh_dist, mdot=mdot, npix=npix,
                stokes_layout="I,Q,U x len(energies)")
    table = SpectralTable.create(path, params, ncol, meta=meta)
    n_written = 0
    for (indices, rowpars) in table.generator():
        idx = indices[0]
        p = rowpars[0]
        disk = nt_setup(bh_mass, float(p["spin"]), mdot, 0.1)
        I, Q, U = polarized_spectrum(
            disk, float(np.radians(p["incl"])), jnp.asarray(energies),
            npix=npix, bh_mass=bh_mass, bh_dist=bh_dist)
        row = np.concatenate([np.asarray(I), np.asarray(Q), np.asarray(U)])
        n_written += 1
        table.write(idx, row, flush=(n_written % flush_every == 0))
        if verbose:
            done, total = table.progress
            print(f"[tables] polarized row {idx} done ({done}/{total})")
    table.save()
    return table
