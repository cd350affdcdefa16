"""Spectral-grid generation driver (BASELINE config #5 pattern).

Sweeps a (spin, mdot, inclination) grid, raytraces the disk spectrum for
each grid point with the batched `DiskRaytrace` driver, and stores rows in
a resumable `SpectralTable`.  Multi-host: each process computes the rows
whose index is congruent to its process id (simple static row sharding --
rays inside one row already shard over the local mesh).
"""

import numpy as np

from .spectable import SpectralTable
from ..disk import ThinDisk
from ..render import DiskRaytrace, DiskSpectrum_BlackBody


def generate_disk_table(path, spins, mdots, incls, energies,
                        bh_mass=10.0, bh_dist=10.0, radres=0.3, angres=30.0,
                        process_id=0, num_processes=1, flush_every=1,
                        verbose=False):
    """Generate (or resume) a table of observed disk spectra.

    Grid axes: spin, mdot, incl [deg]; spectra on `energies` [keV].
    Returns the SpectralTable.
    """
    table = SpectralTable.create(
        path,
        [("spin", spins), ("mdot", mdots), ("incl", incls)],
        energies,
        meta=dict(bh_mass=bh_mass, bh_dist=bh_dist, radres=radres,
                  angres=angres),
    )
    n_written = 0
    for (indices, params) in table.generator():
        idx = indices[0]
        if idx % num_processes != process_id:
            continue
        p = params[0]
        disk = ThinDisk.create(bh_mass, float(p["spin"]), float(p["mdot"]))
        rt = DiskRaytrace(bh_mass, float(p["spin"]), bh_dist, disk,
                          DiskSpectrum_BlackBody())
        spec, _ = rt.spectrum(float(p["incl"]), energies,
                              radres=radres, angres=angres)
        n_written += 1
        table.write(idx, spec, flush=(n_written % flush_every == 0))
        if verbose:
            done, total = table.progress
            print(f"[tables] row {idx} done ({done}/{total})")
    table.save()
    return table
