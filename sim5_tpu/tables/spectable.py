"""Gridded spectral tables with checkpoint/resume.

Cloud-friendly re-design of the reference's FITS spectral-table container
(python/sim5fitstable.py): a parameter grid (outer product of named axes),
an energy grid, and one spectrum per grid row.  Storage is .npz + a JSON
manifest with CRC32 integrity checks; partially computed tables re-open and
`generator()` yields only the rows that still need computing -- the same
resume semantics as the reference (sim5fitstable.py:105-140), so long grid
sweeps survive restarts.

FITS export/import is provided when astropy is importable (it is optional;
the native format is self-contained).
"""

import itertools
import json
import os
import zlib

import numpy as np


class SpectralTable:
    """Container for spectra on a parameter grid.

    params: list of (name, 1-D array) axes; rows iterate the outer product
    in C order (last axis fastest), matching the reference row ordering.
    """

    def __init__(self, path, params, energies, spectra=None, meta=None):
        self.path = path
        self.params = [(str(n), np.asarray(v, np.float64)) for n, v in params]
        self.energies = np.asarray(energies, np.float64)
        self.shape = tuple(len(v) for _, v in self.params)
        self.n_rows = int(np.prod(self.shape))
        if spectra is None:
            spectra = np.full((self.n_rows, len(self.energies)), np.nan)
        self.spectra = np.asarray(spectra, np.float64)
        self.meta = dict(meta or {})
        assert self.spectra.shape == (self.n_rows, len(self.energies))

    # -- construction / persistence -------------------------------------

    @classmethod
    def create(cls, path, params, energies, meta=None, overwrite=False):
        """Create a new table (or re-open an existing compatible one for
        resume, unless overwrite=True).  (reference: Sim5_FitsTable.__init__,
        sim5fitstable.py:20-60)"""
        if os.path.exists(path) and not overwrite:
            t = cls.open(path)
            same = (len(t.params) == len(params)
                    and all(n1 == str(n2) and np.array_equal(v1, np.asarray(v2))
                            for (n1, v1), (n2, v2) in zip(t.params, params))
                    and np.array_equal(t.energies, np.asarray(energies)))
            if same:
                return t
        t = cls(path, params, energies, meta=meta)
        t.save()
        return t

    @classmethod
    def open(cls, path):
        """Open an existing table, verifying CRC (reference:
        sim5fitstable.py:46-59)."""
        with np.load(path) as z:
            manifest = json.loads(str(z["manifest"]))
            spectra = z["spectra"]
            energies = z["energies"]
            par = [(n, z[f"param_{n}"]) for n in manifest["param_names"]]
        crc = zlib.crc32(np.ascontiguousarray(spectra).tobytes())
        if crc != manifest["crc32"]:
            raise IOError(f"{path}: CRC mismatch (corrupt table)")
        return cls(path, par, energies, spectra, manifest.get("meta"))

    def _serialize(self):
        import io
        manifest = dict(
            param_names=[n for n, _ in self.params],
            crc32=zlib.crc32(np.ascontiguousarray(self.spectra).tobytes()),
            meta=self.meta,
        )
        buf = io.BytesIO()
        np.savez(buf, manifest=json.dumps(manifest), spectra=self.spectra,
                 energies=self.energies,
                 **{f"param_{n}": v for n, v in self.params})
        return buf.getvalue()

    def save(self):
        """Atomically persist the table with a CRC stamp (reference 'flush',
        sim5fitstable.py:143-162)."""
        tmp = self.path + ".tmp.npz"
        with open(tmp, "wb") as f:
            f.write(self._serialize())
        os.replace(tmp, self.path)

    def save_async(self, writer):
        """Persist via the native async IO runtime (sim5_tpu.native.AsyncWriter)
        so checkpointing overlaps with device compute."""
        writer.submit(self.path, self._serialize())

    # -- grid access -----------------------------------------------------

    def row_params(self, index):
        """Parameter values of grid row `index` (C order)."""
        idx = np.unravel_index(index, self.shape)
        return {n: v[i] for (n, v), i in zip(self.params, idx)}

    def is_computed(self, index):
        return bool(np.isfinite(self.spectra[index]).all())

    def generator(self, batch=1):
        """Yield (indices, list-of-param-dicts) for uncomputed rows only --
        grid jobs resume mid-sweep.  (reference: generator,
        sim5fitstable.py:105-140)"""
        pending = [i for i in range(self.n_rows) if not self.is_computed(i)]
        for i in range(0, len(pending), batch):
            chunk = pending[i:i + batch]
            yield chunk, [self.row_params(j) for j in chunk]

    def write(self, index, spectrum, flush=False):
        """Store one row; flush persists immediately.  (reference: write,
        sim5fitstable.py:143-151)"""
        self.spectra[index] = np.asarray(spectrum, np.float64)
        if flush:
            self.save()

    @property
    def progress(self):
        done = np.isfinite(self.spectra).all(1).sum()
        return int(done), self.n_rows

    # -- FITS interop (optional) ----------------------------------------

    def to_fits(self, path):
        """Export in the reference's FITS layout (META + SPECTRA HDUs);
        requires astropy."""
        from astropy.io import fits
        cols = [fits.Column(name=n, format="E", array=np.resize(v, self.n_rows))
                for n, v in self.params]
        meta_cols = [fits.Column(name=f"grid_{n}", format="E", array=v)
                     for n, v in self.params]
        meta_cols.append(fits.Column(name="energy", format="E",
                                     array=self.energies))
        hdul = fits.HDUList([
            fits.PrimaryHDU(),
            fits.BinTableHDU.from_columns(meta_cols, name="META"),
            fits.ImageHDU(self.spectra.astype(np.float32), name="SPECTRA"),
        ])
        hdul.writeto(path, overwrite=True)
