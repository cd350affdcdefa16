"""Tests for resumable spectral tables."""

import numpy as np

from sim5_tpu.tables import SpectralTable, generate_disk_table


class TestSpectralTable:
    def test_create_write_reopen_resume(self, tmp_path):
        path = str(tmp_path / "t.npz")
        E = np.geomspace(0.1, 10, 16)
        t = SpectralTable.create(path, [("a", [0.0, 0.5]), ("i", [30., 60., 80.])], E)
        assert t.n_rows == 6
        assert t.progress == (0, 6)
        # write some rows with flush
        t.write(0, np.ones(16), flush=True)
        t.write(3, 2 * np.ones(16), flush=True)
        # reopen: computed rows persist, generator yields only the rest
        t2 = SpectralTable.open(path)
        assert t2.progress == (2, 6)
        pending = [idx for chunk, _ in t2.generator() for idx in chunk]
        assert pending == [1, 2, 4, 5]
        # row params follow C-order outer product
        assert t2.row_params(3) == {"a": 0.5, "i": 30.0}
        # create() on existing compatible grid resumes instead of clobbering
        t3 = SpectralTable.create(path, [("a", [0.0, 0.5]), ("i", [30., 60., 80.])], E)
        assert t3.progress == (2, 6)

    def test_crc_detects_corruption(self, tmp_path):
        path = str(tmp_path / "t.npz")
        E = np.linspace(1, 2, 4)
        t = SpectralTable.create(path, [("a", [0.0])], E)
        t.write(0, np.arange(4.0), flush=True)
        # corrupt the file payload
        import zipfile, os
        data = open(path, "rb").read()
        # flip a byte inside (best effort; if zip CRC catches it first that
        # is an acceptable failure mode too)
        bad = bytearray(data)
        bad[-10] ^= 0xFF
        open(path, "wb").write(bytes(bad))
        try:
            SpectralTable.open(path)
            corrupted_detected = False
        except Exception:
            corrupted_detected = True
        assert corrupted_detected

    def test_generate_small_grid(self, tmp_path):
        path = str(tmp_path / "disk.npz")
        E = np.geomspace(0.5, 10, 8)
        t = generate_disk_table(path, [0.5], [0.1], [60.0], E,
                                radres=2.0, angres=8.0)
        assert t.progress == (1, 1)
        spec = t.spectra[0]
        assert np.isfinite(spec).all() and spec.max() > 0
