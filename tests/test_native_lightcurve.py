"""Tests for the native IO runtime and the light-curve engines."""

import os
import zlib

import numpy as np
import jax.numpy as jnp
import pytest


class TestNativeIO:
    def test_async_writer_roundtrip(self, tmp_path):
        from sim5_tpu.native import AsyncWriter, crc32, native_available
        assert native_available(), "native lib should build in this image"
        with AsyncWriter(2) as w:
            payloads = {}
            for i in range(16):
                p = str(tmp_path / f"f{i}.bin")
                data = os.urandom(4096 + i)
                payloads[p] = data
                w.submit(p, data)
            w.flush()
            assert w.errors == 0
            assert w.bytes_written == sum(len(v) for v in payloads.values())
        for p, data in payloads.items():
            assert open(p, "rb").read() == data

    def test_crc32_matches_zlib(self):
        from sim5_tpu.native import crc32
        for data in (b"", b"x", os.urandom(100000)):
            assert crc32(data) == zlib.crc32(data)

    def test_table_save_async(self, tmp_path):
        from sim5_tpu.native import AsyncWriter
        from sim5_tpu.tables import SpectralTable
        path = str(tmp_path / "t.npz")
        E = np.linspace(1, 2, 8)
        t = SpectralTable.create(path, [("a", [0.1, 0.2])], E)
        t.write(0, np.ones(8))
        with AsyncWriter() as w:
            t.save_async(w)
            w.flush()
        t2 = SpectralTable.open(path)
        assert t2.progress == (1, 2)


class TestHotspot:
    def test_lightcurve_modulation_and_period(self):
        from sim5_tpu.render import hotspot_lightcurve
        from sim5_tpu.core import OmegaK
        a, r_spot = 0.5, 8.0
        period = 2 * np.pi / float(OmegaK(r_spot, a))
        t = np.arange(48) / 48.0 * 2 * period  # t[24] is exactly one period
        lc = np.asarray(hotspot_lightcurve(a, np.radians(60.0), r_spot, 0.8,
                                           t, npix=64, n_orders=1))
        assert np.isfinite(lc).all() and (lc > 0).all()
        # strong Doppler modulation at i=60 deg
        assert lc.max() / lc.min() > 2.0
        # periodicity: curve at t and t+period agree
        half = len(t) // 2
        np.testing.assert_allclose(lc[:half], lc[half:], rtol=0.05)


class TestVolumeRT:
    def test_static_blob_image(self):
        from sim5_tpu.render import volume_image

        def j(t, r, m, phi):
            return jnp.exp(-0.5 * ((r - 6.0) ** 2 + (r * m) ** 2))

        I = np.asarray(volume_image(0.5, np.radians(45.0), j, npix=24,
                                    rmax=12.0, r_start=30.0, max_steps=1200))
        assert np.isfinite(I).all()
        assert I.max() > 0
        # emission concentrated where sightlines graze the blob annulus
        assert (I > 0.1 * I.max()).sum() > 10
