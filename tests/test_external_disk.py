"""External compiled disk-model bridge (the reference's dlopen ABI,
src/sim5disk.c:55-111 / python/sim5diskmodel.py:101-200).

Compiles a tiny analytic diskmodel_*.so in-tree, loads it through the
ctypes bridge, and checks (a) the device-side interpolation tables against
the exact formulas, (b) a full image render through the bridge against the
same model written directly in Python.
"""

import pathlib
import shutil
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

SRC = pathlib.Path(__file__).parent / "data" / "external_diskmodel.c"


@pytest.fixture(scope="module")
def model_so(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler available")
    so = tmp_path_factory.mktemp("extdisk") / "external_diskmodel.so"
    subprocess.run([cc, "-shared", "-fPIC", "-O2", "-o", str(so), str(SRC),
                    "-lm"], check=True)
    return str(so)


class PyTwin:
    """The same analytic model written directly as a DiskModel protocol
    object (the oracle for the bridge)."""

    def __init__(self, a):
        self.rin = 6.0 * (1.0 - 0.5 * a)

    def r_min(self):
        return jnp.asarray(self.rin)

    def mdot(self):
        return jnp.asarray(0.1)

    def lumi(self):
        return jnp.asarray(0.05)

    def flux(self, r):
        r = jnp.asarray(r, jnp.float64)
        rs = jnp.maximum(r, self.rin * (1 + 1e-12))
        return jnp.where(r > self.rin,
                         1.0e26 * rs ** -3.0 * (1.0 - jnp.sqrt(self.rin / rs)),
                         0.0)

    def t_eff(self, r):
        from sim5_tpu import consts
        return (jnp.maximum(self.flux(r), 0.0) / consts.sb_sigma) ** 0.25

    def sigma(self, r):
        return 1.0e5 * jnp.asarray(r, jnp.float64) ** -0.6

    def ell(self, r):
        r = jnp.asarray(r, jnp.float64)
        return jnp.sqrt(r) / (1.0 + 1.0 / r)

    def vr(self, r):
        return jnp.zeros_like(jnp.asarray(r, jnp.float64))

    def h(self, r):
        return jnp.zeros_like(jnp.asarray(r, jnp.float64))

    def dhdr(self, r):
        return jnp.zeros_like(jnp.asarray(r, jnp.float64))


class TestBridge:
    def test_scalars_and_tables(self, model_so):
        from sim5_tpu.disk.external import ExternalDisk
        disk = ExternalDisk.create(model_so, 10.0, 0.7, "k=v")
        twin = PyTwin(0.7)
        assert np.isclose(float(disk.r_min()), float(twin.r_min()))
        assert np.isclose(float(disk.mdot()), 0.1)
        assert np.isclose(float(disk.lumi()), 0.05)
        # off-grid radii: interpolation must track the exact model closely
        r = np.geomspace(float(twin.r_min()) * 1.01, 1e5, 333) * 1.000313
        np.testing.assert_allclose(np.asarray(disk.flux(r)),
                                   np.asarray(twin.flux(r)), rtol=5e-6)
        np.testing.assert_allclose(np.asarray(disk.sigma(r)),
                                   np.asarray(twin.sigma(r)), rtol=5e-6)
        np.testing.assert_allclose(np.asarray(disk.ell(r)),
                                   np.asarray(twin.ell(r)), rtol=1e-5)
        assert np.all(np.asarray(disk.h(r)) == 0.0)
        # protocol conformance
        from sim5_tpu.disk import DiskModel
        assert isinstance(disk, DiskModel)

    def test_image_through_bridge_matches_python_twin(self, model_so):
        """Render the same disk once through the compiled .so bridge and
        once through the directly-written Python model: images must agree
        to interpolation accuracy."""
        from sim5_tpu.disk.external import ExternalDisk
        from sim5_tpu.render import DiskRaytrace, DiskSpectrum_BlackBody

        disk = ExternalDisk.create(model_so, 10.0, 0.7)
        rt_ext = DiskRaytrace(10.0, 0.7, 10.0, disk, DiskSpectrum_BlackBody())
        rt_py = DiskRaytrace(10.0, 0.7, 10.0, PyTwin(0.7),
                             DiskSpectrum_BlackBody())
        im_ext = rt_ext.image(60.0, 20.0, 48)
        im_py = rt_py.image(60.0, 20.0, 48)
        f_ext = np.asarray(im_ext["flux"])
        f_py = np.asarray(im_py["flux"])
        hit = np.isfinite(f_ext) | np.isfinite(f_py)
        # identical hit footprint
        assert (np.isfinite(f_ext) == np.isfinite(f_py)).all()
        both = np.isfinite(f_ext)
        assert both.sum() > 100
        np.testing.assert_allclose(f_ext[both], f_py[both], rtol=1e-5)
