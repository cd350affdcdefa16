"""Test configuration: run JAX on a simulated 8-device CPU mesh with x64.

Must set env vars before jax import (multi-chip sharding tests use the
virtual device mesh; bench.py uses the real TPU chip instead).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# the container's sitecustomize force-registers the axon TPU backend; tests
# must run on the virtual CPU mesh, so override at the jax config level too
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite jit-compiles ~100 programs; caching
# turns a >10-minute cold run into seconds of compile time on reruns.
# The cache path embeds a host-CPU fingerprint: this harness migrates
# between machines, XLA:CPU loads AOT entries compiled for a DIFFERENT
# host's vector features anyway (cpu_aot_loader "could lead to execution
# errors such as SIGILL"), and the resulting mid-suite segfaults cost a
# full debugging session to trace back here.
import hashlib
import platform
try:
    with open("/proc/cpuinfo") as _f:
        _flags = [ln for ln in _f if ln.startswith("flags")][0]
except (OSError, IndexError):
    _flags = platform.processor()
_fp = hashlib.md5(_flags.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), f".jax_cache_cpu_{_fp}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


def load_tagged(fname):
    """Parse a golden file of '<tag> v1 v2 ...' lines into {tag: ndarray}."""
    out = {}
    with open(GOLDEN / fname) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            vals = [float(v) for v in parts[1:]]
            out.setdefault(tag, []).append(vals)
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.fixture(scope="session")
def golden_special():
    return load_tagged("special.txt")


@pytest.fixture(scope="session")
def golden_kerr():
    return load_tagged("kerr.txt")


@pytest.fixture(scope="session")
def golden_disknt():
    return load_tagged("disknt.txt")


@pytest.fixture(scope="session")
def golden_polarization():
    return load_tagged("polarization.txt")


@pytest.fixture(scope="session")
def golden_raytrace():
    return load_tagged("raytrace.txt")


@pytest.fixture(autouse=True, scope="class")
def _free_compiled_executables_between_modules():
    """XLA:CPU segfaults inside backend_compile after ~1.5k cumulative
    in-process compilations (deterministically at the same suite position,
    while every test passes in isolation) -- consistent with JIT code-region
    exhaustion.  Dropping the in-memory executable cache at module
    boundaries keeps the live-code footprint bounded; the persistent
    on-disk cache makes any cross-module recompiles cheap."""
    yield
    jax.clear_caches()
