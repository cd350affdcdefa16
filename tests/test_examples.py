"""Guard the user-facing example scripts against bit-rot.

Every example must at least byte-compile; the cheap ones run end-to-end
as subprocesses on the CPU backend (the heavy renders are exercised by
the driver/bench paths and would dominate suite time here).
"""

import os
import pathlib
import py_compile
import subprocess
import sys

import pytest

EXAMPLES = sorted((pathlib.Path(__file__).parent.parent / "examples")
                  .glob("*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_compiles(path):
    py_compile.compile(str(path), doraise=True)


def test_example_01_runs():
    repo = pathlib.Path(__file__).parent.parent
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, str(repo / "examples" / "01_kerr_spacetime.py")],
        capture_output=True, timeout=600, cwd=str(repo), env=env)
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    assert out.stdout.strip(), "example 01 produced no output"
