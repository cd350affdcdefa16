"""Genuine multi-process execution: 2 OS processes initialize
jax.distributed against a shared coordinator, generate disjoint table
shards CONCURRENTLY, and the merged result equals a single-process run
bitwise (round-3 VERDICT task #5 -- previously the "two-process" path
was only ever simulated by sequential calls inside one process).

The test shells out to tools/multiproc_table.py because jax.distributed
cannot be initialized inside the already-initialized test process.
"""

import json
import pathlib
import subprocess
import sys


def test_two_process_distributed_table_generation():
    repo = pathlib.Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, str(repo / "tools" / "multiproc_table.py"),
         "--nproc", "2"],
        capture_output=True, timeout=840, cwd=str(repo))
    assert out.returncode == 0, out.stdout.decode() + out.stderr.decode()
    line = out.stdout.decode().strip().splitlines()[-1]
    result = json.loads(line)
    assert result["ok"] is True
    assert result["nproc"] == 2
    assert result["bitwise_equal_to_single_process"] is True
    assert result["jax_distributed_initialized"] is True
