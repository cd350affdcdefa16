"""Kill-and-resume checkpointing of long renders (round-3 VERDICT #7).

A subprocess starts a chunked hotspot-lightcurve sweep with per-frame
flushes, is SIGKILLed mid-run, and the parent resumes from the
checkpoint; the resumed curve must be BITWISE identical to an
uninterrupted run (frames are pure functions of their index).
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from sim5_tpu.render import (FrameCheckpoint, checkpointed_frames,
                             hotspot_lightcurve_checkpointed)

LC_KW = dict(a=0.6, incl=np.radians(60.0), r_spot=8.0, spot_size=1.0,
             npix=32, n_orders=1, chunk=1)
T_OBS = np.linspace(0.0, 500.0, 24)


class TestFrameCheckpoint:
    def test_create_write_reopen_crc(self, tmp_path):
        p = str(tmp_path / "ck.npz")
        ck = FrameCheckpoint.create(p, 4, (3, 2))
        ck.write(1, np.full((3, 2), 7.0))
        ck2 = FrameCheckpoint.open(p)
        assert ck2.progress == (1, 4)
        assert ck2.pending() == [0, 2, 3]
        np.testing.assert_array_equal(ck2.frames[1], 7.0)
        # NaN inside a frame is data, not a pending marker
        ck2.write(2, np.full((3, 2), np.nan))
        assert FrameCheckpoint.open(p).progress == (2, 4)

    def test_corruption_detected(self, tmp_path):
        p = str(tmp_path / "ck.npz")
        ck = FrameCheckpoint.create(p, 2, (4,))
        ck.write(0, np.arange(4.0))
        raw = bytearray(open(p, "rb").read())
        raw[len(raw) // 2] ^= 0xFF
        open(p, "wb").write(bytes(raw))
        with pytest.raises(Exception):
            FrameCheckpoint.open(p)

    def test_resume_skips_done_frames(self, tmp_path):
        p = str(tmp_path / "ck.npz")
        calls = []

        def fn(i):
            calls.append(i)
            return np.full((2,), float(i))

        checkpointed_frames(p, fn, 5, (2,))
        assert calls == [0, 1, 2, 3, 4]
        calls.clear()
        ck = checkpointed_frames(p, fn, 5, (2,))
        assert calls == []            # everything already computed
        assert ck.progress == (5, 5)


class TestKillAndResume:
    def test_sigkill_mid_sweep_then_resume_bitwise(self, tmp_path):
        ckpath = str(tmp_path / "lc.npz")
        child_src = f"""
import os, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {os.environ.get("_SIM5_CACHE", "/tmp/sim5ck_cache")!r})
import numpy as np
from sim5_tpu.render import hotspot_lightcurve_checkpointed
t = np.linspace(0.0, 500.0, 24)
hotspot_lightcurve_checkpointed({ckpath!r}, t_obs=t, flush_every=1,
                                **{LC_KW!r})
"""
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        proc = subprocess.Popen([sys.executable, "-c", child_src], env=env,
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        # wait until at least 2 frames are flushed, then SIGKILL mid-run
        deadline = time.time() + 600
        killed = False
        while time.time() < deadline:
            if proc.poll() is not None:
                break  # finished before we could kill it -- still a test
            if os.path.exists(ckpath):
                try:
                    ck = FrameCheckpoint.open(ckpath)
                except Exception:
                    time.sleep(0.02)
                    continue
                if 2 <= ck.progress[0] < ck.n_frames:
                    os.kill(proc.pid, signal.SIGKILL)
                    proc.wait()
                    killed = True
                    break
            time.sleep(0.02)
        else:
            proc.kill()
            pytest.fail("child never flushed a frame")

        if killed:
            ck = FrameCheckpoint.open(ckpath)
            done, total = ck.progress
            assert 0 < done < total, "kill landed mid-sweep"

        # resume in-process: only the missing frames are recomputed
        t2, flux_resumed = hotspot_lightcurve_checkpointed(
            ckpath, t_obs=T_OBS, flush_every=1, **LC_KW)
        assert FrameCheckpoint.open(ckpath).progress[0] == \
            FrameCheckpoint.open(ckpath).n_frames

        # uninterrupted reference run -> bitwise identical curve
        _, flux_clean = hotspot_lightcurve_checkpointed(
            str(tmp_path / "lc_clean.npz"), t_obs=T_OBS, flush_every=1,
            **LC_KW)
        assert np.array_equal(flux_resumed, flux_clean)
        assert np.isfinite(flux_resumed).all() and flux_resumed.max() > 0
