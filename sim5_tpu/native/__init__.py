"""Native (C++) host runtime: asynchronous checkpoint writer + CRC32.

The compute path of sim5_tpu is JAX/XLA on the device; this module is the
native host-side runtime around it: a background writer thread pool
(native/sim5io.cpp) so table/image persistence overlaps with device
compute.  Binding is ctypes over a plain C ABI; if the shared library is
missing it is compiled on first use (g++), and all entry points degrade to
synchronous Python fallbacks when no toolchain is available.
"""

import ctypes
import os
import subprocess
import zlib

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native")
_LIB_PATH = os.path.join(_SRC_DIR, "libsim5io.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _SRC_DIR], check=True,
                           capture_output=True)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.s5_writer_create.restype = ctypes.c_void_p
        lib.s5_writer_create.argtypes = [ctypes.c_int]
        lib.s5_writer_destroy.argtypes = [ctypes.c_void_p]
        lib.s5_writer_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         ctypes.c_void_p, ctypes.c_uint64]
        lib.s5_writer_pending.restype = ctypes.c_int
        lib.s5_writer_pending.argtypes = [ctypes.c_void_p]
        lib.s5_writer_flush.argtypes = [ctypes.c_void_p]
        lib.s5_writer_bytes.restype = ctypes.c_uint64
        lib.s5_writer_bytes.argtypes = [ctypes.c_void_p]
        lib.s5_writer_errors.restype = ctypes.c_uint64
        lib.s5_writer_errors.argtypes = [ctypes.c_void_p]
        lib.s5_crc32.restype = ctypes.c_uint32
        lib.s5_crc32.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def native_available():
    return bool(_load())


def crc32(data: bytes) -> int:
    lib = _load()
    if lib:
        return int(lib.s5_crc32(data, len(data)))
    return zlib.crc32(data)


class AsyncWriter:
    """Background file writer (atomic tmp+rename); falls back to
    synchronous writes without the native library."""

    def __init__(self, n_threads=2):
        lib = _load()
        self._lib = lib if lib else None
        self._h = lib.s5_writer_create(n_threads) if lib else None

    def submit(self, path: str, data: bytes):
        if self._h is not None:
            self._lib.s5_writer_submit(self._h, path.encode(), data, len(data))
        else:
            tmp = path + ".s5tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)

    def pending(self) -> int:
        if self._h is not None:
            return int(self._lib.s5_writer_pending(self._h))
        return 0

    def flush(self):
        if self._h is not None:
            self._lib.s5_writer_flush(self._h)

    @property
    def bytes_written(self):
        if self._h is not None:
            return int(self._lib.s5_writer_bytes(self._h))
        return 0

    @property
    def errors(self):
        if self._h is not None:
            return int(self._lib.s5_writer_errors(self._h))
        return 0

    def close(self):
        if self._h is not None:
            self._lib.s5_writer_flush(self._h)
            self._lib.s5_writer_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
