"""ctypes bindings + on-demand build of the native fastxyz decoder."""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastxyz.cpp")
_LIB = os.path.join(_HERE, "libfastxyz.so")
_lock = threading.Lock()
_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("fastxyz native build unavailable (%s); "
                           "falling back to the Python parser", e)
            return None
        lib.fxyz_index.restype = ctypes.c_int64
        lib.fxyz_index.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.fxyz_read_block.restype = ctypes.c_int
        lib.fxyz_read_block.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        _lib = lib
        return _lib


class FastXYZTrajectory:
    """Random-access, multithreaded extxyz trajectory reader (native).

    Implements the ``TrajectoryReader`` protocol.  Index is built once
    (single scan); block reads decode frames across ``n_threads``.
    """

    def __init__(self, path, n_threads=None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native fastxyz library unavailable")
        self._lib = lib
        self.path = os.fspath(path)
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)
        self._file_size = os.path.getsize(self.path)

        # first pass with a generous guess; retry bigger if needed
        cap = max(1024, self._file_size // 64)
        while True:
            offsets = np.zeros(cap, dtype=np.int64)
            n_atoms = ctypes.c_int64(0)
            n = lib.fxyz_index(
                self.path.encode(), offsets.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)), cap,
                ctypes.byref(n_atoms))
            if n < 0:
                raise IOError(f"fastxyz index failed with code {n}")
            if n_atoms.value == -2:
                raise ValueError("inconsistent atom counts across frames")
            if n <= cap:
                break
            cap = n
        self._offsets = np.ascontiguousarray(offsets[:n])
        self._n_frames = int(n)
        self._n_atoms = int(n_atoms.value)

        from sitator_tpu.io.formats import iread_xyz
        self.structure = next(iread_xyz(self.path))

    def __len__(self):
        return self._n_frames

    @property
    def n_atoms(self):
        return self._n_atoms

    def __getitem__(self, key):
        if isinstance(key, slice):
            lo, hi, step = key.indices(self._n_frames)
            if step != 1:
                raise ValueError("only contiguous slices supported")
        else:
            lo, hi = int(key), int(key) + 1
        n = hi - lo
        out = np.empty((n, self._n_atoms, 3), dtype=np.float32)
        rc = self._lib.fxyz_read_block(
            self.path.encode(),
            self._offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._n_frames, self._file_size, lo, n, self._n_atoms,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads)
        if rc != 0:
            raise IOError(f"fastxyz read failed with code {rc}")
        return out
