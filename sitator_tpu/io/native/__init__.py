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
    # portable flag set (no -march=native: the .so may be shared across
    # heterogeneous hosts); the parser is scalar, -O3 is all it needs
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
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

    def __init__(self, path, n_threads=None, cache_index=True):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native fastxyz library unavailable")
        self._lib = lib
        self.path = os.fspath(path)
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)
        self._file_size = os.path.getsize(self.path)

        cached = self._load_index_cache() if cache_index else None
        if cached is not None:
            self._offsets, self._n_frames, self._n_atoms = cached
        else:
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
                    raise ValueError(
                        "inconsistent atom counts across frames")
                if n <= cap:
                    break
                cap = n
            self._offsets = np.ascontiguousarray(offsets[:n])
            self._n_frames = int(n)
            self._n_atoms = int(n_atoms.value)
            if cache_index:
                self._save_index_cache()

        from sitator_tpu.io.formats import iread_xyz
        self.structure = next(iread_xyz(self.path))

    # index cache: one scan per (file, size, mtime) — amortizes the index
    # pass for repeated streaming runs over large (multi-GB) trajectories
    def _cache_path(self):
        return self.path + ".fxyzidx.npz"

    def _load_index_cache(self):
        cp = self._cache_path()
        try:
            st = os.stat(self.path)
            with np.load(cp) as d:
                if (int(d["size"]) == st.st_size
                        and int(d["mtime_ns"]) == st.st_mtime_ns):
                    return (np.ascontiguousarray(d["offsets"]),
                            int(d["n_frames"]), int(d["n_atoms"]))
        except Exception:
            # any unreadable/corrupt sidecar (truncated zip, bad pickle,
            # permissions) must degrade to a fresh index scan, never crash
            return None
        return None

    def _save_index_cache(self):
        try:
            st = os.stat(self.path)
            tmp = self._cache_path() + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, offsets=self._offsets,
                         n_frames=self._n_frames, n_atoms=self._n_atoms,
                         size=st.st_size, mtime_ns=st.st_mtime_ns)
            os.replace(tmp, self._cache_path())
        except OSError:
            pass  # read-only location; index stays in-memory only

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
            key = int(key)
            if key < 0:
                key += self._n_frames
            if not 0 <= key < self._n_frames:
                raise IndexError(
                    f"frame {key} out of range [0, {self._n_frames})")
            lo, hi = key, key + 1
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
