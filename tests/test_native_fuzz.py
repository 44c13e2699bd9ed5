"""Malformed-input robustness for the trajectory decoders.

The native C++ parsers (io/native/*.cpp) take bytes straight off disk;
a corrupt file must surface as a normal Python exception from the ctypes
wrapper (ValueError / OSError / IndexError / RuntimeError), never a
segfault (which would kill this pytest process), a hang, or a silently
wrong-shaped array.  The Python readers are held to the same contract.

Corruption operators: random truncation, random byte-splat, line
deletion/duplication, count-field lies (negative / non-numeric /
larger-than-the-file), binary garbage, and empty/whitespace files.
"""
import os

import numpy as np
import pytest

from sitator_tpu.core.structure import Structure
from sitator_tpu.io.formats import (read_lammps_dump, read_xdatcar,
                                    read_xyz, write_lammps_dump,
                                    write_xdatcar, write_xyz)
from sitator_tpu.io import native as native_io

ALLOWED = (ValueError, OSError, IndexError, RuntimeError)

FORMATS = ["xyz", "lammps", "xdatcar"]
N_RANDOM = 25  # seeds per format per corruption class


@pytest.fixture(scope="module")
def base_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzz_base")
    rng = np.random.default_rng(0)
    cell = np.diag([6.0, 7.0, 8.0])
    pos = rng.uniform(0, 6, (5, 3))
    s = Structure(pos, ["Si"] * 3 + ["Li"] * 2, cell)
    traj = pos[None] + rng.normal(0, 0.05, (4, 5, 3))
    paths = {}
    p = root / "t.xyz"
    write_xyz(p, s, traj)
    paths["xyz"] = p
    p = root / "t.lammpstrj"
    write_lammps_dump(p, s, traj)
    paths["lammps"] = p
    p = root / "XDATCAR"
    write_xdatcar(p, s, traj)
    paths["xdatcar"] = p
    return {k: v.read_bytes() for k, v in paths.items()}


def _native_cls(fmt):
    return {"xyz": native_io.FastXYZTrajectory,
            "lammps": native_io.FastLammpsTrajectory,
            "xdatcar": native_io.FastXDATCARTrajectory}[fmt]


def _py_reader(fmt):
    return {"xyz": read_xyz, "lammps": read_lammps_dump,
            "xdatcar": read_xdatcar}[fmt]


def _exercise(fmt, data, tmp_path, tag):
    """Feed one corrupted byte-string to the native and Python readers;
    success must produce sane shapes, failure must be an ALLOWED error."""
    ext = {"xyz": ".xyz", "lammps": ".lammpstrj", "xdatcar": ""}[fmt]
    p = tmp_path / (f"f_{tag}{ext}" if ext else f"XDATCAR_{tag}")
    p.write_bytes(data)

    if native_io.get_lib() is not None:
        try:
            tr = _native_cls(fmt)(p, cache_index=False)
            arr = tr[:]
            assert arr.ndim == 3 and arr.shape[2] == 3
            assert arr.shape[1] == tr.n_atoms
        except ALLOWED:
            pass

    try:
        frames = _py_reader(fmt)(p)
        arr = np.asarray(frames if not isinstance(frames, tuple)
                         else frames[0])
        if arr.dtype != object and arr.size:
            assert arr.shape[-1] == 3
    except ALLOWED:
        pass


def _corrupt(rng, data):
    """One random corruption of ``data`` drawn from the operator set."""
    op = rng.integers(0, 5)
    b = bytearray(data)
    if op == 0 and len(b) > 1:          # truncate
        return bytes(b[: rng.integers(1, len(b))])
    if op == 1 and len(b) > 4:          # splat random bytes
        lo = int(rng.integers(0, len(b) - 2))
        hi = int(rng.integers(lo + 1, min(len(b), lo + 40)))
        b[lo:hi] = bytes(rng.integers(0, 256, hi - lo, dtype=np.uint8))
        return bytes(b)
    lines = data.split(b"\n")
    if op == 2 and len(lines) > 2:      # delete a line
        del lines[rng.integers(0, len(lines))]
        return b"\n".join(lines)
    if op == 3 and len(lines) > 2:      # duplicate a line
        i = int(rng.integers(0, len(lines)))
        lines.insert(i, lines[i])
        return b"\n".join(lines)
    # op == 4: scramble a numeric token into garbage
    i = int(rng.integers(0, len(lines)))
    toks = lines[i].split()
    if toks:
        toks[rng.integers(0, len(toks))] = b"%$#!"
        lines[i] = b" ".join(toks)
    return b"\n".join(lines)


@pytest.mark.parametrize("fmt", FORMATS)
def test_random_corruptions(fmt, base_files, tmp_path):
    data = base_files[fmt]
    rng = np.random.default_rng(1234)
    for k in range(N_RANDOM):
        _exercise(fmt, _corrupt(rng, data), tmp_path, f"r{k}")


@pytest.mark.parametrize("fmt", FORMATS)
def test_handcrafted_nasties(fmt, base_files, tmp_path):
    data = base_files[fmt]
    first, rest = data.split(b"\n", 1)
    cases = {
        "empty": b"",
        "whitespace": b" \n\t\n  \n",
        "binary": bytes(np.random.default_rng(7)
                        .integers(0, 256, 512, dtype=np.uint8)),
        "no_newline_eof": data.rstrip(b"\n"),
        "crlf": data.replace(b"\n", b"\r\n"),
        "trailing_junk": data + b"\x00\xff garbage\n",
    }
    if fmt == "xyz":
        # the atom-count line is line 1
        cases["neg_count"] = b"-5\n" + rest
        cases["big_count"] = b"50000\n" + rest
        cases["alpha_count"] = b"abc\n" + rest
    if fmt == "lammps":
        cases["neg_count"] = data.replace(b"\n5\n", b"\n-5\n", 1)
        cases["big_count"] = data.replace(b"\n5\n", b"\n50000\n", 1)
        cases["alpha_count"] = data.replace(b"\n5\n", b"\nabc\n", 1)
    if fmt == "xdatcar":
        cases["neg_count"] = data.replace(b"3 2", b"-3 -2", 1)
        cases["big_count"] = data.replace(b"3 2", b"50000 2", 1)
    for tag, blob in cases.items():
        _exercise(fmt, blob, tmp_path, tag)


@pytest.mark.parametrize("fmt", FORMATS)
def test_truncation_sweep(fmt, base_files, tmp_path):
    """Every prefix boundary class: cut inside header, count line, comment,
    coordinate line, and between frames."""
    data = base_files[fmt]
    n = len(data)
    for k, cut in enumerate(np.linspace(1, n - 1, 16, dtype=int)):
        _exercise(fmt, data[:cut], tmp_path, f"t{k}")


def test_nan_inf_coordinates(base_files, tmp_path):
    """Weird-but-parseable floats must not crash either reader."""
    data = base_files["xyz"].replace(b" ", b" ", 1)
    txt = data.decode()
    lines = txt.split("\n")
    # replace the first coordinate on the first atom line of frame 0
    for i, ln in enumerate(lines):
        parts = ln.split()
        if len(parts) == 4 and parts[0].isalpha():
            parts[1] = "nan"
            parts[2] = "inf"
            lines[i] = " ".join(parts)
            break
    _exercise("xyz", "\n".join(lines).encode(), tmp_path, "naninf")
