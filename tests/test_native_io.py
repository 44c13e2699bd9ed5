"""Native fastxyz decoder vs the Python parser, plus a throughput sanity."""
import time

import numpy as np
import pytest

from sitator_tpu import Structure
from sitator_tpu.io import write_xyz
from sitator_tpu.io.formats import XYZTrajectory

native = pytest.importorskip("sitator_tpu.io.native")
if native.get_lib() is None:
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from sitator_tpu.io.native import FastXYZTrajectory


@pytest.fixture(scope="module")
def xyz_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    tmp = tmp_path_factory.mktemp("fastxyz")
    cell = np.eye(3) * 12.0
    n_atoms, n_frames = 50, 40
    s = Structure(rng.uniform(0, 12, (n_atoms, 3)),
                  ["S"] * 40 + ["Li"] * 10, cell)
    traj = rng.uniform(-5, 20, size=(n_frames, n_atoms, 3))
    # mix in exponent-format numbers to exercise that parse path
    traj[3, 7] = [1.25e-3, -4.5e2, 3.0e0]
    f = tmp / "traj.extxyz"
    write_xyz(f, s, traj=traj)
    return f, s, traj


def test_native_matches_python(xyz_file):
    f, s, traj = xyz_file
    r = FastXYZTrajectory(f)
    assert len(r) == len(traj)
    assert r.n_atoms == s.n_atoms
    np.testing.assert_allclose(r[0:len(traj)], traj, atol=2e-4)
    # python path agrees too
    rp = XYZTrajectory(f)
    np.testing.assert_allclose(r[5:9], rp[5:9], atol=2e-4)
    # random block
    np.testing.assert_allclose(r[37:40], traj[37:40], atol=2e-4)
    # single frame indexing
    np.testing.assert_allclose(r[3], traj[3], atol=2e-4)
    # structure recovered from frame 0
    assert np.array_equal(r.structure.species, s.species)


def test_native_faster_than_python(tmp_path):
    rng = np.random.default_rng(1)
    cell = np.eye(3) * 20.0
    n_atoms, n_frames = 200, 200
    s = Structure(rng.uniform(0, 20, (n_atoms, 3)), ["S"] * n_atoms, cell)
    traj = rng.uniform(0, 20, size=(n_frames, n_atoms, 3))
    f = tmp_path / "big.extxyz"
    write_xyz(f, s, traj=traj)

    def time_native():
        r = FastXYZTrajectory(f, cache_index=False)
        _ = r[0:n_frames]

    def time_python():
        _ = XYZTrajectory(f)

    # warm both paths (page cache, lazy imports, ctypes), then take the
    # best of 3 — single wall-clock samples on a shared machine are noise
    time_native(), time_python()
    t_native = min(_timed(time_native) for _ in range(3))
    t_python = min(_timed(time_python) for _ in range(3))
    # the native decoder wins by >10x when healthy; 1x is the red line
    assert t_native < t_python, (t_native, t_python)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_negative_and_out_of_range_indexing(xyz_file):
    f, s, traj = xyz_file
    r = FastXYZTrajectory(f)
    np.testing.assert_allclose(r[-1], traj[-1], atol=2e-4)
    np.testing.assert_allclose(r[-len(traj)], traj[0], atol=2e-4)
    with pytest.raises(IndexError):
        r[len(traj)]
    with pytest.raises(IndexError):
        r[-len(traj) - 1]


def test_long_comment_lines(tmp_path):
    # extxyz comment lines can carry arbitrary metadata; historically a
    # 64 KiB fgets buffer desynchronized the index on longer lines
    rng = np.random.default_rng(2)
    n_atoms, n_frames = 5, 4
    traj = rng.uniform(0, 9, size=(n_frames, n_atoms, 3))
    f = tmp_path / "long.extxyz"
    with open(f, "w") as fh:
        for fr in range(n_frames):
            fh.write(f"{n_atoms}\n")
            fh.write('Lattice="9 0 0 0 9 0 0 0 9" junk='
                     + "x" * (100_000 + fr) + "\n")
            for a in range(n_atoms):
                fh.write("S %.6f %.6f %.6f\n" % tuple(traj[fr, a]))
    r = FastXYZTrajectory(f, cache_index=False)
    assert len(r) == n_frames and r.n_atoms == n_atoms
    np.testing.assert_allclose(r[0:n_frames], traj, atol=2e-4)


def test_index_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    s = Structure(rng.uniform(0, 8, (6, 3)), ["S"] * 6, np.eye(3) * 8.0)
    traj = rng.uniform(0, 8, size=(7, 6, 3))
    f = tmp_path / "c.extxyz"
    write_xyz(f, s, traj=traj)
    r1 = FastXYZTrajectory(f)
    import os
    assert os.path.exists(str(f) + ".fxyzidx.npz")
    r2 = FastXYZTrajectory(f)  # loads from cache
    np.testing.assert_array_equal(r1._offsets, r2._offsets)
    np.testing.assert_allclose(r2[0:7], traj, atol=2e-4)
    # stale cache (file rewritten) is detected and rebuilt
    traj2 = rng.uniform(0, 8, size=(9, 6, 3))
    write_xyz(f, s, traj=traj2)
    os.utime(f, ns=(1, 1))  # force distinct mtime even on coarse clocks
    r3 = FastXYZTrajectory(f)
    assert len(r3) == 9
    np.testing.assert_allclose(r3[0:9], traj2, atol=2e-4)


def test_open_trajectory_prefers_native(xyz_file):
    from sitator_tpu.io import open_trajectory
    f, s, traj = xyz_file
    r = open_trajectory(f)
    assert isinstance(r, FastXYZTrajectory)
    np.testing.assert_allclose(r[2:5], traj[2:5], atol=2e-4)
