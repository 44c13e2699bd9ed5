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
    np.testing.assert_allclose(r[3][0], traj[3], atol=2e-4)
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

    t0 = time.perf_counter()
    r = FastXYZTrajectory(f)
    _ = r[0:n_frames]
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    _ = XYZTrajectory(f)
    t_python = time.perf_counter() - t0
    # parse itself should win by a lot; index+read must at least not lose
    assert t_native < t_python


def test_open_trajectory_prefers_native(xyz_file):
    from sitator_tpu.io import open_trajectory
    f, s, traj = xyz_file
    r = open_trajectory(f)
    assert isinstance(r, FastXYZTrajectory)
    np.testing.assert_allclose(r[2:5], traj[2:5], atol=2e-4)
