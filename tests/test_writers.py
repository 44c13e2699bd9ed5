"""Trajectory writers (XDATCAR / LAMMPS dump) round-trip through this
package's own readers — the write side of the ASE-replacement IO layer
(SURVEY.md §3.9 item 5)."""
import numpy as np
import pytest

from sitator_tpu.core.structure import Structure
from sitator_tpu.io import (
    open_trajectory,
    read_lammps_dump,
    read_xdatcar,
    write_lammps_dump,
    write_xdatcar,
)


@pytest.fixture
def system(rng):
    cell = np.array([[8.0, 0, 0], [0.4, 8.5, 0], [0.2, 0.3, 9.0]])
    species = np.array([16] * 5 + [3] * 3, np.int32)
    frac = rng.random((4, 8, 3))
    traj = frac @ cell
    return Structure(traj[0], species, cell), traj


def test_xdatcar_roundtrip(tmp_path, system):
    s, traj = system
    f = tmp_path / "XDATCAR"
    write_xdatcar(f, s, traj)
    s2, traj2 = read_xdatcar(f)
    np.testing.assert_allclose(s2.cell, s.cell, atol=1e-12)
    np.testing.assert_array_equal(s2.species, s.species)
    np.testing.assert_allclose(traj2, traj, atol=1e-10)
    # the native decoder reads the written file too
    r = open_trajectory(f)
    np.testing.assert_allclose(r[0:4], traj, atol=2e-4)


def test_xdatcar_unwrapped_coords_roundtrip(tmp_path, system):
    """Out-of-cell positions survive the write (no silent wrapping)."""
    s, traj = system
    traj = traj + np.array([12.0, -9.0, 4.0])   # shift far out of cell
    f = tmp_path / "XDATCAR"
    write_xdatcar(f, s, traj)
    _, traj2 = read_xdatcar(f)
    np.testing.assert_allclose(traj2, traj, atol=1e-9)


def test_xdatcar_interleaved_species_raise(tmp_path, rng):
    s = Structure(rng.random((4, 3)) * 5, np.array([16, 3, 16, 3]),
                  np.eye(3) * 5.0)
    with pytest.raises(ValueError, match="contiguous"):
        write_xdatcar(tmp_path / "XDATCAR", s)


def test_lammps_roundtrip_orthogonal(tmp_path, rng):
    cell = np.diag([7.0, 8.0, 9.0])
    species = np.array([16, 16, 3, 3], np.int32)
    traj = rng.random((3, 4, 3)) @ cell
    s = Structure(traj[0], species, cell)
    f = tmp_path / "run.lammpstrj"
    write_lammps_dump(f, s, traj)
    s2, traj2 = read_lammps_dump(f)
    np.testing.assert_allclose(s2.cell, cell, atol=1e-10)
    np.testing.assert_array_equal(s2.species, species)
    np.testing.assert_allclose(traj2, traj, atol=1e-10)
    # native decoder path
    r = open_trajectory(f)
    np.testing.assert_allclose(r[0:3], traj, atol=2e-4)


def test_lammps_roundtrip_triclinic(tmp_path, rng):
    cell = np.array([[7.0, 0, 0], [0.8, 8.0, 0], [0.3, -0.4, 9.0]])
    species = np.array([3, 3, 3], np.int32)
    traj = rng.random((2, 3, 3)) @ cell
    s = Structure(traj[0], species, cell)
    f = tmp_path / "tri.lammpstrj"
    write_lammps_dump(f, s, traj)
    s2, traj2 = read_lammps_dump(f)
    np.testing.assert_allclose(s2.cell, cell, atol=1e-10)
    np.testing.assert_allclose(traj2, traj, atol=1e-10)


def test_lammps_rotated_cell_raises(tmp_path, rng):
    cell = np.array([[7.0, 0.5, 0], [0.8, 8.0, 0], [0.3, -0.4, 9.0]])
    s = Structure(rng.random((2, 3)), np.array([3, 3]), cell)
    with pytest.raises(ValueError, match="lower-triangular"):
        write_lammps_dump(tmp_path / "bad.lammpstrj", s)


def test_write_single_frame_defaults(tmp_path, system):
    """traj=None writes the structure's own positions as one frame."""
    s, _ = system
    write_xdatcar(tmp_path / "XDATCAR", s)
    _, traj = read_xdatcar(tmp_path / "XDATCAR")
    assert traj.shape == (1, 8, 3)
    np.testing.assert_allclose(traj[0], s.positions, atol=1e-10)
