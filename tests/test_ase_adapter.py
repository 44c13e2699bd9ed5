"""io/ase_adapter.py contracts, driven against a stub ``ase`` module.

ASE is not installed in this environment (by design — sitator_tpu owns its
own Structure), so the adapter bodies are unreachable without a stand-in.
These tests inject a minimal duck-typed ``ase`` into ``sys.modules`` via
monkeypatch (auto-reverted) and exercise every public function, plus the
ImportError contract with the stub absent.
"""
import sys

import numpy as np
import pytest

from sitator_tpu.core.structure import Structure
from sitator_tpu.io.ase_adapter import from_ase, to_ase, trajectory_from_ase


class _FakeAtoms:
    """Duck-typed ase.Atoms: exactly the surface the adapter touches."""

    def __init__(self, numbers=None, positions=None, cell=None, pbc=None):
        self._numbers = np.asarray(numbers if numbers is not None else [],
                                   dtype=np.int32)
        self._positions = np.asarray(
            positions if positions is not None else np.zeros((0, 3)))
        self._cell = np.zeros((3, 3)) if cell is None else np.asarray(
            cell, dtype=float)
        self.pbc = pbc

    def get_cell(self):
        return self._cell

    def get_positions(self):
        return self._positions

    def get_atomic_numbers(self):
        return self._numbers


@pytest.fixture
def fake_ase(monkeypatch):
    mod = type(sys)("ase")
    mod.Atoms = _FakeAtoms
    monkeypatch.setitem(sys.modules, "ase", mod)
    return mod


def test_from_ase_periodic(fake_ase):
    cell = np.diag([4.0, 5.0, 6.0])
    pos = np.array([[0.5, 0.5, 0.5], [2.0, 2.5, 3.0]])
    atoms = _FakeAtoms(numbers=[3, 8], positions=pos, cell=cell)
    s = from_ase(atoms)
    assert isinstance(s, Structure)
    np.testing.assert_allclose(np.asarray(s.cell), cell)
    np.testing.assert_allclose(np.asarray(s.positions), pos)
    assert list(np.asarray(s.species)) == [3, 8]


def test_from_ase_nonperiodic_bounding_box(fake_ase):
    # zero cell -> bounding box with a 10 A margin, like iread_xyz
    pos = np.array([[0.0, 0.0, 0.0], [2.0, 3.0, 4.0]])
    atoms = _FakeAtoms(numbers=[1, 1], positions=pos)
    s = from_ase(atoms)
    np.testing.assert_allclose(np.asarray(s.cell),
                               np.diag([12.0, 13.0, 14.0]))


def test_to_ase_round_trip(fake_ase):
    cell = np.diag([4.0, 5.0, 6.0])
    pos = np.array([[0.5, 0.5, 0.5], [2.0, 2.5, 3.0]])
    s = Structure(pos, np.array([3, 8]), cell)
    atoms = to_ase(s)
    assert isinstance(atoms, _FakeAtoms)
    np.testing.assert_allclose(atoms.get_positions(), pos)
    np.testing.assert_allclose(atoms.get_cell(), cell)
    assert atoms.pbc is True
    s2 = from_ase(atoms)
    np.testing.assert_allclose(np.asarray(s2.positions),
                               np.asarray(s.positions))


def test_trajectory_from_ase(fake_ase):
    cell = np.diag([4.0, 4.0, 4.0])
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 4, size=(5, 3, 3))
    images = [_FakeAtoms(numbers=[3, 3, 8], positions=f, cell=cell)
              for f in frames]
    structure, traj = trajectory_from_ase(images)
    assert traj.shape == (5, 3, 3)
    np.testing.assert_allclose(traj, frames)
    np.testing.assert_allclose(np.asarray(structure.positions), frames[0])


def test_trajectory_from_ase_empty_raises(fake_ase):
    with pytest.raises(ValueError, match="empty ASE trajectory"):
        trajectory_from_ase([])


def test_import_error_without_ase():
    # skip (not fail) when ase is genuinely importable — the contract
    # only binds in ase-less environments; the message match is the part
    # test_io_errors.test_ase_adapter_requires_ase does not pin
    try:
        import ase  # noqa: F401
        pytest.skip("ase installed in this environment")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="ASE is not installed"):
        from_ase(_FakeAtoms(numbers=[1], positions=[[0.0, 0.0, 0.0]]))
