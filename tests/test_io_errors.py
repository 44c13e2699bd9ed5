"""Error-contract sweep over the IO layer (round-5 line-coverage
audit): malformed-input raises in the text readers, store-type guards
in the tensorstore layer, and the ASE adapter's absent-dependency
message."""
import numpy as np
import pytest

from sitator_tpu.io.formats import read_cif, read_xyz


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_read_xyz_no_frames(tmp_path):
    p = _write(tmp_path, "empty.xyz", "")
    with pytest.raises(ValueError, match="no frames found"):
        read_xyz(p)
    with pytest.raises(ValueError, match="no frames found"):
        read_xyz(p, index="all")


def test_read_xyz_bad_index(tmp_path):
    p = _write(tmp_path, "one.xyz",
               '1\nLattice="4 0 0 0 4 0 0 0 4"\nLi 1 1 1\n')
    with pytest.raises(ValueError, match="index must be None or 'all'"):
        read_xyz(p, index=3)


def test_read_xyz_bad_lattice_entry(tmp_path):
    p = _write(tmp_path, "bad.xyz", '1\nLattice="4 0 0 0 4"\nLi 1 1 1\n')
    with pytest.raises(ValueError, match="bad Lattice= entry"):
        read_xyz(p)


def test_read_cif_missing_cell_parameters(tmp_path):
    p = _write(tmp_path, "nocell.cif", """
data_x
_cell_length_a 4.0
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Li1 0 0 0
""")
    with pytest.raises(ValueError, match="CIF missing cell parameters"):
        read_cif(p)


def test_read_cif_no_atom_sites(tmp_path):
    p = _write(tmp_path, "nosites.cif", """
data_x
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
""")
    with pytest.raises(ValueError, match="no atom_site loop"):
        read_cif(p)


def test_convert_to_npy_no_frames(tmp_path):
    from sitator_tpu.io.formats import convert_to_npy
    src = _write(tmp_path, "empty.xyz", "")
    with pytest.raises(ValueError, match="no frames found"):
        convert_to_npy(src, str(tmp_path / "out.npy"))


def test_tensorstore_not_a_store(tmp_path):
    pytest.importorskip("tensorstore")
    from sitator_tpu.io import TensorstoreTrajectory
    bogus = tmp_path / "not_a_store"
    bogus.mkdir()
    with pytest.raises(ValueError, match="not a zarr/zarr3/n5"):
        TensorstoreTrajectory(str(bogus))


def test_native_lammps_malformed_header(tmp_path):
    from sitator_tpu.io.native import FastLammpsTrajectory
    # ITEM: ATOMS before NUMBER OF ATOMS -> malformed header
    p = _write(tmp_path, "bad.lammpstrj",
               "ITEM: TIMESTEP\n0\nITEM: ATOMS id x y z\n")
    with pytest.raises(ValueError, match="malformed LAMMPS dump header"):
        FastLammpsTrajectory(p)
    # no ITEM: ATOMS at all
    p2 = _write(tmp_path, "bad2.lammpstrj",
                "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n2\n")
    with pytest.raises(ValueError, match="no ITEM: ATOMS header"):
        FastLammpsTrajectory(p2)
    # scaled (fractional) dumps are delegated to the Python reader
    p3 = _write(tmp_path, "scaled.lammpstrj",
                "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n1\n"
                "ITEM: BOX BOUNDS pp pp pp\n0 4\n0 4\n0 4\n"
                "ITEM: ATOMS id xs ys zs\n1 0.1 0.2 0.3\n")
    with pytest.raises(ValueError, match="cartesian columns only"):
        FastLammpsTrajectory(p3)


def test_ase_adapter_requires_ase():
    try:
        import ase  # noqa: F401
        pytest.skip("ase installed in this environment")
    except ImportError:
        pass
    from sitator_tpu.io.ase_adapter import from_ase
    with pytest.raises(ImportError, match="[aA][sS][eE]"):
        from_ase(object())
