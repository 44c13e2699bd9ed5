"""Single-structure readers: POSCAR/CONTCAR (VASP4/5, Selective
dynamics, Direct/Cartesian, negative scale) and minimal P1 CIF
(uncertainty syntax, oxidation-state symbols, symmetry rejection)."""
import numpy as np
import pytest

from sitator_tpu.io import read_cif, read_poscar, read_structure


def test_poscar_vasp5_direct(tmp_path):
    p = tmp_path / "POSCAR"
    p.write_text("""Li2O test
1.5
 2.0 0.0 0.0
 0.0 2.0 0.0
 0.0 0.0 4.0
Li O
2 1
Direct
 0.25 0.25 0.25
 0.75 0.75 0.75
 0.0  0.0  0.0
""")
    s = read_poscar(str(p))
    np.testing.assert_allclose(s.cell, np.diag([3.0, 3.0, 6.0]))
    np.testing.assert_array_equal(s.species, [3, 3, 8])
    np.testing.assert_allclose(s.positions[0], [0.75, 0.75, 1.5])
    np.testing.assert_allclose(s.positions[2], [0.0, 0.0, 0.0])


def test_poscar_vasp4_cartesian_selective(tmp_path):
    p = tmp_path / "CONTCAR"
    p.write_text("""old style
2.0
 1.0 0.0 0.0
 0.0 1.0 0.0
 0.0 0.0 1.0
1 1
Selective dynamics
Cartesian
 0.1 0.2 0.3 T T T
 0.4 0.5 0.6 F F F
""")
    s = read_poscar(str(p))
    np.testing.assert_allclose(s.cell, np.eye(3) * 2.0)
    np.testing.assert_array_equal(s.species, [1, 2])   # VASP4: 1, 2, ...
    # cartesian coordinates scale by the universal factor
    np.testing.assert_allclose(s.positions[0], [0.2, 0.4, 0.6])


def test_poscar_negative_scale_is_volume(tmp_path):
    p = tmp_path / "POSCAR"
    p.write_text("""volume convention
-64.0
 2.0 0.0 0.0
 0.0 2.0 0.0
 0.0 0.0 2.0
Li
1
Direct
 0.5 0.5 0.5
""")
    s = read_poscar(str(p))
    # |det| scaled to exactly 64
    assert abs(np.linalg.det(s.cell)) == pytest.approx(64.0)
    np.testing.assert_allclose(s.positions[0], [2.0, 2.0, 2.0])


def test_cif_p1_triclinic_with_uncertainties(tmp_path):
    p = tmp_path / "s.cif"
    p.write_text("""data_test
_symmetry_space_group_name_H-M   'P 1'
_cell_length_a    5.000(2)
_cell_length_b    6.0
_cell_length_c    7.0
_cell_angle_alpha 90.0
_cell_angle_beta  90.0
_cell_angle_gamma 120.0
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Li1 Li1+ 0.5000(1) 0.0 0.0
O1  O2-  0.0 0.5 0.5
""")
    s = read_cif(str(p))
    np.testing.assert_array_equal(s.species, [3, 8])
    # gamma = 120deg cell: b-vector = (6 cos120, 6 sin120, 0)
    np.testing.assert_allclose(s.cell[0], [5.0, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(s.cell[1], [-3.0, 6.0 * np.sin(
        np.radians(120)), 0.0], atol=1e-9)
    np.testing.assert_allclose(s.cell[2], [0.0, 0.0, 7.0], atol=1e-6)
    np.testing.assert_allclose(s.positions[0], 0.5 * s.cell[0],
                               atol=1e-9)
    # fractional -> cartesian round trip
    frac = s.positions @ np.linalg.inv(s.cell)
    np.testing.assert_allclose(frac, [[0.5, 0, 0], [0, 0.5, 0.5]],
                               atol=1e-9)


def test_cif_rejects_named_symmetry_without_ops(tmp_path):
    """A non-P1 space-group NAME with no operation loop cannot be
    expanded — must raise, not silently drop atoms."""
    p = tmp_path / "sym.cif"
    p.write_text("""data_test
_symmetry_space_group_name_H-M 'F m -3 m'
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Li1 0 0 0
""")
    with pytest.raises(ValueError, match="no symmetry-operation loop"):
        read_cif(str(p))


def test_cif_symmetry_expansion_and_special_positions(tmp_path):
    """Symops ARE applied: inversion doubles a general position but a
    special position (on the inversion center) deduplicates; quoted
    'x, y, z'-style ops with an id column parse; fractional
    translations work."""
    p = tmp_path / "symop.cif"
    p.write_text("""data_test
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_symmetry_equiv_pos_site_id
_symmetry_equiv_pos_as_xyz
1 'x, y, z'
2 '-x, -y, -z'
3 'x+1/2, y+1/2, z'
4 '1/2-x, 1/2-y, -z'
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Li1 0.1 0.2 0.3
O1  0.0 0.0 0.0
""")
    s = read_cif(str(p))
    # Li general position -> 4 images; O on the inversion center and
    # the centering maps it onto (1/2,1/2,0): 2 unique images
    assert int((s.species == 3).sum()) == 4
    assert int((s.species == 8).sum()) == 2
    frac = s.positions @ np.linalg.inv(s.cell)
    li = np.sort([tuple(np.round(f, 6)) for f, z in
                  zip(frac, s.species) if z == 3], axis=0)
    want = np.sort([(0.1, 0.2, 0.3), (0.9, 0.8, 0.7),
                    (0.6, 0.7, 0.3), (0.4, 0.3, 0.7)], axis=0)
    np.testing.assert_allclose(li, want, atol=1e-9)


def test_cif_rocksalt_from_asymmetric_unit(tmp_path):
    """The real-world shape: an Fm-3m-style CIF with face-centering
    ops expands a 2-atom asymmetric unit to the 8-atom conventional
    rocksalt cell."""
    ops = ["x,y,z", "x,y+1/2,z+1/2", "x+1/2,y,z+1/2", "x+1/2,y+1/2,z"]
    lines = ["data_nacl", "_cell_length_a 5.64", "_cell_length_b 5.64",
             "_cell_length_c 5.64", "_cell_angle_alpha 90",
             "_cell_angle_beta 90", "_cell_angle_gamma 90", "loop_",
             "_symmetry_equiv_pos_as_xyz"]
    lines += [f"'{o}'" for o in ops]
    lines += ["loop_", "_atom_site_type_symbol", "_atom_site_fract_x",
              "_atom_site_fract_y", "_atom_site_fract_z",
              "Na 0 0 0", "Cl 0.5 0 0"]
    p = tmp_path / "nacl.cif"
    p.write_text("\n".join(lines) + "\n")
    s = read_cif(str(p))
    assert s.n_atoms == 8
    assert int((s.species == 11).sum()) == 4
    assert int((s.species == 17).sum()) == 4


def test_read_structure_dispatch(tmp_path):
    poscar = tmp_path / "POSCAR_run1"
    poscar.write_text("""x
1.0
 4.0 0 0
 0 4.0 0
 0 0 4.0
Li
1
Direct
 0 0 0
""")
    assert read_structure(str(poscar)).n_atoms == 1
    xyz = tmp_path / "s.xyz"
    xyz.write_text('1\nLattice="4 0 0 0 4 0 0 0 4" '
                   'Properties=species:S:1:pos:R:3\nLi 0 0 0\n')
    assert read_structure(str(xyz)).n_atoms == 1


def test_cif_feeds_bond_valence_seeding(tmp_path):
    """The intended workflow: a P1 CIF straight into BV seeding —
    a rocksalt-ish O cage around the octahedral hole."""
    from sitator_tpu import SiteNetwork
    from sitator_tpu.network import BondValenceSiteGenerator
    a = 2 * (1.466 + 0.37 * np.log(6.0))
    lines = ["data_t", "_cell_length_a %.6f" % (2 * a),
             "_cell_length_b %.6f" % (2 * a),
             "_cell_length_c %.6f" % (2 * a),
             "_cell_angle_alpha 90", "_cell_angle_beta 90",
             "_cell_angle_gamma 90", "loop_", "_atom_site_type_symbol",
             "_atom_site_fract_x", "_atom_site_fract_y",
             "_atom_site_fract_z"]
    basis = [(0, 0, 0), (.5, .5, 0), (.5, 0, .5), (0, .5, .5)]
    for gx in (0, 0.5):
        for gy in (0, 0.5):
            for gz in (0, 0.5):
                for bx, by, bz in basis:
                    lines.append(f"O {gx + bx / 2:.6f} {gy + by / 2:.6f} "
                                 f"{gz + bz / 2:.6f}")
    lines.append("Li 0.25 0.0 0.0")
    p = tmp_path / "li.cif"
    p.write_text("\n".join(lines) + "\n")
    s = read_cif(str(p))
    mobile = s.species == 3
    sn = BondValenceSiteGenerator(v_ideal=1.0, mismatch_tol=0.3,
                                  min_distance=1.2, verbose=False).run(
        SiteNetwork(s, ~mobile, mobile))
    assert sn.n_sites == 32          # the FCC octahedral holes
    assert np.allclose(sn.bv_sum, 1.02, atol=0.05)


def test_write_poscar_roundtrip():
    import tempfile, os
    from sitator_tpu import Structure
    from sitator_tpu.io import write_poscar
    rng = np.random.default_rng(29)
    cell = np.array([[6.0, 0, 0], [1.0, 7.0, 0], [0.3, 0.2, 8.0]])
    pos = rng.uniform(0, 5, (7, 3))
    # interleaved species: the writer groups them (POSCAR convention)
    species = np.array([3, 8, 3, 16, 8, 3, 16])
    s = Structure(pos, species, cell)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "POSCAR")
        write_poscar(p, s)
        back = read_poscar(p)
        # species grouped in first-appearance order: Li Li Li O O S S
        np.testing.assert_array_equal(back.species,
                                      [3, 3, 3, 8, 8, 16, 16])
        order = np.concatenate([np.flatnonzero(species == z)
                                for z in (3, 8, 16)])
        np.testing.assert_allclose(back.positions, pos[order],
                                   atol=1e-8)
        np.testing.assert_allclose(back.cell, cell, atol=1e-9)
        # cartesian mode round-trips too
        write_poscar(p, s, direct=False)
        back2 = read_poscar(p)
        np.testing.assert_allclose(back2.positions, pos[order],
                                   atol=1e-8)


def test_structure_repeat_supercell():
    from sitator_tpu import Structure
    cell = np.array([[4.0, 0, 0], [1.0, 5.0, 0], [0, 0.5, 6.0]])
    s = Structure([[0.5, 0.5, 0.5], [2.0, 2.5, 3.0]], [3, 8], cell)
    sup = s.repeat((2, 1, 3))
    assert sup.n_atoms == 12
    np.testing.assert_allclose(sup.cell,
                               cell * np.array([[2], [1], [3]]))
    # image-major: first image preserves the original order/positions
    np.testing.assert_allclose(sup.positions[:2], s.positions)
    np.testing.assert_array_equal(sup.species[:2], [3, 8])
    # every image is the original shifted by an integer lattice vector
    frac = sup.positions @ np.linalg.inv(cell)
    base = s.positions @ np.linalg.inv(cell)
    for k in range(6):
        d = frac[2 * k:2 * k + 2] - base
        np.testing.assert_allclose(d, np.round(d), atol=1e-12)
    # volume scales; operator form works; validation
    assert sup.volume == pytest.approx(6 * s.volume)
    assert (s * 2).n_atoms == 16
    with pytest.raises(ValueError, match=">= 1"):
        s.repeat((0, 1, 1))


def test_repeat_feeds_small_cell_seeding():
    """The documented workflow: a too-small unit cell tiled up, then
    bond-valence seeding — the 32 octahedral holes again, but starting
    from the 4-O primitive-ish cubic cell."""
    from sitator_tpu import SiteNetwork, Structure
    from sitator_tpu.network import BondValenceSiteGenerator
    a = 2 * (1.466 + 0.37 * np.log(6.0))
    basis = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5]])
    unit = Structure(np.vstack([basis * a, [[a / 2, 0, 0]]]),
                     [8, 8, 8, 8, 3], np.eye(3) * a)
    sup = unit.repeat(2)
    mobile = sup.species == 3
    sn = BondValenceSiteGenerator(v_ideal=1.0, mismatch_tol=0.3,
                                  min_distance=1.2, verbose=False).run(
        SiteNetwork(sup, ~mobile, mobile))
    assert sn.n_sites == 32


def test_cif_noncontiguous_coordinate_columns(tmp_path):
    """CIF column order is arbitrary: an occupancy column BETWEEN the
    coordinate tags must not shift the read (review finding r4-late:
    the contiguous-columns assumption silently misread geometry)."""
    p = tmp_path / "occ.cif"
    p.write_text("""data_t
_cell_length_a 10
_cell_length_b 10
_cell_length_c 10
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_occupancy
_atom_site_fract_y
_atom_site_fract_z
Li1 0.1 1.0 0.2 0.3
""")
    s = read_cif(str(p))
    frac = s.positions @ np.linalg.inv(s.cell)
    np.testing.assert_allclose(frac[0], [0.1, 0.2, 0.3], atol=1e-9)


def test_cif_wrapped_rows_raise_and_unquoted_symops_parse(tmp_path):
    p = tmp_path / "wrap.cif"
    p.write_text("""data_t
_cell_length_a 10
_cell_length_b 10
_cell_length_c 10
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Li1 0.1 0.2
""")
    with pytest.raises(ValueError, match="wrapped loop packets"):
        read_cif(str(p))
    p2 = tmp_path / "unq.cif"
    p2.write_text("""data_t
_cell_length_a 10
_cell_length_b 10
_cell_length_c 10
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_symmetry_equiv_pos_as_xyz
x, y, z
-x, -y, -z
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Li1 0.1 0.2 0.3
""")
    s = read_cif(str(p2))
    assert s.n_atoms == 2                 # unquoted spaced ops parsed


def test_repeat_rejects_fractional_counts():
    from sitator_tpu import Structure
    s = Structure([[0, 0, 0]], [3], np.eye(3) * 4.0)
    with pytest.raises(ValueError, match="integers"):
        s.repeat((1.9, 2, 2))


def test_symop_parser_roundtrip_exhaustive():
    """Construct symop strings from known (R, t) affine forms across
    axis permutations, signs, and common fractional translations —
    the parser must recover them exactly (both '1/2-x' and '-x+1/2'
    orderings)."""
    from itertools import permutations
    from sitator_tpu.io.formats import _parse_symop
    fracs = {"": 0.0, "1/2": 0.5, "1/4": 0.25, "3/4": 0.75,
             "1/3": 1.0 / 3.0, "2/3": 2.0 / 3.0}
    rng = np.random.default_rng(31)
    axes = "xyz"
    for perm in permutations(range(3)):
        signs = rng.choice([-1, 1], size=3)
        tkeys = rng.choice(list(fracs), size=3)
        comps, R, t = [], np.zeros((3, 3)), np.zeros(3)
        for r in range(3):
            ax, sg, tk = perm[r], int(signs[r]), tkeys[r]
            R[r, ax] = sg
            t[r] = fracs[tk]
            var = ("-" if sg < 0 else "") + axes[ax]
            if tk and r % 2:                  # '1/2-x' ordering
                comps.append(f"{tk}{'+' if sg > 0 else '-'}{axes[ax]}")
            elif tk:                          # '-x+1/2' ordering
                comps.append(f"{var}+{tk}")
            else:
                comps.append(var)
        Rp, tp = _parse_symop(", ".join(comps))
        np.testing.assert_allclose(Rp, R, atol=1e-12)
        np.testing.assert_allclose(tp, t, atol=1e-12)
    with pytest.raises(ValueError, match="unsupported|bad CIF"):
        _parse_symop("x, y")
    with pytest.raises(ValueError, match="unsupported"):
        _parse_symop("2x, y, z")


def test_cif_dedup_tolerance_is_metric_not_grid(tmp_path):
    """3-decimal special positions: x=0.167 under '-x+1/3' images to
    0.166333 — within the 1e-3 tolerance but across a 1e-3 grid-bucket
    boundary.  Must dedupe to ONE atom (review finding r4-late: grid
    keys kept both, a duplicated-atom regression)."""
    p = tmp_path / "sp.cif"
    p.write_text("""data_t
_cell_length_a 10
_cell_length_b 10
_cell_length_c 10
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_symmetry_equiv_pos_as_xyz
'x, y, z'
'-x+1/3, y, z'
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Li1 0.167 0.25 0.25
""")
    s = read_cif(str(p))
    assert s.n_atoms == 1

def test_write_cif_roundtrip_and_dispatch(tmp_path):
    """Deterministic write_cif round-trip on a triclinic mixed-species
    structure, plus the write_structure/read_structure dispatch pair
    across all three formats."""
    from sitator_tpu import Structure
    from sitator_tpu.io import read_structure, write_cif, write_structure
    cell = np.array([[6.0, 0, 0], [1.0, 7.0, 0], [0.3, 0.2, 8.0]])
    frac = np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6],
                     [0.9999, 0.0, 0.25], [0.7, 0.1, 0.85]])
    species = np.array([3, 8, 3, 16])
    s0 = Structure(frac @ cell, species, cell)
    p = tmp_path / "rt.cif"
    write_cif(p, s0)
    from sitator_tpu.io import read_cif
    s1 = read_cif(p)
    np.testing.assert_array_equal(s1.species, species)  # order kept
    np.testing.assert_allclose(s1.cell, cell, atol=1e-8)  # canonical == input here
    f1 = s1.positions @ np.linalg.inv(s1.cell)
    d = f1 - frac
    d -= np.round(d)   # the reader wraps into [0, 1)
    assert np.abs(d).max() < 1e-8

    for name in ("w.cif", "POSCAR", "w.xyz"):
        q = tmp_path / name
        write_structure(q, s0)
        back = read_structure(q)
        assert len(back.species) == 4
        if name != "POSCAR":   # POSCAR regroups species
            np.testing.assert_array_equal(back.species, species)

def test_cif_p1_keeps_near_coincident_atoms(tmp_path):
    """Identity-only (P1) CIFs must NOT merge near-coincident distinct
    atoms — split/disordered positions are legitimate structures and the
    special-position dedupe only applies under a non-trivial symmetry
    loop.  Regression for the write_cif->read_cif atom-count loss."""
    from sitator_tpu import Structure
    from sitator_tpu.io import read_cif, write_cif
    cell = np.eye(3) * 10.0
    # two O atoms 5e-4 apart in fractional coords (split position)
    frac = np.array([[0.2500, 0.25, 0.25], [0.2505, 0.25, 0.25],
                     [0.75, 0.75, 0.75]])
    s0 = Structure(frac @ cell, np.array([8, 8, 3]), cell)
    p = tmp_path / "split.cif"
    write_cif(p, s0)
    s1 = read_cif(p)
    assert len(s1.species) == 3            # nothing merged
    np.testing.assert_array_equal(s1.species, [8, 8, 3])
    # ... while a genuine symmetry loop still dedupes special positions
    lines = ["data_t", "_cell_length_a 10", "_cell_length_b 10",
             "_cell_length_c 10", "_cell_angle_alpha 90",
             "_cell_angle_beta 90", "_cell_angle_gamma 90",
             "loop_", "_symmetry_equiv_pos_as_xyz",
             "'x, y, z'", "'-x, -y, -z'",
             "loop_", "_atom_site_type_symbol", "_atom_site_fract_x",
             "_atom_site_fract_y", "_atom_site_fract_z",
             "O 0.0 0.0 0.0"]      # inversion-invariant special position
    q = tmp_path / "sym.cif"
    q.write_text("\n".join(lines) + "\n")
    s2 = read_cif(q)
    assert len(s2.species) == 1            # image merged, not doubled
