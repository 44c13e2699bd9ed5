"""Bond-valence site seeding: analytic BV sums, minimum-image
correctness, and the chemically-selective FCC closure (octahedral holes
accepted at V≈1, tetrahedral holes rejected at V≈1.4)."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, Structure
from sitator_tpu.network import BondValenceSiteGenerator, match_sites
from sitator_tpu.ops import bondvalence as bv_ops


def test_bv_sums_analytic_single_anion():
    cell = np.eye(3) * 20.0
    anion = np.array([[10.0, 10.0, 10.0]])
    for d in (1.5, 2.0, 3.0):
        probe = anion + np.array([[d, 0.0, 0.0]])
        got = bv_ops.bv_sums(probe, anion, 1.466, cell)[0]
        assert got == pytest.approx(np.exp((1.466 - d) / 0.37),
                                    rel=1e-5)
    # beyond the cutoff: exactly zero
    probe = anion + np.array([[7.0, 0.0, 0.0]])
    assert bv_ops.bv_sums(probe, anion, 1.466, cell, cutoff=6.0)[0] == 0.0


def test_bv_sums_minimum_image():
    """A probe near the cell face sees the anion's periodic image."""
    L = 10.0
    cell = np.eye(3) * L
    anion = np.array([[0.5, 5.0, 5.0]])
    probe = np.array([[L - 0.5, 5.0, 5.0]])     # 1.0 Å across the seam
    got = bv_ops.bv_sums(probe, anion, 1.466, cell)[0]
    assert got == pytest.approx(np.exp((1.466 - 1.0) / 0.37), rel=1e-5)


def _fcc_oxygen_system(n_cells, a):
    basis = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                      [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
    grid = np.stack(np.meshgrid(*[np.arange(n_cells)] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
    o_pos = ((grid[:, None, :] + basis[None]) * a).reshape(-1, 3)
    # one Li somewhere (mobile species for the cation default)
    pos = np.concatenate([o_pos, [[0.5 * a, 0.0, 0.0]]])
    species = np.array([8] * len(o_pos) + [3])
    structure = Structure(pos, species, np.eye(3) * (n_cells * a))
    mobile = species == 3
    return structure, ~mobile, mobile, grid


def test_bv_generator_octahedral_yes_tetrahedral_no():
    """FCC O sublattice sized so the octahedral holes hit V ≈ 1 for Li:
    the generator recovers every octahedral hole and rejects every
    tetrahedral hole (V ≈ 1.44 > tol) — chemistry-selective seeding the
    pure-geometry Voronoi route cannot do."""
    R0, b = 1.466, 0.37
    a = 2 * (R0 + b * np.log(6.0))            # 1st-shell sum == 1
    n_cells = 2
    structure, static, mobile, grid = _fcc_oxygen_system(n_cells, a)
    sn0 = SiteNetwork(structure, static, mobile)
    gen = BondValenceSiteGenerator(v_ideal=1.0, mismatch_tol=0.3,
                                   n_bins=40, min_distance=1.2,
                                   verbose=False)
    sn = gen.run(sn0)

    oct_basis = np.array([[0.5, 0.0, 0.0], [0.0, 0.5, 0.0],
                          [0.0, 0.0, 0.5], [0.5, 0.5, 0.5]])
    oct_holes = ((grid[:, None, :] + oct_basis[None]) * a).reshape(-1, 3)
    tet_basis = np.array([[0.25, 0.25, 0.25], [0.75, 0.75, 0.25],
                          [0.75, 0.25, 0.75], [0.25, 0.75, 0.75],
                          [0.75, 0.25, 0.25], [0.25, 0.75, 0.25],
                          [0.25, 0.25, 0.75], [0.75, 0.75, 0.75]])
    tet_holes = ((grid[:, None, :] + tet_basis[None]) * a).reshape(-1, 3)

    assert sn.n_sites == len(oct_holes)
    truth = SiteNetwork(structure, static, mobile)
    truth.centers = oct_holes
    mapping, dists = match_sites(sn, truth)
    assert (mapping >= 0).all()
    assert np.nanmax(dists) < 0.25
    # every octahedral hole matched exactly once
    assert len(set(mapping.tolist())) == len(oct_holes)
    # BV sums at the recovered sites: 1st shell 1.0 + ~0.02 tail
    assert np.allclose(sn.bv_sum, 1.02, atol=0.05)
    # no recovered center near any tetrahedral hole
    from sitator_tpu.network.compare import min_image_distance_matrix
    D = min_image_distance_matrix(sn.centers, tet_holes, structure.cell)
    assert D.min() > 0.8
    assert sn.has_vertices and all(len(v) == 8 for v in sn.vertices)
    # tetrahedral holes really are out-of-spec for this chemistry
    v_tet = bv_ops.bv_sums(tet_holes,
                           structure.positions[static],
                           np.full(int(static.sum()), R0),
                           structure.cell)
    assert v_tet.min() > 1.3


def test_bv_generator_validation_and_r0_lookup():
    structure, static, mobile, _ = _fcc_oxygen_system(2, 4.2)
    sn0 = SiteNetwork(structure, static, mobile)
    # unknown pair: Xe has no (Xe, O) entry
    with pytest.raises(ValueError, match="required when the mobile"):
        BondValenceSiteGenerator().run(
            SiteNetwork(structure, np.ones(structure.n_atoms, bool),
                        np.zeros(structure.n_atoms, bool)))
    with pytest.raises(ValueError, match="no tabulated"):
        BondValenceSiteGenerator(cation="W", verbose=False).run(sn0)
    with pytest.raises(ValueError, match="no static atoms of species"):
        BondValenceSiteGenerator(anions="Cl", verbose=False).run(sn0)
    with pytest.raises(ValueError, match="mismatch_tol must be"):
        BondValenceSiteGenerator(mismatch_tol=0.0)
    with pytest.raises(ValueError, match="no grid point"):
        BondValenceSiteGenerator(mismatch_tol=1e-9,
                                 verbose=False).run(sn0)
    # explicit scalar r0 overrides the table (W would otherwise fail)
    sn = BondValenceSiteGenerator(cation="W", r0=1.466, v_ideal=1.0,
                                  mismatch_tol=0.5, n_bins=24,
                                  verbose=False).run(sn0)
    assert sn.n_sites > 0


def test_bv_sums_invariances():
    """Rigid translation and integer lattice shifts of probe + anions
    leave every bond-valence sum unchanged (min-image correctness over
    a triclinic cell)."""
    rng = np.random.default_rng(83)
    cell = np.array([[7.0, 0, 0], [1.2, 8.0, 0], [0.5, 0.9, 9.0]])
    anions = rng.uniform(0, 6, (12, 3))
    probes = rng.uniform(0, 6, (20, 3))
    base = bv_ops.bv_sums(probes, anions, 1.94, cell)
    t = rng.uniform(-30, 30, 3)
    shifted = bv_ops.bv_sums(probes + t, anions + t, 1.94, cell)
    np.testing.assert_allclose(shifted, base, rtol=2e-4)
    latt = np.array([2.0, -1.0, 3.0]) @ cell
    moved = bv_ops.bv_sums(probes + latt, anions, 1.94, cell)
    np.testing.assert_allclose(moved, base, rtol=2e-4)


def test_bv_anion_mask_paths_and_verbose():
    """Boolean anion-mask selection (good, wrong-shape, non-static),
    the n_vertices validation, and the verbose run (coverage audit)."""
    R0, b = 1.466, 0.37
    a = 2 * (R0 + b * np.log(6.0))
    structure, static, mobile, _ = _fcc_oxygen_system(2, a)
    sn0 = SiteNetwork(structure, static, mobile)

    with pytest.raises(ValueError, match="n_vertices"):
        BondValenceSiteGenerator(n_vertices=0)
    with pytest.raises(ValueError, match=r"must be \(n_atoms,\)"):
        BondValenceSiteGenerator(anions=np.ones(3, bool),
                                 verbose=False).run(sn0)
    bad = np.ones(structure.n_atoms, bool)     # includes the mobile Li
    with pytest.raises(ValueError, match="non-static"):
        BondValenceSiteGenerator(anions=bad, verbose=False).run(sn0)

    mask = np.asarray(static, bool).copy()
    sn = BondValenceSiteGenerator(v_ideal=1.0, mismatch_tol=0.3,
                                  n_bins=40, min_distance=1.2,
                                  anions=mask, verbose=True).run(sn0)
    assert sn.n_sites > 0
    assert sn.bv_mismatch.shape == (sn.n_sites,)
