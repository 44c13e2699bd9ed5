"""Voronoi seeding: geometric oracles on lattices with known node structure."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, Structure
from sitator_tpu.io import make_hopping_trajectory
from sitator_tpu.ops.pbc import PBCCalculator
from sitator_tpu.voronoi import VoronoiSiteGenerator, periodic_voronoi_nodes


def test_simple_cubic_nodes():
    """Ideal simple-cubic lattice: the (merged) Voronoi nodes are the body
    centers, each defined by its 8 surrounding corner atoms."""
    n, a = 3, 4.0
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    pos = grid * a
    cell = np.eye(3) * (n * a)
    centers, verts, radii = periodic_voronoi_nodes(pos, cell, merge_tol=0.1)
    assert len(centers) == n ** 3
    calc = PBCCalculator(cell)
    expected = (grid + 0.5) * a
    d = calc.pairwise_distances(centers, expected)
    # every body center matched by exactly one node
    assert np.allclose(np.sort(d.min(axis=1)), 0, atol=1e-6)
    assert d.min(axis=0).max() < 1e-6
    # each node's vertex set is the 8 cube corners; radius = a*sqrt(3)/2
    for v, r in zip(verts, radii):
        assert len(v) == 8
        assert abs(r - a * np.sqrt(3) / 2) < 1e-6


def test_perturbed_lattice_covers_all_cages():
    """Frozen disorder splits each degenerate cage node into several genuine
    Voronoi nodes (circumcenters of a perturbed cospherical set scatter).
    The basis must stay over-complete — every cage covered — and every node
    must be geometrically consistent with its vertex atoms."""
    rng = np.random.default_rng(3)
    n, a = 3, 4.0
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    pos = grid * a + rng.normal(scale=0.05, size=(n ** 3, 3))
    cell = np.eye(3) * (n * a)
    centers, verts, radii = periodic_voronoi_nodes(pos, cell, merge_tol=1e-3)
    calc = PBCCalculator(cell)
    expected = (grid + 0.5) * a
    d = calc.pairwise_distances(expected, centers)
    # every cage has at least one node near its center; basis over-complete
    assert d.min(axis=1).max() < 1.0
    assert len(centers) >= n ** 3
    # node radius == distance to every defining vertex atom (unmerged nodes)
    for c, v, r in zip(centers, verts, radii):
        dv = calc.distances(c, pos[v])
        np.testing.assert_allclose(dv, r, atol=1e-6)


def test_translation_equivariance():
    """Rigidly translating the lattice translates the nodes (mod cell)."""
    rng = np.random.default_rng(5)
    pos = rng.uniform(0, 10, size=(30, 3))
    cell = np.eye(3) * 10.0
    t = np.array([1.3, -0.7, 2.9])
    c0, v0, _ = periodic_voronoi_nodes(pos, cell, merge_tol=1e-3)
    c1, v1, _ = periodic_voronoi_nodes(pos + t, cell, merge_tol=1e-3)
    assert len(c0) == len(c1)
    calc = PBCCalculator(cell)
    d = calc.pairwise_distances(c0 + t, c1)
    match = d.argmin(axis=1)
    assert d[np.arange(len(c0)), match].max() < 1e-5
    # vertex sets carry over under the same matching
    for i, j in enumerate(match):
        np.testing.assert_array_equal(np.sort(v0[i]), np.sort(v1[j]))


def test_radical_reduces_to_standard_with_equal_radii():
    rng = np.random.default_rng(11)
    pos = rng.uniform(0, 10, size=(25, 3))
    cell = np.eye(3) * 10.0
    c0, v0, r0 = periodic_voronoi_nodes(pos, cell, merge_tol=1e-3)
    c1, v1, r1 = periodic_voronoi_nodes(pos, cell, merge_tol=1e-3,
                                        radii=np.full(25, 1.3))
    assert len(c0) == len(c1)
    calc = PBCCalculator(cell)
    d = calc.pairwise_distances(c0, c1)
    match = d.argmin(axis=1)
    assert d[np.arange(len(c0)), match].max() < 1e-5
    # radical node radius = standard radius - atom radius
    np.testing.assert_allclose(np.sort(r1[match] + 1.3), np.sort(r0),
                               atol=1e-5)


def test_radical_shifts_nodes_toward_small_atoms():
    """Two atom sizes on a line: the power-diagram boundary moves toward the
    smaller atom, so the node radius seen from the big atom grows."""
    cell = np.eye(3) * 12.0
    # big atom at x=0 plane corners, small at x=6 - build a lattice of 2
    grid = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3) * 6.0
    pos = grid
    radii = np.where(pos[:, 0] < 3, 2.0, 1.0)  # big at x=0, small at x=6
    c_std, _, _ = periodic_voronoi_nodes(pos, cell, merge_tol=0.5)
    c_rad, _, _ = periodic_voronoi_nodes(pos, cell, merge_tol=0.5,
                                         radii=radii)
    # nodes shift in +x toward the smaller atoms
    calc = PBCCalculator(cell)
    d_std_big = calc.distances(pos[0], c_std).min()
    d_rad_big = calc.distances(pos[0], c_rad).min()
    assert d_rad_big > d_std_big


def test_generator_on_synthetic_system():
    md = make_hopping_trajectory(n_cells=3, n_frames=10, seed=1)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    gen = VoronoiSiteGenerator(merge_tol=0.05)
    out = gen.run(sn)
    # over-complete landmark basis: at least one node per true site cage
    assert out.n_sites >= len(md.true_sites)
    calc = PBCCalculator(md.structure.cell)
    d = calc.pairwise_distances(md.true_sites, out.centers)
    assert d.min(axis=1).max() < 1.2
    assert "site_radii" in out.site_attributes
    # vertices must be valid full-structure static atom indices
    for v in out.vertices:
        assert np.all(md.static_mask[v])
    # padded form for kernels works
    padded, mask = out.padded_vertices()
    assert padded.shape[0] == out.n_sites


def test_min_radius_filter():
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 10, size=(40, 3))
    cell = np.eye(3) * 10.0
    s = Structure(pos, [16] * 40, cell)
    sn = SiteNetwork(s, np.ones(40, bool), np.zeros(40, bool))
    all_sites = VoronoiSiteGenerator().run(sn)
    big = VoronoiSiteGenerator(min_radius=1.5).run(sn)
    assert big.n_sites < all_sites.n_sites
    assert np.all(big.site_radii >= 1.5)
