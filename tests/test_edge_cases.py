"""Adversarial edge cases: minimal shapes, capacity limits, parser corners."""
import numpy as np
import pytest

import jax.numpy as jnp

from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
from sitator_tpu.io import make_hopping_trajectory, read_xyz, write_xyz
from sitator_tpu.landmark import LandmarkAnalysis
from sitator_tpu.ops.cluster import dotprod_fit
from sitator_tpu.ops.jumps import jump_stats, jump_stats_parallel
from sitator_tpu.voronoi import VoronoiSiteGenerator, periodic_voronoi_nodes


def test_single_mobile_ion_pipeline():
    md = make_hopping_trajectory(n_cells=3, n_ions=1, n_frames=200, seed=6)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    seeds = VoronoiSiteGenerator(merge_tol=0.05).run(sn)
    st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          verbose=False).run(seeds, md.traj)
    assert st.traj.shape == (200, 1)
    assert st.percent_unassigned < 0.05


def test_single_frame_trajectory():
    md = make_hopping_trajectory(n_cells=3, n_ions=3, n_frames=1, seed=7)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    seeds = VoronoiSiteGenerator(merge_tol=0.05).run(sn)
    st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          minimum_site_occupancy=0.0,
                          verbose=False).run(seeds, md.traj)
    assert st.traj.shape == (1, 3)
    # no jumps possible in one frame
    s = jump_stats(jnp.asarray(st.traj), st.site_network.n_sites)
    assert int(np.asarray(s["n_ij"]).sum()) == 0


def test_voronoi_minimum_atoms():
    """Four atoms in a periodic cell: nodes exist and are geometrically
    consistent.  (With so few atoms a node's defining simplex can span
    multiple periodic images of one atom, so unique vertex sets may have
    fewer than 4 members — the documented small-cell caveat.)"""
    from sitator_tpu.ops.pbc import PBCCalculator
    pos = np.array([[1.0, 1, 1], [5, 1, 1], [3, 5, 1], [3, 3, 5]])
    cell = np.eye(3) * 8.0
    centers, verts, radii = periodic_voronoi_nodes(pos, cell,
                                                   merge_tol=1e-3)
    assert len(centers) >= 1
    calc = PBCCalculator(cell)
    for c, v, r in zip(centers, verts, radii):
        assert len(v) >= 1
        # every vertex atom has an image exactly at the node radius
        np.testing.assert_allclose(calc.distances(c, pos[v]).min(), r,
                                   atol=1e-6)


def test_dotprod_kmax_saturation(rng):
    """More natural clusters than k_max: fit fills capacity, stays valid."""
    D = 32
    base = np.eye(D, dtype=np.float32)
    X = np.repeat(base, 20, axis=0)  # 32 perfect clusters
    X += rng.normal(scale=0.01, size=X.shape).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    res = dotprod_fit(jnp.asarray(X), k_max=8, cluster_threshold=0.9,
                      min_samples=1)
    assert res.n_clusters == 8  # capacity-limited, no crash


def test_jump_stats_single_frame_and_column():
    for shape in [(1, 4), (50, 1)]:
        rng = np.random.default_rng(0)
        traj = rng.integers(-1, 3, size=shape).astype(np.int32)
        a = jump_stats(jnp.asarray(traj), 3)
        b = jump_stats_parallel(jnp.asarray(traj), 3)
        np.testing.assert_array_equal(np.asarray(a["n_ij"]),
                                      np.asarray(b["n_ij"]))


def test_xyz_parser_corners(tmp_path):
    """Negative coords, exponents, extra whitespace, blank separator lines."""
    f = tmp_path / "weird.extxyz"
    f.write_text(
        "2\n"
        'Lattice="10 0 0 0 10 0 0 0 10" Properties=species:S:1:pos:R:3\n'
        "Li   -1.5e0  2.25E-1   9.125\n"
        "S    0.0     -0.5      1e1\n"
        "\n"
        "2\n"
        'Lattice="10 0 0 0 10 0 0 0 10"\n'
        "Li 1 2 3\n"
        "S 4 5 6\n")
    s, traj = read_xyz(f, index="all")
    assert traj.shape == (2, 2, 3)
    np.testing.assert_allclose(traj[0, 0], [-1.5, 0.225, 9.125])
    np.testing.assert_allclose(traj[0, 1], [0.0, -0.5, 10.0])
    np.testing.assert_allclose(traj[1, 1], [4, 5, 6])


def test_subset_to_empty_network():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 8, (6, 3))
    s = Structure(pos, [16] * 5 + [3], np.eye(3) * 8)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, 8, (3, 3))
    sn.add_site_attribute("occupancies", np.arange(3.0))
    empty = sn.subset(np.zeros(3, dtype=bool))
    assert empty.n_sites == 0
    assert empty.occupancies.shape == (0,)


def test_sitetraj_all_unknown_occupancies():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 8, (6, 3))
    s = Structure(pos, [16] * 4 + [3] * 2, np.eye(3) * 8)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, 8, (2, 3))
    st = SiteTrajectory(sn, np.full((5, 2), -1, np.int32))
    occ = st.compute_site_occupancies()
    np.testing.assert_array_equal(occ, [0.0, 0.0])
    assert st.percent_unassigned == 1.0
    st.assign_to_last_known_site()      # nothing to fill; must not crash
    assert st.percent_unassigned == 1.0


@pytest.mark.parametrize("unknown_frac", [0.0, 0.5, 0.95])
def test_jump_stats_fuzz_vs_oracle(unknown_frac):
    """Randomized fuzz: scan and parallel jump stats vs the python oracle
    at varying unknown-frame densities."""
    from tests.test_dynamics import oracle_jump_stats
    rng = np.random.default_rng(int(unknown_frac * 100))
    for trial in range(3):
        F, M, S = rng.integers(2, 120), rng.integers(1, 7), rng.integers(2, 9)
        traj = rng.integers(0, S, size=(F, M)).astype(np.int32)
        mask = rng.random((F, M)) < unknown_frac
        traj[mask] = -1
        n_ij, lag, res_sum, res_cnt = oracle_jump_stats(traj, S)
        for fn in (jump_stats, jump_stats_parallel):
            got = fn(jnp.asarray(traj), int(S))
            np.testing.assert_array_equal(np.asarray(got["n_ij"]), n_ij)
            np.testing.assert_array_equal(np.asarray(got["lag_sum"]), lag)
            np.testing.assert_array_equal(np.asarray(got["res_sum"]),
                                          res_sum)
            np.testing.assert_array_equal(np.asarray(got["res_cnt"]),
                                          res_cnt)


def test_soap_species_sensitivity():
    """Swapping the species of half an environment changes the descriptor;
    species-preserving permutations do not."""
    from sitator_tpu.site_descriptors import soap_descriptors
    pos = np.array([[2.0, 0, 0], [-2, 0, 0], [0, 2, 0], [0, -2, 0],
                    [0, 0, 2], [0, 0, -2]]) + 7.0
    cell = np.eye(3) * 14.0
    probe = np.array([[7.0, 7.0, 7.0]])
    # NOTE: a 3/3 split of the octahedron swaps onto itself by rotation
    # (the swapped config is a rotated copy), so a rotation-invariant
    # descriptor rightly cannot see it; use a 4/2 composition change
    sp_a = np.array([16, 16, 16, 16, 8, 8])
    sp_b = np.array([8, 8, 8, 8, 16, 16])      # species swapped
    kw = dict(r_cut=4.0, species_list=np.array([8, 16]))
    d_a = soap_descriptors(probe, pos, sp_a, cell, **kw)
    d_b = soap_descriptors(probe, pos, sp_b, cell, **kw)
    assert float(d_a[0] @ d_b[0]) < 0.999
    # permuting atoms WITHIN a species is invisible
    perm = np.array([2, 0, 1, 5, 3, 4])
    d_p = soap_descriptors(probe, pos[perm], sp_a[perm], cell, **kw)
    np.testing.assert_allclose(d_a, d_p, atol=1e-6)


def test_dotprod_determinism(rng):
    X = rng.random((300, 12)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    r1 = dotprod_fit(jnp.asarray(X), k_max=16, cluster_threshold=0.95,
                     min_samples=2)
    r2 = dotprod_fit(jnp.asarray(X), k_max=16, cluster_threshold=0.95,
                     min_samples=2)
    np.testing.assert_array_equal(np.asarray(r1["centers"]),
                                  np.asarray(r2["centers"]))
    assert r1.n_clusters == r2.n_clusters
