"""Site-network matching: minimum-image optimal assignment between two
networks, the glue for temperature-series and run-to-run comparisons."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.core.structure import Structure
from sitator_tpu.network import (compare_site_networks, match_sites,
                                 min_image_distance_matrix)


def _net(centers, cell=None, types=None):
    cell = np.eye(3) * 10.0 if cell is None else np.asarray(cell)
    structure = Structure(np.zeros((2, 3)), [16, 3], cell)
    sn = SiteNetwork(structure, np.array([1, 0], bool),
                     np.array([0, 1], bool))
    sn.centers = np.asarray(centers, dtype=np.float64)
    if types is not None:
        sn.site_types = np.asarray(types, np.int32)
    return sn


def test_min_image_distance_matrix_wraps():
    cell = np.eye(3) * 10.0
    a = np.array([[0.5, 5.0, 5.0]])
    b = np.array([[9.5, 5.0, 5.0], [4.5, 5.0, 5.0]])
    D = min_image_distance_matrix(a, b, cell)
    np.testing.assert_allclose(D, [[1.0, 4.0]])


def test_match_permuted_jittered_copy():
    """A permuted, slightly jittered, cell-wrapped copy matches site-for-
    site with the inverse permutation."""
    rng = np.random.default_rng(3)
    centers = rng.uniform(0, 10, (12, 3))
    perm = rng.permutation(12)
    jitter = rng.normal(scale=0.05, size=(12, 3))
    # wrap some of the permuted copies across the boundary
    moved = centers[perm] + jitter
    moved[::3] += np.array([10.0, 0, 0])
    sn_a, sn_b = _net(centers), _net(moved)
    mapping, dists = match_sites(sn_a, sn_b)
    np.testing.assert_array_equal(mapping, np.argsort(perm))
    assert np.nanmax(dists) < 0.3


def test_match_rectangular_and_cutoff():
    """Different site counts: the excess site is unmatched; cutoff
    prevents absurd pairings."""
    sn_a = _net([[1.0, 1, 1], [5.0, 5, 5]])
    sn_b = _net([[1.1, 1, 1], [5.0, 5.1, 5], [8.0, 8, 8]])
    mapping, dists = match_sites(sn_a, sn_b)
    np.testing.assert_array_equal(mapping, [0, 1])
    # now an a-site with no nearby partner
    sn_c = _net([[1.0, 1, 1], [3.3, 3.3, 3.3]])
    sn_d = _net([[1.1, 1, 1]])
    mapping, dists = match_sites(sn_c, sn_d, cutoff=1.0)
    np.testing.assert_array_equal(mapping, [0, -1])
    assert np.isnan(dists[1])
    # cutoff kills even the only possible match when it is too far
    mapping, _ = match_sites(sn_c, sn_d, cutoff=0.01)
    np.testing.assert_array_equal(mapping, [-1, -1])


def test_compare_report_and_type_agreement():
    sn_a = _net([[1.0, 1, 1], [5.0, 5, 5], [9.0, 9, 9]],
                types=[0, 1, 0])
    sn_b = _net([[1.05, 1, 1], [5.0, 5.05, 5]], types=[0, 0])
    rep = compare_site_networks(sn_a, sn_b, cutoff=1.0)
    assert rep["n_matched"] == 2
    np.testing.assert_array_equal(rep["unmatched_a"], [2])
    assert rep["unmatched_b"].size == 0
    assert rep["type_agreement"] == pytest.approx(0.5)
    assert rep["max_distance"] < 0.1
    # untyped -> None
    sn_b.site_types = None
    assert compare_site_networks(sn_a, sn_b)["type_agreement"] is None


def test_match_rejects_different_cells():
    sn_a = _net([[1.0, 1, 1]])
    sn_b = _net([[1.0, 1, 1]], cell=np.eye(3) * 12.0)
    with pytest.raises(ValueError, match="different cells"):
        match_sites(sn_a, sn_b)


def test_match_empty_network():
    sn_a = _net(np.zeros((0, 3)))
    sn_b = _net([[1.0, 1, 1]])
    mapping, dists = match_sites(sn_a, sn_b)
    assert mapping.shape == (0,) and dists.shape == (0,)


def test_engine_to_engine_site_agreement():
    """Classic vs streaming engine on the same trajectory discover the
    same site set (matched within a fraction of the lattice constant)."""
    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu.landmark import LandmarkAnalysis
    from sitator_tpu.landmark.streaming import StreamingLandmarkAnalysis
    from sitator_tpu.voronoi import VoronoiSiteGenerator

    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=6,
                                 n_frames=400, jump_rate=0.02, seed=6)
    sn = SiteNetwork(md.structure, ~md.mobile_mask, md.mobile_mask)
    sn = VoronoiSiteGenerator().run(sn)
    st1 = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                           verbose=False).run(sn, md.traj)

    class _R:
        structure = md.structure
        n_atoms = md.structure.n_atoms

        def __len__(self):
            return md.traj.shape[0]

        def __getitem__(self, key):
            return md.traj[key]

    sn2 = StreamingLandmarkAnalysis(cutoff_midpoint=4.0,
                                    cutoff_steepness=3.0,
                                    block_frames=128,
                                    verbose=False).run(sn, _R())
    rep = compare_site_networks(st1.site_network, sn2, cutoff=1.0)
    assert rep["n_matched"] >= min(st1.site_network.n_sites,
                                   sn2.n_sites) - 1
    assert rep["mean_distance"] < 0.5


def test_to_networkx_export():
    """Graph export: nodes carry centers/types/scalar attrs, edges carry
    weight + min-image distance + other finite scalar edge attrs."""
    nx = pytest.importorskip("networkx")
    from sitator_tpu.network import to_networkx
    sn = _net([[1.0, 1, 1], [9.5, 1, 1], [5.0, 5, 5]],
              types=[0, 0, 1])
    n_ij = np.array([[0.0, 4, 0], [2, 0, 1], [0, 3, 0]])
    sn.add_edge_attribute("n_ij", n_ij)
    ea = np.full((3, 3), np.nan)
    ea[0, 1] = 0.25
    sn.add_edge_attribute("Ea_ij", ea)
    sn.add_site_attribute("occupancies", np.array([0.5, 0.3, 0.2]))
    sn.add_site_attribute("vectors", np.ones((3, 4)))   # skipped (2-D)
    g = to_networkx(sn, edge_threshold=1.5)
    assert g.number_of_nodes() == 3
    assert g.nodes[0]["site_type"] == 0
    assert g.nodes[1]["occupancies"] == pytest.approx(0.3)
    assert "vectors" not in g.nodes[0]
    # edges above threshold 1.5 only: (0,1)=4, (1,0)=2, (2,1)=3 — not (1,2)=1
    assert set(g.edges) == {(0, 1), (1, 0), (2, 1)}
    assert g.edges[0, 1]["weight"] == 4.0
    # min-image: sites 0 and 1 are 1.5 apart across the boundary
    assert g.edges[0, 1]["distance"] == pytest.approx(1.5)
    assert g.edges[0, 1]["Ea_ij"] == pytest.approx(0.25)
    assert "Ea_ij" not in g.edges[1, 0]                 # NaN dropped
    # nodes-only export and validation
    assert to_networkx(sn, edge_attr=None).number_of_edges() == 0
    with pytest.raises(ValueError, match="no edge attribute"):
        to_networkx(sn, edge_attr="bogus")
    # composes with networkx algorithms
    assert nx.has_path(g.to_undirected(), 0, 2)
