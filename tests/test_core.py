"""Core data model: Structure, SiteNetwork attribute system, SiteTrajectory."""
import io

import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory, Structure


def make_structure(n_static=8, n_mobile=3, a=10.0, seed=0):
    rng = np.random.default_rng(seed)
    cell = np.eye(3) * a
    pos = rng.uniform(0, a, size=(n_static + n_mobile, 3))
    species = np.array([16] * n_static + [3] * n_mobile)  # S host, Li mobile
    return Structure(pos, species, cell)


def make_network(n_sites=5, n_static=8, n_mobile=3, seed=0):
    s = make_structure(n_static, n_mobile, seed=seed)
    static_mask = s.species == 16
    mobile_mask = s.species == 3
    sn = SiteNetwork(s, static_mask, mobile_mask)
    rng = np.random.default_rng(seed + 1)
    sn.centers = rng.uniform(0, 10, size=(n_sites, 3))
    sn.vertices = [np.sort(rng.choice(n_static, size=4, replace=False))
                   for _ in range(n_sites)]
    return sn


def test_structure_basics():
    s = make_structure()
    assert s.n_atoms == 11
    assert s.symbols[0] == "S" and s.symbols[-1] == "Li"
    assert abs(s.volume - 1000.0) < 1e-9
    w = s.wrapped()
    assert np.all(w.frac_positions >= -1e-12) and np.all(w.frac_positions < 1)
    sub = s[s.species == 3]
    assert sub.n_atoms == 3


def test_structure_species_from_symbols():
    s = Structure(np.zeros((2, 3)), ["Li", "O"], np.eye(3))
    assert list(s.species) == [3, 8]


def test_sitenet_masks_disjoint():
    s = make_structure()
    with pytest.raises(ValueError):
        SiteNetwork(s, np.ones(11, bool), np.ones(11, bool))


def test_sitenet_attributes():
    sn = make_network()
    occ = np.linspace(0, 1, 5)
    nij = np.arange(25).reshape(5, 5).astype(float)
    sn.add_site_attribute("occupancies", occ)
    sn.add_edge_attribute("n_ij", nij)
    # reference-style access by name
    np.testing.assert_array_equal(sn.occupancies, occ)
    np.testing.assert_array_equal(sn.n_ij, nij)
    assert "occupancies" in sn.site_attributes
    assert "n_ij" in sn.edge_attributes
    with pytest.raises(ValueError):
        sn.add_site_attribute("centers", occ)  # reserved
    with pytest.raises(ValueError):
        sn.add_site_attribute("bad", np.zeros(4))  # wrong shape


def test_sitenet_subset_remaps_attributes():
    sn = make_network()
    sn.add_site_attribute("occupancies", np.arange(5.0))
    sn.add_edge_attribute("n_ij", np.arange(25.0).reshape(5, 5))
    sn.site_types = np.array([0, 1, 0, 1, 0])
    sub = sn.subset([1, 3, 4])
    assert sub.n_sites == 3
    np.testing.assert_array_equal(sub.occupancies, [1.0, 3.0, 4.0])
    np.testing.assert_array_equal(sub.n_ij,
                                  sn.n_ij[np.ix_([1, 3, 4], [1, 3, 4])])
    np.testing.assert_array_equal(sub.site_types, [1, 1, 0])
    assert len(sub.vertices) == 3
    np.testing.assert_array_equal(sub.vertices[0], sn.vertices[1])


def test_sitenet_of_type():
    sn = make_network()
    sn.site_types = np.array([0, 1, 0, 1, 0])
    t0 = sn.of_type(0)
    assert t0.n_sites == 3
    assert sn.n_types == 2


def test_sitenet_padded_vertices():
    sn = make_network()
    sn.vertices = [np.array([0, 1]), np.array([2, 3, 4]), np.array([5]),
                   np.array([6, 7]), np.array([0, 2, 4, 6])]
    padded, mask = sn.padded_vertices()
    assert padded.shape == (5, 4) and mask.shape == (5, 4)
    assert mask.sum() == 2 + 3 + 1 + 2 + 4
    np.testing.assert_array_equal(padded[1, :3], [2, 3, 4])
    assert not mask[2, 1]


def test_sitenet_save_load_roundtrip(tmp_path):
    sn = make_network()
    sn.add_site_attribute("occupancies", np.arange(5.0))
    sn.add_edge_attribute("n_ij", np.arange(25.0).reshape(5, 5))
    sn.site_types = np.array([0, 1, 0, 1, 2])
    f = tmp_path / "sn.npz"
    sn.save(f)
    sn2 = SiteNetwork.load(f)
    np.testing.assert_allclose(sn2.centers, sn.centers)
    np.testing.assert_array_equal(sn2.occupancies, sn.occupancies)
    np.testing.assert_array_equal(sn2.n_ij, sn.n_ij)
    np.testing.assert_array_equal(sn2.site_types, sn.site_types)
    assert len(sn2.vertices) == 5
    np.testing.assert_array_equal(sn2.vertices[3], sn.vertices[3])
    assert sn2.structure == sn.structure


def test_sitenet_structure_with_sites():
    sn = make_network()
    s = sn.get_structure_with_sites()
    assert s.n_atoms == 11 + 5
    np.testing.assert_allclose(s.positions[-5:], sn.centers)


def test_sitetraj_basics():
    sn = make_network()
    traj = np.array([[0, 1, 2], [0, 1, 2], [3, 1, -1], [3, 4, 2]])
    st = SiteTrajectory(sn, traj)
    assert st.n_frames == 4 and st.n_mobile == 3
    assert abs(st.percent_unassigned - 1 / 12) < 1e-12
    occ = st.compute_site_occupancies()
    np.testing.assert_allclose(occ, np.array([2, 3, 3, 2, 1]) / 4.0)
    np.testing.assert_allclose(sn.occupancies, occ)
    sliced = st[1:3]
    assert sliced.n_frames == 2


def test_sitetraj_fill_gaps():
    sn = make_network()
    traj = np.array([[0, -1, 2], [-1, -1, 2], [-1, 1, -1], [3, 1, 2]])
    st = SiteTrajectory(sn, traj)
    st.assign_to_last_known_site()
    np.testing.assert_array_equal(
        st.traj, [[0, -1, 2], [0, -1, 2], [0, 1, 2], [3, 1, 2]])


def test_sitetraj_fill_gaps_threshold():
    sn = make_network()
    traj = np.full((5, 3), -1, dtype=np.int32)
    traj[0] = [0, 1, 2]
    st = SiteTrajectory(sn, traj)
    st.assign_to_last_known_site(frame_threshold=2)
    assert np.all(st.traj[1:3] == [[0, 1, 2], [0, 1, 2]])
    assert np.all(st.traj[3:] == -1)


def test_sitetraj_jumps_iteration():
    sn = make_network()
    traj = np.array([[0, 1, 2], [0, 1, 2], [1, -1, 2], [1, 2, 3]])
    st = SiteTrajectory(sn, traj)
    jumps = list(st.jumps())
    assert (2, 0, 0, 1) in jumps
    assert (3, 1, 1, 2) in jumps  # ion 1 jumped across an unknown gap
    assert (3, 2, 2, 3) in jumps
    assert len(jumps) == 3


def test_sitetraj_real_positions_for_site():
    sn = make_network()
    traj = np.array([[0, 1, 0], [0, 0, 1]])
    st = SiteTrajectory(sn, traj)
    rng = np.random.default_rng(7)
    real = rng.uniform(0, 10, size=(2, 11, 3))
    st.set_real_traj(real)
    pts = st.real_positions_for_site(0)
    mobile_idx = np.flatnonzero(sn.mobile_mask)
    expect = np.stack([real[0, mobile_idx[0]], real[0, mobile_idx[2]],
                       real[1, mobile_idx[0]], real[1, mobile_idx[1]]])
    np.testing.assert_allclose(pts, expect)


def test_sitetraj_save_load_roundtrip(tmp_path):
    sn = make_network()
    traj = np.array([[0, 1, 2], [3, 4, -1]])
    st = SiteTrajectory(sn, traj, confidences=np.full((2, 3), 0.5, np.float32))
    f = tmp_path / "st.npz"
    st.save(f)
    st2 = SiteTrajectory.load(f)
    np.testing.assert_array_equal(st2.traj, st.traj)
    np.testing.assert_allclose(st2.confidences, st.confidences)
    assert st2.site_network.n_sites == 5
