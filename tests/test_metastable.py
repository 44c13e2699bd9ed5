"""Spectral metastability merging (dynamics/metastable.py): basin
recovery on engineered label dynamics, automatic basin-count selection
from the spectral gap, timescale/metastability readouts, agreement with
the MCL merger on its canonical flicker scenario, and the guards."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import (MergeSitesByDynamics,
                                  MergeSitesByMetastability)
from sitator_tpu.dynamics.metastable import pcca_memberships


def _network(n_sites, a=30.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, a, size=(7, 3))
    species = np.array([16] * 6 + [3])
    s = Structure(pos, species, np.eye(3) * a)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, a, size=(n_sites, 3))
    return sn


def _basin_traj(basins, n_frames, switch_every, start=0):
    """One ion cycling through its current basin's sites every frame,
    hopping to the next basin every ``switch_every`` frames."""
    labels = np.empty(n_frames, dtype=np.int32)
    b = start
    for t in range(n_frames):
        if t and t % switch_every == 0:
            b = (b + 1) % len(basins)
        sites = basins[b]
        labels[t] = sites[t % len(sites)]
    return labels[:, None]


def test_two_basin_partition_auto():
    basins = [[0, 1, 2], [3, 4, 5]]
    sn = _network(6)
    st = SiteTrajectory(sn, _basin_traj(basins, 6000, 1000))
    ms = MergeSitesByMetastability(verbose=False)
    st2 = ms.run(st)
    assert ms.n_basins_ == 2
    assert st2.site_network.n_sites == 2
    lab = ms.labels_
    assert len(set(lab[[0, 1, 2]])) == 1
    assert len(set(lab[[3, 4, 5]])) == 1
    assert lab[0] != lab[3]
    # intra-basin mixing is per-frame, basin switches every 1000 —
    # strongly metastable
    assert ms.metastability_ > 0.95
    # slowest relaxation is the basin exchange: hundreds of frames;
    # everything merged away is fast
    assert ms.timescales_[0] > 100
    # relabeled trajectory is the basin sequence
    assert set(np.unique(st2.traj)) == {0, 1}


def test_explicit_matches_auto_and_three_basins():
    basins2 = [[0, 1, 2], [3, 4, 5]]
    sn = _network(6)
    st = SiteTrajectory(sn, _basin_traj(basins2, 6000, 1000))
    ms_auto = MergeSitesByMetastability(verbose=False)
    ms_auto.run(st)
    ms_two = MergeSitesByMetastability(n_basins=2, verbose=False)
    ms_two.run(st)
    assert np.array_equal(ms_auto.labels_, ms_two.labels_)

    basins3 = [[0, 1], [2, 3], [4, 5]]
    st3 = SiteTrajectory(_network(6, seed=1),
                         _basin_traj(basins3, 9000, 900))
    ms3 = MergeSitesByMetastability(n_basins=3, verbose=False)
    out3 = ms3.run(st3)
    assert ms3.n_basins_ == 3
    assert out3.site_network.n_sites == 3
    for grp in basins3:
        assert len(set(ms3.labels_[grp])) == 1


def test_unvisited_site_stays_singleton():
    basins = [[0, 1, 2], [3, 4, 5]]
    sn = _network(7)
    st = SiteTrajectory(sn, _basin_traj(basins, 6000, 1000))
    ms = MergeSitesByMetastability(verbose=False)
    st2 = ms.run(st)
    assert ms.labels_[6] == -1
    assert st2.site_network.n_sites == 3     # 2 basins + the singleton


def test_agrees_with_mcl_on_flicker_scenario():
    """The canonical MergeSitesByDynamics scenario: a flickering pseudo-
    site pair plus one rarely-visited distant site — both mergers must
    find the same partition."""
    rng = np.random.default_rng(0)
    sn = _network(3)
    sn.centers = np.array([[1.0, 1, 1], [1.5, 1, 1], [26, 26, 26]])
    col = rng.integers(0, 2, size=600).astype(np.int32)
    col[400:420] = 2
    st = SiteTrajectory(sn, col[:, None])
    st_mcl = MergeSitesByDynamics(distance_threshold=2.0,
                                  verbose=False).run(st)
    ms = MergeSitesByMetastability(n_basins=2, verbose=False)
    st_ms = ms.run(st)
    assert st_ms.site_network.n_sites == st_mcl.site_network.n_sites == 2
    assert ms.labels_[0] == ms.labels_[1] != ms.labels_[2]


def test_guard_splits_spectral_basin():
    """distance_threshold can veto a spectral merge — far-apart sites
    survive even when the dynamics lump them."""
    rng = np.random.default_rng(1)
    sn = _network(2)
    sn.centers = np.array([[1.0, 1, 1], [26.0, 26, 26]])
    col = rng.integers(0, 2, size=400).astype(np.int32)
    st = SiteTrajectory(sn, col[:, None])
    ms = MergeSitesByMetastability(n_basins=2, distance_threshold=2.0,
                                   verbose=False)
    st2 = ms.run(st)
    assert st2.site_network.n_sites == 2


def test_pcca_memberships_crisp_on_decoupled_blocks():
    """Exactly decoupled 2-block chain: the top-2 eigenvector rows form
    two points; memberships must be exactly crisp."""
    C = np.zeros((4, 4))
    C[0, 1] = C[1, 0] = 5.0
    C[2, 3] = C[3, 2] = 3.0
    np.fill_diagonal(C, [10, 10, 6, 6])
    d = C.sum(axis=1)
    Dm = 1 / np.sqrt(d)
    lam, U = np.linalg.eigh(Dm[:, None] * C * Dm[None, :])
    order = np.argsort(lam)[::-1]
    X = Dm[:, None] * U[:, order[:2]]
    chi, verts = pcca_memberships(X)
    lab = np.argmax(chi, axis=1)
    assert lab[0] == lab[1] != lab[2]
    assert lab[2] == lab[3]
    np.testing.assert_allclose(np.sort(chi, axis=1)[:, 0], 0.0,
                               atol=1e-10)


def test_validation():
    with pytest.raises(ValueError, match="n_basins"):
        MergeSitesByMetastability(n_basins=1)
    with pytest.raises(ValueError, match="basins for"):
        pcca_memberships(np.ones((2, 3)))


def test_auto_withholds_on_well_mixed_chain():
    """Uniform per-frame random walk over all sites: no metastability,
    the auto mode must refuse to merge (explicit n_basins still does)."""
    rng = np.random.default_rng(3)
    sn = _network(6)
    col = rng.integers(0, 6, size=4000).astype(np.int32)
    st = SiteTrajectory(sn, col[:, None])
    ms = MergeSitesByMetastability(verbose=False)
    st2 = ms.run(st)
    assert st2.site_network.n_sites == 6          # merge withheld
    assert ms.separation_ < ms.min_separation     # and for this reason
    forced = MergeSitesByMetastability(n_basins=2, verbose=False)
    st3 = forced.run(st)
    assert st3.site_network.n_sites == 2


def _paired_flicker_traj(n_pairs, n_frames, hop_every, rng):
    """2*n_pairs pseudo-sites: each true site split into a pair the ion
    flickers across every frame; real hops to a random other pair every
    ``hop_every`` frames on average."""
    labels = np.empty(n_frames, dtype=np.int32)
    pair = 0
    for t in range(n_frames):
        if rng.uniform() < 1.0 / hop_every:
            pair = (pair + rng.integers(1, n_pairs)) % n_pairs
        labels[t] = 2 * pair + (t % 2)
    return labels[:, None]


def test_auto_recovers_true_site_count_from_split_pairs():
    """4 true sites each split in two: auto must pick n = 4 (NOT the
    largest eigenvalue gap, which on metastable chains can land on 2)
    and reassemble exactly the pairs."""
    rng = np.random.default_rng(7)
    sn = _network(8)
    st = SiteTrajectory(sn, _paired_flicker_traj(4, 20000, 50, rng))
    ms = MergeSitesByMetastability(verbose=False)
    st2 = ms.run(st)
    assert ms.n_basins_ == 4
    assert st2.site_network.n_sites == 4
    assert ms.separation_ > 5
    for p in range(4):
        assert ms.labels_[2 * p] == ms.labels_[2 * p + 1]


def test_auto_withholds_on_healthy_slow_hopping_network():
    """A well-resolved slow-hopping network is metastable at EVERY
    coarse-graining (mean self-transition ~1 for any partition) — the
    timescale-separation criterion must refuse to merge real sites."""
    rng = np.random.default_rng(9)
    sn = _network(6)
    # ring random walk, residence ~60 frames at each site: no fast/slow
    # split anywhere in the spectrum
    labels = np.empty(12000, dtype=np.int32)
    site = 0
    for t in range(12000):
        if rng.uniform() < 1 / 60:
            site = (site + rng.choice([-1, 1])) % 6
        labels[t] = site
    st = SiteTrajectory(sn, labels[:, None])
    ms = MergeSitesByMetastability(verbose=False)
    st2 = ms.run(st)
    assert st2.site_network.n_sites == 6           # nothing merged
    assert ms.separation_ < ms.min_separation
    # ... even though every partition looks metastable
    assert ms.metastability_ > 0.9


def _network_two_ions(n_sites, a=30.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, a, size=(8, 3))
    species = np.array([16] * 6 + [3] * 2)
    s = Structure(pos, species, np.eye(3) * a)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, a, size=(n_sites, 3))
    return sn


def test_auto_not_fooled_by_trapped_ion():
    """A trapped ion (occupied site, zero jumps) makes the chain
    disconnected: its degenerate unit eigenvalue must be treated as
    structure, not as a ~1e13x timescale split that collapses the
    whole connected network into one basin (regression)."""
    rng = np.random.default_rng(9)
    sn = _network_two_ions(7)
    labels = np.empty((12000, 2), dtype=np.int32)
    site = 0
    for t in range(12000):
        if rng.uniform() < 1 / 60:
            site = (site + rng.choice([-1, 1])) % 6
        labels[t, 0] = site
    labels[:, 1] = 6                         # trapped forever on site 6
    st = SiteTrajectory(sn, labels)
    ms = MergeSitesByMetastability(verbose=False)
    st2 = ms.run(st)
    assert st2.site_network.n_sites == 7     # nothing merged
    assert not np.isfinite(ms.separation_) or \
        ms.separation_ < ms.min_separation


def test_auto_merges_split_pairs_despite_trapped_ion():
    """The genuine over-split signal must still be found when a
    disconnected trapped site coexists with it; the trapped site stays
    its own basin and chi_ columns align with the dense labels."""
    rng = np.random.default_rng(10)
    sn = _network_two_ions(9)                # 4 pairs + trapped site 8
    flick = _paired_flicker_traj(4, 20000, 200, rng)
    labels = np.concatenate(
        [flick, np.full((20000, 1), 8, np.int32)], axis=1)
    st = SiteTrajectory(sn, labels)
    ms = MergeSitesByMetastability(verbose=False)
    st2 = ms.run(st)
    assert st2.site_network.n_sites == 5     # 4 true sites + trapped
    lab = ms.labels_
    assert lab[8] != -1                      # live, its own basin
    assert np.sum(lab == lab[8]) == 1
    for p in range(4):                       # pairs merged
        assert lab[2 * p] == lab[2 * p + 1]
    # chi_ columns follow the dense renumbered labels
    live = np.flatnonzero(lab >= 0)
    assert ms.chi_.shape == (len(live), ms.n_basins_)
    np.testing.assert_array_equal(np.argmax(ms.chi_, axis=1), lab[live])


def test_min_timescale_with_max_basins_does_not_crash():
    """min_timescale pushing n past a max_basins cap must withhold the
    merge, not crash with an IndexError (regression)."""
    rng = np.random.default_rng(11)
    sn = _network(8)
    st = SiteTrajectory(sn, _paired_flicker_traj(4, 20000, 200, rng))
    ms = MergeSitesByMetastability(max_basins=3, min_timescale=2.0,
                                   verbose=False)
    st2 = ms.run(st)                         # must not raise
    assert st2.site_network.n_sites == 8     # withheld under the cap


def test_withheld_live_sites_get_singleton_labels():
    """When auto mode withholds before any basin diagnosis (e.g. only
    two live sites), live sites must NOT carry the -1 never-visited
    sentinel — they are labeled as singletons (regression)."""
    rng = np.random.default_rng(12)
    sn = _network(3)
    labels = (rng.uniform(size=5000) < 0.5).astype(np.int32)[:, None]
    st = SiteTrajectory(sn, labels)
    ms = MergeSitesByMetastability(verbose=False)
    ms.run(st)
    assert set(ms.labels_[:2]) == {0, 1}     # live singletons
    assert ms.labels_[2] == -1               # truly never visited
    assert ms.n_basins_ == 2
