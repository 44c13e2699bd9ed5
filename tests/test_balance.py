"""Detailed-balance and occupancy-correlation diagnostics: exact
binomial oracle, equilibrium null (no flags), engineered directed flux
(flagged), and engineered exclusion / co-filling pairs."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
from sitator_tpu.dynamics import (DetailedBalanceAnalysis, JumpAnalysis,
                                  OccupancyCorrelationAnalysis)
from sitator_tpu.dynamics.balance import _binom_two_sided_p


def _network(S, n_ions=2):
    pos = np.concatenate([np.zeros((2, 3)),
                          np.random.default_rng(0).uniform(
                              0, 9, (n_ions, 3))])
    species = np.array([16] * 2 + [3] * n_ions)
    s = Structure(pos, species, np.eye(3) * 10.0)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = np.random.default_rng(1).uniform(0, 9, (S, 3))
    return sn


def test_binom_p_matches_scipy_and_closed_forms():
    # tiny closed forms: k=0, n=4 -> 2 * (1/16) = 1/8
    assert _binom_two_sided_p([0], [4])[0] == pytest.approx(1 / 8)
    # perfectly balanced: p capped at 1
    assert _binom_two_sided_p([5], [10])[0] == 1.0
    assert _binom_two_sided_p([0], [0])[0] == 1.0
    from scipy.stats import binomtest    # hard dependency
    rng = np.random.default_rng(3)
    for _ in range(25):
        n = int(rng.integers(1, 60))
        k = int(rng.integers(0, n + 1))
        want = binomtest(k, n, 0.5, alternative="two-sided").pvalue
        got = _binom_two_sided_p([k], [n])[0]
        # scipy's two-sided is the minlike method; the doubled-tail
        # convention upper-bounds it
        assert got == pytest.approx(want, rel=1e-9) or got >= want


def test_detailed_balance_equilibrium_null():
    """A reversible 2-site flicker: forward/backward counts equal by
    construction — nothing flagged, asymmetry ~0."""
    F = 4000
    labels = np.tile([0, 1], F // 2)[:, None]
    labels = np.concatenate([labels, labels[::-1]], axis=1)
    sn = _network(2)
    st = JumpAnalysis(verbose=False).run(SiteTrajectory(sn, labels))
    db = DetailedBalanceAnalysis(verbose=False).run(st)
    assert db.n_tested_ == 1
    assert len(db.violating_edges_) == 0
    assert sn.edge_asymmetry[0, 1] == pytest.approx(0.0, abs=1e-3)
    assert sn.balance_p[0, 1] > 0.5
    assert sn.edge_asymmetry[0, 1] == -sn.edge_asymmetry[1, 0]


def test_balance_p_nan_for_untested_edges():
    """An edge below min_events must carry NaN (untested), never 1.0
    (which reads as 'tested and perfectly balanced') — even when its
    few events are maximally one-directional."""
    labels = np.concatenate([np.tile([0, 1], 50),
                             [0, 2, 0, 2, 0]])[:, None]
    sn = _network(3, n_ions=1)
    st = JumpAnalysis(verbose=False).run(SiteTrajectory(sn, labels))
    db = DetailedBalanceAnalysis(min_events=8, verbose=False).run(st)
    assert np.isfinite(sn.balance_p[0, 1])          # 100 events: tested
    assert np.isnan(sn.balance_p[0, 2])             # 4 events: untested
    assert np.isnan(sn.balance_p[1, 2])             # 0 events: untested


def test_detailed_balance_flags_directed_flux():
    """An ion driven around a 3-site ring 0→1→2→0 only: every edge is
    maximally asymmetric and flagged."""
    F = 600
    labels = np.tile([0, 1, 2], F // 3)[:, None]
    sn = _network(3, n_ions=1)
    st = JumpAnalysis(verbose=False).run(SiteTrajectory(sn, labels))
    db = DetailedBalanceAnalysis(verbose=False).run(st)
    assert db.n_tested_ == 3
    assert len(db.violating_edges_) == 3
    assert abs(sn.edge_asymmetry[0, 1]) == pytest.approx(1.0)
    assert db.worst_p_ < 1e-20
    # validation
    with pytest.raises(ValueError, match="alpha"):
        DetailedBalanceAnalysis(alpha=0.0)
    with pytest.raises(ValueError, match="n_ij"):
        DetailedBalanceAnalysis(verbose=False).run(
            SiteTrajectory(_network(2, n_ions=1), labels * 0))


def test_occupancy_correlation_exclusion_and_cofilling():
    """Two ions alternating between site pairs: (0,1) strictly
    exclusive (one ion flips between them), (2,3) strictly co-filled
    (the second ion visits both never... construct explicitly)."""
    F = 400
    rng = np.random.default_rng(7)
    flip = rng.integers(0, 2, F)
    # ion A alternates 0/1 (exclusion between 0 and 1);
    # ion B sits on 2 exactly when ion A sits on 0 → r(0,2)=+1, r(1,2)=-1
    la = np.where(flip == 0, 0, 1)
    lb = np.where(flip == 0, 2, 3)
    labels = np.stack([la, lb], axis=1)
    sn = _network(4)
    st = SiteTrajectory(sn, labels)
    oc = OccupancyCorrelationAnalysis(threshold=0.9,
                                      verbose=False).run(st)
    corr = sn.occ_corr
    assert corr[0, 1] == pytest.approx(-1.0)
    assert corr[0, 2] == pytest.approx(1.0)
    assert corr[0, 3] == pytest.approx(-1.0)
    assert np.isnan(corr[0, 0])
    pairs = {tuple(p) for p in oc.exclusive_pairs_.tolist()}
    assert (0, 1) in pairs and (2, 3) in pairs
    co = {tuple(p) for p in oc.cofilling_pairs_.tolist()}
    assert (0, 2) in co and (1, 3) in co
    with pytest.raises(ValueError, match="threshold"):
        OccupancyCorrelationAnalysis(threshold=0.0)


def test_occupancy_correlation_independent_sites_near_zero():
    rng = np.random.default_rng(11)
    F = 6000
    labels = np.stack([rng.integers(0, 2, F),
                       rng.integers(2, 4, F)], axis=1)
    sn = _network(4)
    oc = OccupancyCorrelationAnalysis(threshold=0.3, verbose=False).run(
        SiteTrajectory(sn, labels))
    assert abs(sn.occ_corr[0, 2]) < 0.1
    # each ion's own two alternatives are exclusive; the cross pairs
    # are independent (near-zero correlation)
    pairs = {tuple(p) for p in oc.exclusive_pairs_.tolist()}
    assert pairs == {(0, 1), (2, 3)}
    assert len(oc.cofilling_pairs_) == 0


def test_detailed_balance_on_real_pipeline():
    """Equilibrium hopping MD through the full pipeline: no edge should
    violate detailed balance (the generator is reversible)."""
    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu.landmark import LandmarkAnalysis
    from sitator_tpu.voronoi import VoronoiSiteGenerator
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=6,
                                 n_frames=2000, jump_rate=0.05, seed=5)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    sn = VoronoiSiteGenerator(verbose=False).run(sn)
    st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          verbose=False).run(sn, md.traj)
    st = JumpAnalysis(verbose=False).run(st)
    db = DetailedBalanceAnalysis(verbose=False).run(st)
    assert db.n_tested_ > 0
    assert len(db.violating_edges_) == 0


def test_merge_by_occupancy_correlation():
    """An engineered split site (two labels that co-fill, r = +1 —
    a two-ion construction where one ion flips between the halves of a
    split basin while a partner tracks it) merges into one; unrelated
    sites survive; the trajectory is relabeled consistently."""
    from sitator_tpu.dynamics import MergeSitesByOccupancyCorrelation
    F = 300
    rng = np.random.default_rng(19)
    flip = rng.integers(0, 2, F)
    # sites 0 and 2 are co-filled (both occupied on flip==0), as are
    # 1 and 3 (flip==1) — two split pairs; site 4 is an independent
    # spectator visited by a third ion at random
    la = np.where(flip == 0, 0, 1)
    lb = np.where(flip == 0, 2, 3)
    lc = np.where(rng.integers(0, 2, F) == 0, 4, 5)
    labels = np.stack([la, lb, lc], axis=1)
    sn = _network(6, n_ions=3)
    # put the co-filled pairs within merge distance of each other
    sn.centers = np.array([[1.0, 1, 1], [5.0, 5, 5], [1.5, 1, 1],
                           [5.5, 5, 5], [8.0, 8, 8], [3.0, 8, 2]])
    st = SiteTrajectory(sn, labels)
    out = MergeSitesByOccupancyCorrelation(
        threshold=0.9, distance_threshold=2.0, verbose=False).run(st)
    assert out.site_network.n_sites == 4          # {0,2}, {1,3}, 4, 5
    # co-filled labels now agree frame-by-frame
    assert (out.traj[:, 0] == out.traj[:, 1]).all()
    with pytest.raises(ValueError, match="threshold"):
        MergeSitesByOccupancyCorrelation(threshold=0.0)


def test_merge_by_occupancy_correlation_distance_guard():
    """Co-filled but FAR sites are protected by distance_threshold."""
    from sitator_tpu.dynamics import MergeSitesByOccupancyCorrelation
    F = 200
    flip = np.random.default_rng(23).integers(0, 2, F)
    labels = np.stack([np.where(flip == 0, 0, 1),
                       np.where(flip == 0, 2, 3)], axis=1)
    sn = _network(4)
    sn.centers = np.array([[1.0, 1, 1], [5.0, 5, 5], [8.0, 1, 8],
                           [2.0, 8, 4]])        # all pairs > 2 apart
    st = SiteTrajectory(sn, labels)
    out = MergeSitesByOccupancyCorrelation(
        threshold=0.9, distance_threshold=2.0, verbose=False).run(st)
    assert out.site_network.n_sites == 4          # nothing merged


def test_balance_rerun_verbose_and_zero_tested():
    """Re-running replaces the edge attributes; verbose paths log; a
    chain with every edge below min_events reports worst_p_ = NaN
    (coverage audit)."""
    F = 2000
    labels = np.tile([0, 1], F // 2)[:, None]
    labels = np.concatenate([labels, labels[::-1]], axis=1)
    sn = _network(2)
    st = JumpAnalysis(verbose=False).run(SiteTrajectory(sn, labels))
    db = DetailedBalanceAnalysis(verbose=True).run(st)
    p1 = sn.balance_p.copy()
    DetailedBalanceAnalysis(verbose=True).run(st)
    np.testing.assert_allclose(sn.balance_p, p1)
    # nothing reaches min_events -> zero tested edges, NaN worst_p_
    db0 = DetailedBalanceAnalysis(min_events=10 ** 9,
                                  verbose=True).run(st)
    assert db0.n_tested_ == 0 and np.isnan(db0.worst_p_)

    oc = OccupancyCorrelationAnalysis(verbose=True).run(st)
    c1 = sn.occ_corr.copy()
    OccupancyCorrelationAnalysis(verbose=True).run(st)
    np.testing.assert_allclose(sn.occ_corr, c1, equal_nan=True)
    assert oc.exclusive_pairs_.shape[1] == 2
