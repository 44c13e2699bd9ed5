"""Transition-path theory (dynamics/tpt.py): analytic committor of a
1-D chain, q- = 1 - q+ under detailed balance, flux conservation,
two-channel pathway decomposition with the right ordering and widths,
the TPT rate against a brute-force reactive-crossing count, and the
full measured-trajectory route."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import TransitionPathAnalysis
from sitator_tpu.dynamics.tpt import committors, reactive_flux


def _network(S, cell=20.0):
    structure = Structure(np.zeros((2, 3)), [16, 3], np.eye(3) * cell)
    sn = SiteNetwork(structure, np.array([1, 0], bool),
                     np.array([0, 1], bool))
    rng = np.random.default_rng(0)
    sn.centers = rng.uniform(0, cell, (S, 3))
    return sn


def _chain_network(n_ij, t_i):
    sn = _network(len(t_i))
    sn.add_edge_attribute("n_ij", np.asarray(n_ij, np.float64))
    sn.add_site_attribute("total_corrected_residences",
                          np.asarray(t_i, np.float64))
    return sn


def _symmetric_chain_P(S, p=0.2):
    P = np.zeros((S, S))
    for i in range(S):
        if i > 0:
            P[i, i - 1] = p
        if i < S - 1:
            P[i, i + 1] = p
    P[np.arange(S), np.arange(S)] = 1 - P.sum(1)
    return P


def test_committor_linear_on_symmetric_chain():
    S = 11
    P = _symmetric_chain_P(S)
    q_plus, q_minus, pi = committors(P, [0], [S - 1])
    np.testing.assert_allclose(q_plus, np.arange(S) / (S - 1),
                               atol=1e-10)
    # symmetric chain is detailed-balance: q- = 1 - q+
    np.testing.assert_allclose(q_minus, 1 - q_plus, atol=1e-10)
    # flux conservation: divergence-free at every interior site, and
    # flux out of A == flux into B
    f, net = reactive_flux(P, q_plus, q_minus, pi)
    div = f.sum(axis=1) - f.sum(axis=0)
    np.testing.assert_allclose(div[1:-1], 0.0, atol=1e-12)
    assert f[0].sum() == pytest.approx(f[:, -1].sum(), rel=1e-12)


def test_committor_validation():
    P = _symmetric_chain_P(5)
    with pytest.raises(ValueError, match="disjoint"):
        committors(P, [0, 1], [1, 4])
    with pytest.raises(ValueError, match="non-empty"):
        committors(P, [], [4])
    with pytest.raises(ValueError, match="row-stochastic"):
        committors(np.eye(5) * 0.5, [0], [4])


def _two_channel_counts():
    """0 -> {1 -> 2} (wide) / {3 -> 4} (narrow) -> 5, symmetric counts
    (detailed balance with pi propto t_i)."""
    S = 6
    n = np.zeros((S, S))
    wide, narrow = 40.0, 8.0
    for a, b in [(0, 1), (1, 2), (2, 5)]:
        n[a, b] = n[b, a] = wide
    for a, b in [(0, 3), (3, 4), (4, 5)]:
        n[a, b] = n[b, a] = narrow
    t = 10.0 * n.sum(axis=1)
    return n, t


def test_two_channel_pathway_decomposition():
    n, t = _two_channel_counts()
    sn = _chain_network(n, t)
    tpa = TransitionPathAnalysis(sources=[0], sinks=[5], n_paths=4,
                                 verbose=False)
    tpa.run(sn)
    assert tpa.q_plus_[0] == 0.0 and tpa.q_plus_[5] == 1.0
    # detailed balance: backward committor is the complement
    np.testing.assert_allclose(tpa.q_minus_, 1 - tpa.q_plus_,
                               atol=1e-10)
    # two pathways, wide channel first, and together they carry ALL
    # the net flux (there is no other route)
    assert len(tpa.pathways_) == 2
    (p1, w1), (p2, w2) = tpa.pathways_
    assert p1 == [0, 1, 2, 5]
    assert p2 == [0, 3, 4, 5]
    assert w1 > w2 > 0
    assert tpa.path_flux_fraction_ == pytest.approx(1.0, rel=1e-9)
    assert tpa.rate_ == pytest.approx(w1 + w2, rel=1e-9)
    # attrs written
    assert "committor" in sn.site_attributes
    assert "reactive_flux_ij" in sn.edge_attributes
    c = sn.committor
    assert np.nanmin(c) >= 0 and np.nanmax(c) <= 1


def test_tpt_rate_matches_brute_force_crossing_count():
    """Count completed A->B reactive crossings in a long simulated walk
    of the same chain: the per-frame count is the TPT flux F."""
    n, t = _two_channel_counts()
    sn = _chain_network(n, t)
    tpa = TransitionPathAnalysis(sources=[0], sinks=[5], verbose=False)
    tpa.run(sn)

    from sitator_tpu.dynamics.kmc import transition_matrix_from_network
    P = transition_matrix_from_network(sn)
    rng = np.random.default_rng(7)
    F_frames = 400_000
    cum = P.cumsum(axis=1)
    state = 0
    last_boundary = 0          # walker starts in A
    crossings = 0
    u = rng.uniform(size=F_frames)
    for k in range(F_frames):
        state = int(np.searchsorted(cum[state], u[k]))
        if state == 0:
            last_boundary = 0
        elif state == 5:
            if last_boundary == 0:
                crossings += 1
            last_boundary = 5
    assert crossings / F_frames == pytest.approx(tpa.rate_, rel=0.08)


def test_tpt_validation_and_dead_sites():
    n, t = _two_channel_counts()
    # site 6: never visited (zero residence, absorbing row)
    S = 7
    n2 = np.zeros((S, S))
    n2[:6, :6] = n
    t2 = np.concatenate([t, [0.0]])
    sn = _chain_network(n2, t2)
    tpa = TransitionPathAnalysis(sources=[0], sinks=[5], verbose=False)
    tpa.run(sn)
    assert np.isnan(sn.committor[6])        # no stationary mass
    assert tpa.net_flux_[6].sum() == 0.0
    with pytest.raises(ValueError, match="disjoint"):
        TransitionPathAnalysis(sources=[0], sinks=[0])
    with pytest.raises(ValueError, match="non-empty"):
        TransitionPathAnalysis(sources=[], sinks=[1])
    with pytest.raises(ValueError, match="out of range"):
        TransitionPathAnalysis(sources=[0], sinks=[99]).run(sn)
    with pytest.raises(ValueError, match="no stationary mass"):
        TransitionPathAnalysis(sources=[6], sinks=[0],
                               verbose=False).run(sn)
    sn_bare = _network(3)
    with pytest.raises(ValueError, match="JumpAnalysis first"):
        TransitionPathAnalysis(sources=[0], sinks=[2]).run(sn_bare)


def test_tpt_on_measured_trajectory():
    """Full pipeline: hopping MD -> landmark -> JumpAnalysis -> TPT
    between the extreme-x site groups; committor increases with x on
    average and the rate is positive."""
    from sitator_tpu.dynamics import JumpAnalysis
    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu.landmark import LandmarkAnalysis
    from sitator_tpu.voronoi import VoronoiSiteGenerator

    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=6,
                                 n_frames=3000, jump_rate=0.05, seed=8)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    sn = VoronoiSiteGenerator(verbose=False).run(sn)
    st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          verbose=False).run(sn, md.traj)
    st = JumpAnalysis(verbose=False).run(st)
    sn = st.site_network
    x = sn.centers[:, 0]
    occ = np.asarray(sn.occupancies)
    lo = np.flatnonzero((x <= np.quantile(x, 0.15)) & (occ > 0))
    hi = np.flatnonzero((x >= np.quantile(x, 0.85)) & (occ > 0))
    tpa = TransitionPathAnalysis(sources=lo, sinks=hi, verbose=False)
    tpa.run(st)
    assert tpa.rate_ > 0
    assert len(tpa.pathways_) >= 1
    c = sn.committor
    good = np.isfinite(c)
    # correlation between committor and x is strongly positive
    r = np.corrcoef(x[good], c[good])[0, 1]
    assert r > 0.5
    # every pathway runs source -> sink
    for path, w in tpa.pathways_:
        assert path[0] in lo and path[-1] in hi
        assert w > 0


def test_fed_absorbing_site_does_not_steal_the_measure():
    """A site entered at least once whose visitor never leaves (zero
    recorded out-jumps, nonzero residence) is an absorbing row; the
    abstract stationary distribution funnels ALL mass into it.  TPT
    must weight states by the empirical measure instead and keep
    working."""
    S = 6
    n = np.zeros((S, S))
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4)]:
        n[a, b] = n[b, a] = 20.0
    n[2, 5] = 1.0                 # one ion wandered in and never left
    t = 10.0 * n.sum(axis=1)
    t[5] = 50.0                   # parked there until trajectory end
    sn = _chain_network(n, t)
    tpa = TransitionPathAnalysis(sources=[0], sinks=[4], verbose=False)
    tpa.run(sn)                   # raised 'no stationary mass' before
    assert tpa.rate_ > 0
    # the trap site can't reach A or B: no committor, no flux through
    assert tpa.q_plus_[5] == 0.0
    assert tpa.net_flux_[5].sum() == 0.0
    assert tpa.net_flux_[:, 5].sum() == 0.0
    # committor still monotone along the conducting chain
    assert np.all(np.diff(tpa.q_plus_[:5]) > 0)


def test_isolated_recurrent_class_is_no_flux_not_singular():
    """A live recurrent class disjoint from A∪B (an isolated exchanging
    site pair) makes I - P_ff exactly singular unless the solve is
    restricted to states that can reach the boundary."""
    S = 5
    n = np.zeros((S, S))
    for a, b in [(0, 1), (1, 2)]:
        n[a, b] = n[b, a] = 10.0
    n[3, 4] = n[4, 3] = 1.0       # P[3,4] = 0.5 exactly
    t = np.array([20.0, 40.0, 20.0, 2.0, 2.0])
    sn = _chain_network(n, t)
    tpa = TransitionPathAnalysis(sources=[0], sinks=[2], verbose=False)
    tpa.run(sn)                   # np.linalg.LinAlgError before
    assert tpa.q_plus_[3] == tpa.q_plus_[4] == 0.0
    assert tpa.rate_ > 0
    assert tpa.net_flux_[3:].sum() == 0.0


def test_duplicate_group_indices_do_not_double_count():
    n, t = _two_channel_counts()
    sn = _chain_network(n, t)
    ref = TransitionPathAnalysis(sources=[0], sinks=[5], verbose=False)
    ref.run(sn)
    dup = TransitionPathAnalysis(sources=[0, 0], sinks=[5, 5, 5],
                                 verbose=False)
    dup.run(sn)
    assert dup.rate_ == pytest.approx(ref.rate_, rel=1e-12)
    assert dup.path_flux_fraction_ == pytest.approx(
        ref.path_flux_fraction_, rel=1e-12)
