"""KineticMonteCarlo: resampling the measured site-network Markov chain
must reproduce the statistics it was built from (closure), and the
site-discretized diffusivity of a resampled lattice walk must match the
analytic random-walk value."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.core.sitetraj import SiteTrajectory
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import (JumpAnalysis, KineticMonteCarlo,
                                  SiteDiffusionAnalysis)
from sitator_tpu.dynamics.kmc import transition_matrix_from_network


def _network(centers, cell_size=20.0, species=16):
    S = len(centers)
    structure = Structure(np.zeros((2, 3)), [species, 3],
                          np.eye(3) * cell_size)
    sn = SiteNetwork(structure, np.array([1, 0], bool),
                     np.array([0, 1], bool))
    sn.centers = np.asarray(centers, dtype=np.float64)
    return sn


def test_transition_matrix_from_network():
    sn = _network([[1.0, 1, 1], [3.0, 3, 3], [5.0, 5, 5]])
    n_ij = np.array([[0, 10, 0], [5, 0, 5], [0, 10, 0]], np.float64)
    t_i = np.array([100.0, 50.0, 0.0])   # site 2 never visited
    sn.add_edge_attribute("n_ij", n_ij)
    sn.add_site_attribute("total_corrected_residences", t_i)
    P = transition_matrix_from_network(sn)
    np.testing.assert_allclose(P[0], [0.9, 0.1, 0.0])
    np.testing.assert_allclose(P[1], [0.1, 0.8, 0.1])
    np.testing.assert_allclose(P[2], [0.0, 0.0, 1.0])   # absorbing
    np.testing.assert_allclose(P.sum(1), 1.0)
    # missing attributes -> instructive error
    sn2 = _network([[1.0, 1, 1]])
    with pytest.raises(ValueError, match="JumpAnalysis first"):
        transition_matrix_from_network(sn2)


def test_kmc_closure_on_explicit_chain():
    """JumpAnalysis on the resampled trajectory recovers the chain it
    was generated from: per-frame jump rates and stationary occupancy."""
    sn = _network([[2.0, 2, 2], [6.0, 6, 6], [10.0, 10, 10]])
    P = np.array([[0.96, 0.03, 0.01],
                  [0.02, 0.95, 0.03],
                  [0.02, 0.02, 0.96]])
    kmc = KineticMonteCarlo(n_walkers=64, n_frames=6000, seed=1,
                            start="stationary", transition_matrix=P,
                            verbose=False)
    st = kmc.run(sn)
    assert st.traj.shape == (6000, 64)
    assert st.site_network.n_mobile == 64
    ja = JumpAnalysis(verbose=False).run(st)
    sn2 = st.site_network
    P_meas = transition_matrix_from_network(sn2)
    # ~4e5 walker-frames: rates to ~3 sigma of their Poisson error
    np.testing.assert_allclose(P_meas, P, atol=0.004)
    occ = np.asarray(sn2.occupancies, dtype=np.float64)
    occ = occ / occ.sum()
    np.testing.assert_allclose(occ, kmc.stationary_, atol=0.02)


def test_kmc_from_jump_analysis_attributes():
    """Full closure loop: measured MD stats -> KMC resample -> re-measured
    stats agree (the transition matrix round-trips through JumpAnalysis)."""
    # generate a ground-truth chain, measure it, resample the measurement
    sn = _network([[2.0, 2, 2], [6.0, 6, 6]])
    P_true = np.array([[0.97, 0.03], [0.05, 0.95]])
    st0 = KineticMonteCarlo(n_walkers=16, n_frames=8000, seed=7,
                            start="stationary", transition_matrix=P_true,
                            verbose=False).run(sn)
    JumpAnalysis(verbose=False).run(st0)
    kmc = KineticMonteCarlo(n_walkers=32, n_frames=8000, seed=8,
                            verbose=False)
    st1 = kmc.run(st0.site_network)
    JumpAnalysis(verbose=False).run(st1)
    P0 = transition_matrix_from_network(st0.site_network)
    P1 = transition_matrix_from_network(st1.site_network)
    np.testing.assert_allclose(P1, P0, atol=0.006)


def test_kmc_site_diffusivity_matches_random_walk():
    """Resampled nearest-neighbour walk on a 4x4x4 SC site lattice:
    SiteDiffusionAnalysis recovers the analytic D = p * a^2."""
    n, a = 4, 3.0
    L = n * a
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
    centers = (grid + 0.5) * a
    sn = _network(centers, cell_size=L)
    S = len(centers)
    p = 0.05                      # per-frame hop prob to EACH neighbor
    P = np.zeros((S, S))
    idx = {tuple(g): i for i, g in enumerate(grid)}
    for i, g in enumerate(grid):
        for d in range(3):
            for sgn in (-1, 1):
                h = g.copy()
                h[d] = (h[d] + sgn) % n
                P[i, idx[tuple(h)]] += p
        P[i, i] = 1.0 - 6 * p
    st = KineticMonteCarlo(n_walkers=128, n_frames=4000, seed=3,
                           start="stationary", transition_matrix=P,
                           verbose=False).run(sn)
    # short-lag fit window: many independent time origins -> the
    # statistical error on D is ~1-2% (the default long-lag window
    # scatters ~8% at this sample size)
    da = SiteDiffusionAnalysis(timestep=1.0, fit_range=(0.02, 0.2),
                               verbose=False).run(st)
    D_theory = p * a ** 2
    assert da.D_site_ == pytest.approx(D_theory, rel=0.05)


def test_kmc_determinism_and_validation():
    sn = _network([[2.0, 2, 2], [6.0, 6, 6]])
    P = np.array([[0.9, 0.1], [0.2, 0.8]])
    kw = dict(n_walkers=8, n_frames=50, seed=5, transition_matrix=P,
              start="stationary", verbose=False)
    t1 = KineticMonteCarlo(**kw).run(sn).traj
    t2 = KineticMonteCarlo(**kw).run(sn).traj
    np.testing.assert_array_equal(t1, t2)
    with pytest.raises(ValueError, match="row-stochastic"):
        KineticMonteCarlo(transition_matrix=np.eye(2) * 0.5,
                          verbose=False).run(sn)
    with pytest.raises(ValueError, match="n_walkers"):
        KineticMonteCarlo(n_walkers=0)
    with pytest.raises(ValueError, match="must be \\(n_walkers"):
        KineticMonteCarlo(n_walkers=4, start=np.array([0, 1]))
    with pytest.raises(ValueError, match="out of range"):
        KineticMonteCarlo(n_walkers=2, transition_matrix=P,
                          start=np.array([0, 5]), verbose=False).run(sn)
    with pytest.raises(ValueError, match="no sites"):
        KineticMonteCarlo(verbose=False).run(
            SiteNetwork(sn.structure, sn.static_mask, sn.mobile_mask))


def test_kmc_pseudo_network_structure():
    """The pseudo-network carries the host lattice, centers, types, and
    places walkers at their initial site centers."""
    sn = _network([[2.0, 2, 2], [6.0, 6, 6]])
    sn.site_types = np.array([0, 1], np.int32)
    P = np.array([[0.9, 0.1], [0.2, 0.8]])
    st = KineticMonteCarlo(n_walkers=5, n_frames=10, seed=2,
                           start=np.array([1, 0, 1, 1, 0]),
                           transition_matrix=P, verbose=False).run(sn)
    sn2 = st.site_network
    assert sn2.n_mobile == 5 and sn2.n_static == sn.n_static
    np.testing.assert_allclose(sn2.centers, sn.centers)
    np.testing.assert_array_equal(sn2.site_types, [0, 1])
    walkers = sn2.structure.positions[sn2.mobile_mask]
    np.testing.assert_allclose(walkers,
                               sn.centers[np.array([1, 0, 1, 1, 0])])
    # first frame is the initial state
    np.testing.assert_array_equal(st.traj[0], [1, 0, 1, 1, 0])


def test_correlation_factor_random_walk_is_one():
    """An uncorrelated lattice walk has correlation factor f ~= 1: the
    site-MSD diffusivity equals the jump-rate estimate."""
    n, a = 4, 3.0
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
    sn = _network((grid + 0.5) * a, cell_size=n * a)
    S, p = len(grid), 0.05
    P = np.zeros((S, S))
    idx = {tuple(g): i for i, g in enumerate(grid)}
    for i, g in enumerate(grid):
        for d in range(3):
            for sgn in (-1, 1):
                h = g.copy()
                h[d] = (h[d] + sgn) % n
                P[i, idx[tuple(h)]] += p
        P[i, i] = 1.0 - 6 * p
    st = KineticMonteCarlo(n_walkers=128, n_frames=4000, seed=3,
                           start="stationary", transition_matrix=P,
                           verbose=False).run(sn)
    JumpAnalysis(verbose=False).run(st)
    da = SiteDiffusionAnalysis(timestep=1.0, fit_range=(0.02, 0.2),
                               verbose=False).run(st)
    assert np.isfinite(da.D_jump_)
    assert da.f_ == pytest.approx(1.0, abs=0.06)


def test_correlation_factor_flicker_is_zero():
    """Pure two-site flicker: jumps happen constantly but transport is
    bounded, so D_site ~= 0 and f ~= 0 while D_jump > 0."""
    sn = _network([[2.0, 2, 2], [5.0, 2, 2]])
    F = 2000
    labels = (np.arange(F) % 2).astype(np.int32)[:, None]
    st = SiteTrajectory(sn, labels)
    JumpAnalysis(verbose=False).run(st)
    da = SiteDiffusionAnalysis(timestep=1.0, verbose=False).run(st)
    assert da.D_jump_ > 0.1
    assert abs(da.f_) < 1e-3


def test_correlation_factor_nan_without_jump_attrs():
    sn = _network([[2.0, 2, 2], [6.0, 6, 6]])
    labels = np.zeros((50, 1), np.int32)
    da = SiteDiffusionAnalysis(verbose=False).run(SiteTrajectory(sn, labels))
    assert np.isnan(da.D_jump_) and np.isnan(da.f_)


def test_stationary_reducible_chain_ignores_unreachable_absorbers():
    """transition_matrix_from_network makes never-visited sites
    absorbing; the stationary solver must put NO mass on them (review
    finding r4: an eigenvector pick could return all-mass-on-one)."""
    sn = _network([[1.0, 1, 1], [3.0, 3, 3], [5.0, 5, 5],
                   [7.0, 7, 7], [9.0, 9, 9]])
    n_ij = np.zeros((5, 5))
    n_ij[0, 1] = n_ij[1, 2] = n_ij[2, 0] = 10.0
    t_i = np.array([100.0, 50.0, 200.0, 0.0, 0.0])   # sites 3,4 unvisited
    sn.add_edge_attribute("n_ij", n_ij)
    sn.add_site_attribute("total_corrected_residences", t_i)
    kmc = KineticMonteCarlo(n_walkers=16, n_frames=30, seed=4,
                            start="stationary", verbose=False)
    st = kmc.run(sn)
    assert kmc.stationary_[3] == 0.0 and kmc.stationary_[4] == 0.0
    assert kmc.stationary_.sum() == pytest.approx(1.0)
    # no walker ever lands on an unvisited site
    assert not np.isin(st.traj, [3, 4]).any()
    # stationarity: pi P = pi on the recurrent class
    P = kmc.transition_matrix_
    np.testing.assert_allclose(kmc.stationary_ @ P, kmc.stationary_,
                               atol=1e-10)


def test_stationary_periodic_chain_converges():
    """A deterministic 2-cycle has no eigengap — the lazy iteration must
    still converge to the uniform stationary distribution."""
    P = np.array([[0.0, 1.0], [1.0, 0.0]])
    pi = KineticMonteCarlo._stationary(P)
    np.testing.assert_allclose(pi, [0.5, 0.5], atol=1e-10)


def test_mfpt_two_state_analytic():
    """2-state chain: M[0,1] = 1/p01, M[1,0] = 1/p10, exactly."""
    from sitator_tpu.dynamics.kmc import mean_first_passage_times
    P = np.array([[0.9, 0.1], [0.3, 0.7]])
    M = mean_first_passage_times(P)
    np.testing.assert_allclose(M, [[0.0, 10.0], [1.0 / 0.3, 0.0]],
                               rtol=1e-9)
    with pytest.raises(ValueError, match="row-stochastic"):
        mean_first_passage_times(np.eye(2) * 0.5)


def test_mfpt_matches_kmc_sampling():
    """The fundamental-matrix MFPT agrees with empirical first-passage
    times sampled from the chain itself."""
    from sitator_tpu.dynamics.kmc import mean_first_passage_times
    sn = _network([[2.0, 2, 2], [6.0, 6, 6], [10.0, 10, 10]])
    P = np.array([[0.90, 0.08, 0.02],
                  [0.05, 0.90, 0.05],
                  [0.03, 0.07, 0.90]])
    M = mean_first_passage_times(P)
    st = KineticMonteCarlo(n_walkers=256, n_frames=4000, seed=9,
                           start=np.zeros(256, np.int64),
                           transition_matrix=P, verbose=False).run(sn)
    # empirical: first frame each walker reaches site 2, starting at 0
    hit = (st.traj == 2).argmax(axis=0).astype(np.float64)
    reached = (st.traj == 2).any(axis=0)
    assert reached.all()
    emp = hit[reached].mean()
    assert emp == pytest.approx(M[0, 2], rel=0.08)


def test_mfpt_unvisited_sites_are_inf():
    from sitator_tpu.dynamics.kmc import mean_first_passage_times
    P = np.array([[0.9, 0.1, 0.0],
                  [0.2, 0.8, 0.0],
                  [0.0, 0.0, 1.0]])       # site 2 unreachable absorbing
    M = mean_first_passage_times(P)
    assert np.isinf(M[0, 2]) and np.isinf(M[2, 0])
    assert M[0, 1] == pytest.approx(10.0)


def test_mfpt_transient_state_is_inf():
    """A visited-then-abandoned (transient) state has no stationary
    mass; passage times INTO it must be inf, not huge finite garbage
    from the power iteration's convergence floor (review finding r4)."""
    from sitator_tpu.dynamics import mean_first_passage_times
    P = np.array([[0.5, 0.5], [0.0, 1.0]])   # state 0 transient
    M = mean_first_passage_times(P)
    assert np.isinf(M[1, 0])
    assert M[1, 1] == 0.0


def test_stationary_identity_and_unconverged_warning(caplog):
    """All-isolated chains (identity P) fall back to uniform; a chain
    with relaxation far beyond the iteration budget warns instead of
    silently returning a biased distribution (coverage audit)."""
    import logging
    pi = KineticMonteCarlo._stationary(np.eye(3))
    np.testing.assert_allclose(pi, 1.0 / 3.0)
    # coupling 1e-9: |lambda_2| so close to 1 the lazy iteration cannot
    # move the uniform start to (2/3, 1/3) in 20000 steps
    P_slow = np.array([[1 - 1e-9, 1e-9], [2e-9, 1 - 2e-9]])
    with caplog.at_level(logging.WARNING,
                         logger="sitator_tpu.dynamics.kmc"):
        KineticMonteCarlo._stationary(P_slow)
    assert any("unconverged" in r.message for r in caplog.records)


def test_mfpt_no_live_states_all_inf(monkeypatch):
    """The documented contract when no state carries stationary mass:
    an all-inf matrix, not a divide-by-tiny blow-up."""
    from sitator_tpu.dynamics.kmc import mean_first_passage_times
    monkeypatch.setattr(KineticMonteCarlo, "_stationary",
                        staticmethod(lambda P: np.zeros(len(P))))
    M = mean_first_passage_times(np.array([[0.9, 0.1], [0.1, 0.9]]))
    assert np.isinf(M).all()


def test_kmc_zero_occupancy_start_and_verbose():
    """start='occupancies' with an all-zero occupancy vector falls back
    to uniform starts; the verbose summary line executes (coverage
    audit)."""
    sn = _network([[2.0, 2, 2], [6.0, 6, 6]])
    P = np.array([[0.9, 0.1], [0.2, 0.8]])
    sn.add_site_attribute("occupancies", np.zeros(2))
    st = KineticMonteCarlo(n_walkers=6, n_frames=40, seed=3,
                           transition_matrix=P, start="occupancies",
                           verbose=True).run(sn)
    assert st.traj.shape == (40, 6)
    assert set(np.unique(st.traj)) <= {0, 1}
