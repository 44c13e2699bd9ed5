"""Markovianity validation (dynamics/markov.py): exact DTMC labels must
pass both tests with timescales matching the known spectrum; lumped
hidden states and deterministic residences must fail them; unknown
policies and the guards."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics.markov import (MarkovianityAnalysis,
                                         lagged_count_matrix)


def _simulate(P, n_steps, rng, start=0):
    cdf = np.cumsum(P, axis=1)
    out = np.empty(n_steps, dtype=np.int32)
    s = start
    u = rng.uniform(size=n_steps)
    for t in range(n_steps):
        out[t] = s
        s = int(np.searchsorted(cdf[s], u[t]))
    return out


def _st(labels, n_sites, a=20.0, seed=0):
    labels = np.asarray(labels, dtype=np.int32)
    n_mobile = labels.shape[1]
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, a, size=(4 + n_mobile, 3))
    s = Structure(pos, np.array([16] * 4 + [3] * n_mobile), np.eye(3) * a)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, a, size=(n_sites, 3))
    return SiteTrajectory(sn, labels)


def _two_basin_P(eps=0.02, mix=0.3):
    """4 states, two 2-state basins: fast intra-basin mixing, slow
    inter-basin exchange rate eps."""
    P = np.array([[0.0, mix, eps, 0.0],
                  [mix, 0.0, 0.0, eps],
                  [eps, 0.0, 0.0, mix],
                  [0.0, eps, mix, 0.0]])
    np.fill_diagonal(P, 1.0 - P.sum(axis=1))
    return P


def test_markov_chain_passes_with_correct_timescales():
    rng = np.random.default_rng(0)
    P = _two_basin_P()
    labels = np.stack([_simulate(P, 120000, rng, start=i % 4)
                       for i in range(2)], axis=1)
    ma = MarkovianityAnalysis(lags=(1, 2, 4, 8, 16), verbose=False)
    ma.run(_st(labels, 4))
    assert ma.markovian_
    assert ma.ck_error_ < 0.03
    # slowest implied timescale at every lag matches the exact spectrum
    lam = np.sort(np.linalg.eigvals(P).real)[::-1]
    t_exact = -1.0 / np.log(lam[1])
    np.testing.assert_allclose(ma.timescales_[:, 0], t_exact, rtol=0.15)
    assert abs(ma.timescale_drift_[0]) < 0.15
    assert ma.recommended_lag_ == 1
    # the CK sets are the two basins
    assert ma.sets_[0] == ma.sets_[1] != ma.sets_[2]
    assert ma.sets_[2] == ma.sets_[3]


def test_lumped_hidden_states_fail():
    """Lump two states with *different* exit rates and slow internal
    mixing (linear chain 0<->1<->2, lump {0,1}): the observed 2-'site'
    chain hides a state, implied timescales climb with lag and CK fails
    at the base lag.  (Lumping symmetric-exit states is near-lumpable
    and correctly PASSES — that is what metastable coarse-graining
    relies on.)"""
    P = np.array([[0.98, 0.02, 0.0],
                  [0.02, 0.68, 0.3],
                  [0.0, 0.05, 0.95]])
    rng = np.random.default_rng(1)
    micro = _simulate(P, 400000, rng)
    lumped = np.where(micro <= 1, 0, 1)
    ma = MarkovianityAnalysis(lags=(1, 2, 4, 8, 16, 32, 64),
                              verbose=False)
    ma.run(_st(lumped[:, None], 2))
    assert not ma.markovian_
    # systematically rising slowest timescale is the lumping signature
    assert ma.timescale_drift_[0] > 1.0
    assert ma.ck_error_ > 0.1
    assert ma.recommended_lag_ is None or ma.recommended_lag_ > 1


def test_lumpable_symmetric_exits_pass():
    """Weak lumpability control: merging a fast-mixing basin whose two
    states exit at the SAME rate leaves the chain effectively Markov —
    the validator must not cry wolf on a good coarse-graining."""
    rng = np.random.default_rng(1)
    P = _two_basin_P(eps=0.005, mix=0.08)
    micro = _simulate(P, 400000, rng)
    lumped = np.where(micro <= 1, 0, micro - 1)   # {0,1}->0, 2->1, 3->2
    ma = MarkovianityAnalysis(lags=(1, 2, 4, 8, 16, 32),
                              verbose=False)
    ma.run(_st(lumped[:, None], 3))
    assert ma.markovian_
    assert abs(ma.timescale_drift_[0]) < 0.1


def test_deterministic_residence_fails_ck():
    """Exactly-10-frame residences: geometric-residence (Markov) it is
    not — at lags beyond the residence the mismatch is gross."""
    labels = np.tile(np.repeat([0, 1], 10), 2000)[:, None]
    ma = MarkovianityAnalysis(lags=(1, 2, 4, 8, 16), n_ck_sets=2,
                              verbose=False)
    ma.run(_st(labels, 2))
    assert not ma.markovian_
    assert ma.ck_error_ > 0.2


def test_unknown_policies():
    rng = np.random.default_rng(2)
    P = _two_basin_P()
    labels = _simulate(P, 60000, rng)[:, None].astype(np.int32)
    labels[::37] = -1
    for policy in ("persist", "break"):
        ma = MarkovianityAnalysis(lags=(1, 2, 4, 8),
                                  unknown_policy=policy, verbose=False)
        ma.run(_st(labels, 4))
        assert ma.markovian_, policy
    # 'break' discards windows that span the unknown frames
    C_break = lagged_count_matrix(labels, 8, 4, raw_labels=labels)
    filled = labels.copy()
    C_persist = lagged_count_matrix(np.where(filled < 0, 0, filled), 8, 4)
    assert C_break.sum() < C_persist.sum()


def test_count_matrix_exact():
    labels = np.array([[0], [1], [1], [-1], [2], [0]])
    C = lagged_count_matrix(labels, 1, 3)
    assert C[0, 1] == 1 and C[1, 1] == 1 and C[2, 0] == 1
    assert C.sum() == 3           # pairs touching -1 dropped
    Cb = lagged_count_matrix(labels, 2, 3, raw_labels=labels)
    # (0->1), (1->-1 skip), (1->2 spans -1: dropped), (-1 skip), (2,0)
    assert Cb.sum() == 1 and Cb[0, 1] == 1


def test_validation_and_degenerate():
    with pytest.raises(ValueError, match="lags"):
        MarkovianityAnalysis(lags=(0, 1))
    with pytest.raises(ValueError, match="n_ck_sets"):
        MarkovianityAnalysis(n_ck_sets=1)
    with pytest.raises(ValueError, match="unknown_policy"):
        MarkovianityAnalysis(unknown_policy="zap")
    with pytest.raises(ValueError, match="lag"):
        lagged_count_matrix(np.zeros((5, 1), dtype=int), 5, 1)
    # single-site chain: degenerate but must not crash
    ma = MarkovianityAnalysis(lags=(1, 2), verbose=False)
    ma.run(_st(np.zeros((100, 1), dtype=np.int32), 1))
    assert ma.timescales_.shape[1] == 0
    assert ma.markovian_           # vacuously: nothing to contradict


def test_short_trajectory_ck_noise_is_not_a_violation():
    """2000 frames of a genuinely Markov chain with long lags: the raw
    long-lag CK mismatch can be large, but it is within its
    window-deflated binomial error — the verdict must not condemn a
    sound site model on sampling noise."""
    rng = np.random.default_rng(5)
    P = _two_basin_P(eps=0.01)
    labels = _simulate(P, 2000, rng)[:, None]
    ma = MarkovianityAnalysis(lags=(1, 2, 4, 8, 16, 32, 64, 128, 256),
                              verbose=False)
    ma.run(_st(labels, 4))
    assert ma.ck_stderr_.shape == ma.ck_measured_.shape
    # every material mismatch must be explained by its stderr here
    diff = np.abs(ma.ck_measured_ - ma.ck_predicted_)
    assert not ma.ck_violation_
    assert np.all((diff <= 0.05) | (diff <= 3 * ma.ck_stderr_)
                  | ~np.isfinite(diff))


def test_default_lag_grid_and_auto_sets():
    rng = np.random.default_rng(3)
    P = _two_basin_P()
    labels = _simulate(P, 40000, rng)[:, None]
    ma = MarkovianityAnalysis(verbose=False)
    ma.run(_st(labels, 4))
    assert ma.lags_[0] == 1 and len(ma.lags_) >= 5
    assert np.all(np.diff(ma.lags_) > 0)
    assert len(np.unique(ma.sets_[ma.sets_ >= 0])) >= 2


def test_msm_plots_draw(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sitator_tpu.visualization import (plot_ck_test,
                                           plot_implied_timescales)
    rng = np.random.default_rng(4)
    P = _two_basin_P()
    labels = _simulate(P, 50000, rng)[:, None]
    ma = MarkovianityAnalysis(lags=(1, 2, 4, 8, 16),
                              verbose=False).run(_st(labels, 4))
    fig = plot_implied_timescales(ma)
    fig.savefig(tmp_path / "its.png")
    assert (tmp_path / "its.png").stat().st_size > 1000
    fig2 = plot_ck_test(ma)
    fig2.savefig(tmp_path / "ck.png")
    assert (tmp_path / "ck.png").stat().st_size > 1000
    plt.close("all")
    # degenerate guard
    ma1 = MarkovianityAnalysis(lags=(1, 2), verbose=False)
    ma1.run(_st(np.zeros((100, 1), dtype=np.int32), 1))
    with pytest.raises(ValueError, match="live"):
        plot_implied_timescales(ma1)
    with pytest.raises(ValueError, match="Chapman"):
        plot_ck_test(ma1)
