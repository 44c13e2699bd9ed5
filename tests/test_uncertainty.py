"""Bayesian chain uncertainty (dynamics/uncertainty.py): posterior
coverage of the true timescale/occupancy on simulated DTMC data,
analytic Beta edge intervals against the sampled posterior, MFPT
inf handling, custom observables, and the guards."""
import numpy as np
import pytest

from sitator_tpu.dynamics import (ChainUncertaintyAnalysis, JumpAnalysis,
                                  edge_probability_intervals)
from sitator_tpu.dynamics.uncertainty import (posterior_count_matrix,
                                              sample_transition_matrices)
# shared DTMC-simulation fixtures (single source of truth)
from tests.test_markov import _simulate, _st


P_TRUE = np.array([[0.90, 0.08, 0.02],
                   [0.05, 0.90, 0.05],
                   [0.02, 0.08, 0.90]])


def test_posterior_covers_truth():
    """Simulate a known chain; the true slowest timescale and true
    stationary distribution must lie inside the 95% credible
    intervals (single seed — calibrated, not flaky)."""
    rng = np.random.default_rng(0)
    labels = _simulate(P_TRUE, 30000, rng)[:, None]
    st = _st(labels, 3)
    ua = ChainUncertaintyAnalysis(n_samples=400, seed=1,
                                  verbose=False).run(st)
    lam = np.sort(np.abs(np.linalg.eigvals(P_TRUE)))[::-1]
    t_true = -1.0 / np.log(lam[1])
    lo, hi = ua.ci_["timescales"]
    assert lo[0] < t_true < hi[0]
    # interval is informative, not vacuous
    assert (hi[0] - lo[0]) < t_true
    pi_true = np.linalg.matrix_power(P_TRUE, 4000)[0]
    lo_pi, hi_pi = ua.ci_["stationary"]
    assert np.all(lo_pi <= pi_true + 0.02)
    assert np.all(hi_pi >= pi_true - 0.02)
    assert np.all((pi_true > lo_pi) & (pi_true < hi_pi))
    # mean close to truth
    np.testing.assert_allclose(ua.mean_["stationary"], pi_true,
                               atol=0.03)


def test_uncertainty_shrinks_with_data():
    rng = np.random.default_rng(1)
    long = _simulate(P_TRUE, 60000, rng)[:, None]
    short = long[:3000]
    w = {}
    for name, lab in [("short", short), ("long", long)]:
        ua = ChainUncertaintyAnalysis(observables=("timescales",),
                                      n_samples=300, seed=2,
                                      verbose=False).run(_st(lab, 3))
        lo, hi = ua.ci_["timescales"]
        w[name] = hi[0] - lo[0]
    assert w["long"] < 0.5 * w["short"]


def test_edge_intervals_match_sampled_posterior():
    """The analytic Beta marginals must agree with the Monte-Carlo
    Dirichlet row samples entry-wise."""
    rng = np.random.default_rng(2)
    labels = _simulate(P_TRUE, 20000, rng)[:, None]
    st = _st(labels, 3)
    JumpAnalysis(verbose=False).run(st)
    sn = st.site_network
    lo, hi = edge_probability_intervals(st, level=0.9)
    assert sn.has_attribute("p_ij_lo") and sn.has_attribute("p_ij_hi")
    C = posterior_count_matrix(sn)
    Ps = sample_transition_matrices(C, 8000,
                                    np.random.default_rng(3))
    mc_lo = np.quantile(Ps, 0.05, axis=0)
    mc_hi = np.quantile(Ps, 0.95, axis=0)
    np.testing.assert_allclose(lo, mc_lo, atol=0.004)
    np.testing.assert_allclose(hi, mc_hi, atol=0.004)
    assert np.all(lo <= hi)


def test_mfpt_and_custom_observable():
    rng = np.random.default_rng(4)
    labels = _simulate(P_TRUE, 20000, rng)[:, None]
    st = _st(labels, 3)

    def escape_prob(P):
        return 1.0 - np.diag(P)

    ua = ChainUncertaintyAnalysis(observables=("mfpt", escape_prob),
                                  n_samples=100, seed=5,
                                  verbose=False).run(st)
    m = ua.mean_["mfpt"]
    assert m.shape == (3, 3)
    assert np.allclose(np.diag(m), 0.0)
    assert np.all(m[~np.eye(3, dtype=bool)] > 1.0)
    ep = ua.mean_["escape_prob"]
    np.testing.assert_allclose(ep, 1.0 - np.diag(P_TRUE), atol=0.05)


def test_never_visited_site_is_inf_mfpt_nan_edges():
    rng = np.random.default_rng(6)
    labels = _simulate(P_TRUE, 20000, rng)[:, None]
    st = _st(labels, 4)                      # site 3 never visited
    ua = ChainUncertaintyAnalysis(observables=("mfpt",),
                                  n_samples=50, seed=7,
                                  verbose=False).run(st)
    m = ua.mean_["mfpt"]
    assert np.isinf(m[0, 3]) and np.isinf(m[3, 0])
    lo, hi = edge_probability_intervals(st)
    assert np.all(np.isnan(lo[3])) and np.all(np.isnan(hi[3]))
    assert np.all(np.isnan(lo[:, 3]))           # structurally no mass
    assert np.isfinite(lo[:3, :3]).all()


def test_dead_site_timescales_and_stationary_ignore_dead_block():
    """A never-visited site is sampled as an isolated absorbing state;
    its degenerate unit eigenvalue must NOT surface as a bogus
    ~1e15-frame slowest timescale, and the stationary draw must put
    zero mass on it (regression: observables now restrict to the live
    block)."""
    rng = np.random.default_rng(11)
    labels = _simulate(P_TRUE, 20000, rng)[:, None]
    st = _st(labels, 4)                      # site 3 never visited
    ua = ChainUncertaintyAnalysis(
        observables=("timescales", "stationary"),
        n_samples=60, seed=12, verbose=False).run(st)
    t = ua.mean_["timescales"]
    assert t[0] < 1e4                        # real slow mode, not 1e15
    # and it matches the 3-site-only analysis on the same data
    st3 = _st(labels, 3)
    ua3 = ChainUncertaintyAnalysis(observables=("timescales",),
                                   n_samples=60, seed=12,
                                   verbose=False).run(st3)
    np.testing.assert_allclose(t[0], ua3.mean_["timescales"][0],
                               rtol=0.05)
    pi = ua.mean_["stationary"]
    assert pi[3] == 0.0
    np.testing.assert_allclose(pi.sum(), 1.0, atol=1e-10)


def test_stationary_exact_on_slow_chain():
    """2-state chain with a ~3.3e4-frame relaxation: bounded power
    iteration left every draw unconverged (biased toward uniform with
    a confidently-wrong CI); the exact solve must recover the true
    stationary distribution (regression)."""
    from sitator_tpu.dynamics.uncertainty import _obs_stationary
    p, q = 1e-5, 5e-5
    P = np.array([[1 - p, p], [q, 1 - q]])
    pi = _obs_stationary(P)
    np.testing.assert_allclose(pi, [q / (p + q), p / (p + q)],
                               atol=1e-12)


def test_edge_intervals_consistent_with_sampler_under_dead_sites():
    """With never-visited sites the sampled Dirichlet support excludes
    the dead columns; the analytic Beta complement must count only the
    live columns' prior mass (regression: (S-1)*prior shifted lo/hi
    on weakly-sampled edges)."""
    rng = np.random.default_rng(13)
    labels = _simulate(P_TRUE, 4000, rng)[:, None]
    st = _st(labels, 5)                      # sites 3, 4 never visited
    JumpAnalysis(verbose=False).run(st)
    sn = st.site_network
    lo, hi = edge_probability_intervals(st, level=0.9)
    C = posterior_count_matrix(sn)
    Ps = sample_transition_matrices(C, 8000, np.random.default_rng(14))
    mc_lo = np.quantile(Ps[:, :3, :3], 0.05, axis=0)
    mc_hi = np.quantile(Ps[:, :3, :3], 0.95, axis=0)
    np.testing.assert_allclose(lo[:3, :3], mc_lo, atol=0.005)
    np.testing.assert_allclose(hi[:3, :3], mc_hi, atol=0.005)


def test_validation():
    with pytest.raises(ValueError, match="observable"):
        ChainUncertaintyAnalysis(observables=())
    with pytest.raises(ValueError, match="n_samples"):
        ChainUncertaintyAnalysis(n_samples=1)
    with pytest.raises(ValueError, match="level"):
        ChainUncertaintyAnalysis(level=1.5)
    with pytest.raises(ValueError, match="unknown observable"):
        ChainUncertaintyAnalysis(observables=("bogus",)).run(
            _st(np.zeros((50, 1), np.int32), 2))
    from sitator_tpu import SiteNetwork
    from sitator_tpu.core.structure import Structure as _S
    rng = np.random.default_rng(0)
    s = _S(rng.uniform(0, 5, (5, 3)), np.array([16] * 4 + [3]),
           np.eye(3) * 5)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, 5, (2, 3))
    with pytest.raises(ValueError, match="bare SiteNetwork"):
        ChainUncertaintyAnalysis().run(sn)


def test_zero_prior_reducible_draws_no_bogus_timescales():
    """prior=0 makes alpha=0 entries draw exactly 0, so a sampled live
    block can be REDUCIBLE — extra unit eigenvalues are degenerate
    modes, not ~1e15-frame timescales (ADVICE r4)."""
    # two 2-state components that never exchange: every draw reducible
    labels2 = np.stack([
        _simulate(np.array([[0.8, 0.2], [0.2, 0.8]]), 3000,
                  np.random.default_rng(0)),
        2 + _simulate(np.array([[0.7, 0.3], [0.3, 0.7]]), 3000,
                      np.random.default_rng(1))], axis=1)
    st = _st(labels2, 4)
    ua = ChainUncertaintyAnalysis(observables=("timescales",),
                                  n_samples=50, prior=0.0,
                                  n_timescales=3, seed=2,
                                  verbose=False).run(st)
    ts = ua.samples_["timescales"]
    finite = ts[np.isfinite(ts)]
    # true slowest modes are ~1/ln(1/0.6) ≈ 2 and ~1/ln(1/0.4) ≈ 1.1
    # frames; a leaked unit eigenvalue would report ~1e12+
    assert finite.size and finite.max() < 1e3
    with pytest.raises(ValueError, match="prior"):
        sample_transition_matrices(np.eye(2), 2,
                                   np.random.default_rng(0), prior=-0.1)


def test_single_live_site_edge_intervals_degenerate():
    """S_live == 1: the lone self-transition is deterministically 1 —
    lo = hi = 1.0, never NaN from a zero Beta b-parameter (ADVICE r4)."""
    labels = np.zeros((200, 1), np.int32)
    st = _st(labels, 3)                       # sites 1, 2 never visited
    lo, hi = edge_probability_intervals(st, level=0.95)
    assert lo[0, 0] == 1.0 and hi[0, 0] == 1.0
    dead_mask = np.ones((3, 3), bool)
    dead_mask[0, 0] = False
    assert np.isnan(lo[dead_mask]).all() and np.isnan(hi[dead_mask]).all()


def test_missing_jump_attrs_raise():
    """posterior_count_matrix needs JumpAnalysis outputs — the error
    names what is missing (coverage audit)."""
    labels = _simulate(P_TRUE, 200, np.random.default_rng(2))[:, None]
    st = _st(labels, 3)
    sn = st.site_network
    for a in ("n_ij", "total_corrected_residences"):
        if sn.has_attribute(a):
            sn.remove_attribute(a)
    with pytest.raises(ValueError, match="JumpAnalysis first"):
        posterior_count_matrix(sn)


def test_stationary_singular_solve_falls_back(monkeypatch):
    """A LinAlgError from the exact solve routes through the power-
    iteration fallback and still returns a valid distribution."""
    from sitator_tpu.dynamics import uncertainty as unc
    P = np.array([[0.9, 0.1], [0.2, 0.8]])
    want = unc._obs_stationary(P)

    def boom(*a, **k):
        raise np.linalg.LinAlgError("forced")
    monkeypatch.setattr(np.linalg, "solve", boom)
    got = unc._obs_stationary(P)
    assert got.sum() == pytest.approx(1.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_verbose_logging_path():
    """verbose=True walks the per-observable logging branch, including
    the CI-width formatter (coverage audit)."""
    labels = _simulate(P_TRUE, 4000, np.random.default_rng(5))[:, None]
    st = _st(labels, 3)
    ua = ChainUncertaintyAnalysis(n_samples=50, seed=2,
                                  verbose=True).run(st)
    assert set(ua.mean_) == set(ua.ci_)
