"""Bayesian chain uncertainty (dynamics/uncertainty.py): posterior
coverage of the true timescale/occupancy on simulated DTMC data,
analytic Beta edge intervals against the sampled posterior, MFPT
inf handling, custom observables, and the guards."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import (ChainUncertaintyAnalysis, JumpAnalysis,
                                  edge_probability_intervals)
from sitator_tpu.dynamics.uncertainty import (posterior_count_matrix,
                                              sample_transition_matrices)


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
    rng = np.random.default_rng(seed)
    n_mobile = labels.shape[1]
    pos = rng.uniform(0, a, size=(4 + n_mobile, 3))
    s = Structure(pos, np.array([16] * 4 + [3] * n_mobile),
                  np.eye(3) * a)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, a, size=(n_sites, 3))
    return SiteTrajectory(sn, labels)


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
    from sitator_tpu.core.structure import Structure as _S
    rng = np.random.default_rng(0)
    s = _S(rng.uniform(0, 5, (5, 3)), np.array([16] * 4 + [3]),
           np.eye(3) * 5)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, 5, (2, 3))
    with pytest.raises(ValueError, match="bare SiteNetwork"):
        ChainUncertaintyAnalysis().run(sn)
