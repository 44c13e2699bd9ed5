"""Residence-time distributions: run-length encoding, censoring, the
geometric (memoryless) fit, and the under-resolved-site detector."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.core.sitetraj import SiteTrajectory
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import KineticMonteCarlo, ResidenceTimeAnalysis
from sitator_tpu.dynamics.residence import (_ks_vs_geometric,
                                            residence_segments)


def _st(labels, n_sites):
    labels = np.asarray(labels)
    M = labels.shape[1]
    structure = Structure(np.zeros((M + 1, 3)), [16] + [3] * M,
                          np.eye(3) * 20.0)
    mask = np.zeros(M + 1, bool)
    mask[0] = True
    sn = SiteNetwork(structure, mask, ~mask)
    sn.centers = np.linspace(1, 9, n_sites)[:, None] * np.ones(3)
    return SiteTrajectory(sn, labels)


def test_residence_segments_basic():
    # one ion: 0 0 0 | 1 1 | 0 0 0 0 | 2 — first (0x3) and last (2x1)
    # runs are censored
    labels = np.array([[0], [0], [0], [1], [1], [0], [0], [0], [0], [2]])
    segs = residence_segments(labels)
    assert [list(v) for v in segs] == [[4], [2], []]


def test_residence_segments_unknown_policies():
    labels = np.array([[0], [1], [-1], [1], [2], [0]])
    # persist: -1 forward-fills to 1 -> runs 0|111|2|0; middle runs
    # [1]x3 and [2]x1 are completed
    segs = residence_segments(labels, unknown_policy="persist")
    assert [list(v) for v in segs] == [[], [3], [1]]
    # break: the -1 ends the 1-run (censored against the gap: the run
    # before the gap has unknown continuation, the run after has an
    # unknown start) — only [2] survives as a completed interior run
    segs = residence_segments(labels, unknown_policy="break")
    assert [list(v) for v in segs] == [[], [], [1]]
    with pytest.raises(ValueError, match="unknown_policy"):
        residence_segments(labels, unknown_policy="bogus")


def test_ks_statistic_exact_fit_is_small():
    rng = np.random.default_rng(0)
    x = rng.geometric(0.2, size=5000)
    assert _ks_vs_geometric(x, 1.0 / x.mean()) < 0.02


def test_memoryless_chain_not_flagged():
    """A resampled Markov chain has geometric residences everywhere —
    nothing should reject the memoryless model."""
    sn = _st(np.zeros((2, 2), np.int32), 3).site_network
    P = np.array([[0.92, 0.05, 0.03],
                  [0.04, 0.9, 0.06],
                  [0.05, 0.05, 0.9]])
    st = KineticMonteCarlo(n_walkers=16, n_frames=4000, seed=2,
                           start="stationary", transition_matrix=P,
                           verbose=False).run(sn)
    ra = ResidenceTimeAnalysis(alpha=0.005, verbose=False).run(st)
    assert ra.non_exponential_sites_.size == 0
    # geometric mean residence = 1/(1-P_ii)
    np.testing.assert_allclose(ra.mean_, 1.0 / (1.0 - np.diag(P)),
                               rtol=0.15)
    # attributes written
    sn2 = st.site_network
    assert "residence_mean" in sn2.site_attributes
    assert np.isfinite(sn2.residence_ks_pvalue).all()


def test_bimodal_residences_flagged():
    """A site whose residences alternate 3 and 40 frames (two hidden
    basins) must reject the memoryless model; a genuinely geometric
    site in the same trajectory must not."""
    rng = np.random.default_rng(7)
    runs = []
    for k in range(120):
        runs += [(0, 3 if k % 2 == 0 else 40)]
        runs += [(1, int(rng.geometric(0.1)))]
    labels = np.concatenate([np.full(n, s, np.int32)
                             for s, n in runs])[:, None]
    st = _st(labels, 2)
    ra = ResidenceTimeAnalysis(alpha=0.01, verbose=False).run(st)
    assert 0 in ra.non_exponential_sites_
    assert 1 not in ra.non_exponential_sites_
    # the bimodal site's CV is far from the geometric sqrt(1-p)
    p0 = 1.0 / ra.mean_[0]
    assert abs(ra.cv_[0] - np.sqrt(1 - p0)) > 0.1


def test_min_samples_guard():
    labels = np.array([[0], [1], [0], [1], [0]])
    ra = ResidenceTimeAnalysis(min_samples=20, verbose=False).run(
        _st(labels, 2))
    assert ra.non_exponential_sites_.size == 0
    assert np.isnan(ra.p_value_).all()
    with pytest.raises(ValueError, match="alpha"):
        ResidenceTimeAnalysis(alpha=2.0)


def test_ks_sparse_support_matches_dense_scan():
    """The O(n log n) sup over sample support points equals the dense
    O(max) integer scan (review finding r4 replaced the latter)."""
    rng = np.random.default_rng(3)
    for p_true in (0.5, 0.05):
        x = rng.geometric(p_true, size=200)
        x[0] = 400                      # a far outlier widens the gaps
        for p_fit in (p_true, 0.3 * p_true):
            ks = np.arange(1, int(x.max()) + 1)
            f_emp = np.searchsorted(np.sort(x), ks, side="right") / len(x)
            dense = np.abs(f_emp - (1 - (1 - p_fit) ** ks)).max()
            assert _ks_vs_geometric(x, p_fit) == pytest.approx(dense,
                                                               abs=1e-12)


def test_residence_survival_plot_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from sitator_tpu.visualization import plot_residence_survival
    sn = _st(np.zeros((2, 2), np.int32), 2).site_network
    P = np.array([[0.9, 0.1], [0.15, 0.85]])
    st = KineticMonteCarlo(n_walkers=8, n_frames=3000, seed=1,
                           start="stationary", transition_matrix=P,
                           verbose=False).run(sn)
    ra = ResidenceTimeAnalysis(verbose=False).run(st)
    fig = plot_residence_survival(ra)
    fig.savefig(tmp_path / "surv.png")
    assert (tmp_path / "surv.png").stat().st_size > 1000
    import matplotlib.pyplot as plt
    plt.close("all")
    with pytest.raises(ValueError, match="no tested sites"):
        plot_residence_survival(ra, sites=[])


def test_labels_shape_raise_rerun_and_verbose():
    """site_residences rejects non-2D labels; re-running the engine
    replaces its attributes; verbose logging executes (coverage
    audit)."""
    with pytest.raises(ValueError, match=r"\(n_frames, n_mobile\)"):
        residence_segments(np.zeros(10, dtype=int))
    rng = np.random.default_rng(4)
    labels = (rng.random((3000, 2)) < 0.5).astype(int)  # iid -> geometric
    st = _st(labels, 2)
    ra = ResidenceTimeAnalysis(verbose=True).run(st)
    sn = st.site_network
    m1 = sn.residence_mean.copy()
    ResidenceTimeAnalysis(verbose=True).run(st)
    np.testing.assert_allclose(sn.residence_mean, m1, equal_nan=True)
