"""RDF / van Hove correlation functions: device histograms against
brute-force oracles and closed-form limits."""
import numpy as np
import pytest

from sitator_tpu.ops import correlation as corr
from sitator_tpu.dynamics import RDFAnalysis, VanHoveAnalysis


def brute_rdf(traj, cell, mask_a, mask_b, r_max, n_bins, same):
    """O(F N^2) float64 oracle with explicit 27-image minimum distance."""
    inv = np.linalg.inv(cell)
    shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)]) @ cell
    counts = np.zeros(n_bins)
    A = traj[:, mask_a, :]
    B = traj[:, mask_b, :]
    for f in range(traj.shape[0]):
        for i in range(A.shape[1]):
            for j in range(B.shape[1]):
                if same and i == j:
                    continue
                d = B[f, j] - A[f, i]
                d -= np.round(d @ inv) @ cell
                r = min(np.linalg.norm(d + s) for s in shifts)
                b = int(r / (r_max / n_bins))
                if b < n_bins:
                    counts[b] += 1
    return counts


def test_rdf_matches_brute_force_triclinic():
    rng = np.random.default_rng(3)
    cell = np.array([[5.0, 0, 0], [1.2, 6.0, 0], [0.3, 0.8, 7.0]])
    traj = rng.uniform(0, 1, size=(3, 12, 3)) @ cell
    mask = np.ones(12, bool)
    r_max, n_bins = 2.4, 24
    r, g = corr.rdf(traj, cell, mask, r_max=r_max, n_bins=n_bins)
    counts = brute_rdf(traj, cell, mask, mask, r_max, n_bins, True)
    shells = 4 / 3 * np.pi * np.diff(np.linspace(0, r_max, n_bins + 1) ** 3)
    vol = abs(np.linalg.det(cell))
    norm = 3 * 12 * 11 * shells / vol
    np.testing.assert_allclose(g, counts / norm, rtol=1e-5, atol=1e-12)
    assert len(r) == n_bins and r[0] == pytest.approx(r_max / n_bins / 2)


def test_rdf_ideal_gas_is_flat():
    rng = np.random.default_rng(5)
    cell = np.eye(3) * 12.0
    traj = rng.uniform(0, 12.0, size=(40, 200, 3))
    r, g = corr.rdf(traj, cell, np.ones(200, bool), n_bins=30)
    # skip the tiny-shell first bins (few counts)
    assert abs(g[5:].mean() - 1.0) < 0.05
    assert g[5:].std() < 0.15


def test_rdf_sc_lattice_peaks():
    # one frame of a perfect SC lattice, spacing 2.0 in an 8.0 box
    grid = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"),
                    -1).reshape(-1, 3) * 2.0
    traj = grid[None]
    cell = np.eye(3) * 8.0
    r, g = corr.rdf(traj, cell, np.ones(len(grid), bool), r_max=3.5,
                    n_bins=70)
    # no pair closer than the lattice spacing; strong peak at r=2
    # (r=2.0 is exactly a bin edge — f32 rounding may land the counts in
    # either adjacent bin, so test their sum)
    assert g[r < 1.9].max() == 0.0
    near = np.abs(r - 2.0) < 0.06
    assert g[near].sum() > 10.0


def test_van_hove_distinct_lag0_equals_rdf():
    rng = np.random.default_rng(7)
    cell = np.eye(3) * 9.0
    traj = rng.uniform(0, 9.0, size=(6, 30, 3))
    mask = np.ones(30, bool)
    r1, g = corr.rdf(traj, cell, mask, n_bins=25)
    r2, G = corr.van_hove_distinct(traj, cell, mask, lags=[0], n_bins=25)
    np.testing.assert_allclose(r1, r2)
    np.testing.assert_allclose(G[0], g, rtol=1e-6, atol=1e-12)


def test_van_hove_self_gaussian_closed_form():
    """For a Gaussian walk, P(r, t) is the Maxwell distribution with
    sigma^2 = 2 D t per component; it integrates to 1."""
    rng = np.random.default_rng(9)
    F, N, D, dt = 2000, 100, 0.05, 1.0
    steps = rng.normal(scale=np.sqrt(2 * D * dt), size=(F - 1, N, 3))
    traj = np.concatenate([np.zeros((1, N, 3)), np.cumsum(steps, 0)], 0)
    cell = np.eye(3) * 200.0
    lag = 50
    r, P = corr.van_hove_self(traj, cell, np.ones(N, bool), lags=[0, lag],
                              r_max=10.0, n_bins=100, origin_stride=5)
    dr = r[1] - r[0]
    # lag 0: all mass in the first bin
    assert P[0, 0] == pytest.approx(1.0 / dr)
    assert P[0, 1:].sum() == 0.0
    # lag 50: integrates to ~1 and matches the Maxwell density
    assert P[1].sum() * dr == pytest.approx(1.0, abs=0.01)
    s2 = 2 * D * dt * lag
    maxwell = (4 * np.pi * r ** 2 * np.exp(-r ** 2 / (2 * s2))
               / (2 * np.pi * s2) ** 1.5)
    err = np.abs(P[1] - maxwell).max() / maxwell.max()
    assert err < 0.1, err


def test_engines_on_pipeline():
    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu import SiteNetwork
    from sitator_tpu.core.sitetraj import SiteTrajectory

    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=6, n_frames=200,
                                 jump_rate=0.05, seed=31)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    st = SiteTrajectory(sn, np.zeros((md.n_frames, md.n_ions), np.int64))
    st.set_real_traj(md.traj)

    ra = RDFAnalysis(select_a="mobile", select_b="static",
                     verbose=False).run(st)
    assert ra.g_.shape == (200,) and (ra.g_ >= 0).all()
    # mobile ions sit in body centers: nearest host shell at sqrt(3) a/2
    peak_r = ra.r_[np.argmax(ra.g_)]
    assert peak_r == pytest.approx(np.sqrt(3) * 2.0, abs=0.5)

    vh = VanHoveAnalysis(lags=(0, 20), n_bins=50, origin_stride=20,
                         verbose=False).run(st)
    assert vh.G_self_.shape == (2, 50) and vh.G_distinct_.shape == (2, 50)
    dr = vh.r_[1] - vh.r_[0]
    assert vh.G_self_[0, 0] == pytest.approx(1.0 / dr, rel=1e-6)

    # species-number selection resolves, bogus selection raises
    RDFAnalysis(select_a=3, verbose=False).run(st)
    with pytest.raises(ValueError, match="unknown selection"):
        RDFAnalysis(select_a="bogus", verbose=False).run(st)
    with pytest.raises(ValueError, match="no real trajectory"):
        st2 = SiteTrajectory(sn, np.zeros((5, md.n_ions), np.int64))
        RDFAnalysis(verbose=False).run(st2)


def test_min_cell_height_triclinic():
    cell = np.array([[4.0, 0, 0], [0, 5.0, 0], [3.9, 0, 0.5]])
    # the third vector is nearly parallel to the first: tiny height
    h = corr._min_cell_height(cell)
    assert h == pytest.approx(0.5, abs=1e-9)
    assert corr._min_cell_height(np.eye(3) * 7.0) == pytest.approx(7.0)


def test_lag_validation():
    traj = np.zeros((10, 2, 3))
    cell = np.eye(3) * 5.0
    with pytest.raises(ValueError, match="lag"):
        corr.van_hove_self(traj, cell, np.ones(2, bool), lags=[10])
    with pytest.raises(ValueError, match="lag"):
        corr.van_hove_distinct(traj, cell, np.ones(2, bool), lags=[-1])


def test_kinetics_plotting_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sitator_tpu.dynamics import ArrheniusAnalysis, DiffusionAnalysis
    from sitator_tpu.visualization import (
        plot_arrhenius, plot_msd, plot_rdf, plot_van_hove)

    rng = np.random.default_rng(41)
    F, N = 400, 10
    traj = np.cumsum(rng.normal(scale=0.3, size=(F, N, 3)), axis=0)
    cell = np.eye(3) * 30.0
    da = DiffusionAnalysis(verbose=False).run(
        traj, mobile_mask=np.ones(N, bool), cell=cell)
    fig = plot_msd(da, show_atoms=True)
    fig.savefig(tmp_path / "msd.png")

    kb = 8.617333262e-5
    T = np.array([500.0, 600.0, 700.0])
    D = 1e-3 * np.exp(-0.2 / (kb * T))
    aa = ArrheniusAnalysis(verbose=False).run(T, D)
    fig = plot_arrhenius(aa, T, D, errors=0.05 * D)
    fig.savefig(tmp_path / "arrhenius.png")

    wrapped = rng.uniform(0, 9.0, size=(5, 20, 3))
    class _RA:  # minimal fitted-result stand-ins
        r_, g_ = corr.rdf(wrapped, np.eye(3) * 9.0, np.ones(20, bool),
                          n_bins=20)
    fig = plot_rdf(_RA)
    fig.savefig(tmp_path / "rdf.png")

    class _VH:
        lags = (0, 2)
        r_, G_self_ = corr.van_hove_self(
            wrapped, np.eye(3) * 9.0, np.ones(20, bool), lags=lags,
            n_bins=20)
        _, G_distinct_ = corr.van_hove_distinct(
            wrapped, np.eye(3) * 9.0, np.ones(20, bool), lags=lags,
            n_bins=20)
    fig = plot_van_hove(_VH, part="self")
    fig.savefig(tmp_path / "vh_self.png")
    fig = plot_van_hove(_VH, part="distinct")
    fig.savefig(tmp_path / "vh_dist.png")
    with pytest.raises(ValueError, match="self"):
        plot_van_hove(_VH, part="bogus")
    assert (tmp_path / "msd.png").stat().st_size > 1000
    plt.close("all")


def test_histogram_counts_exact_past_float32(rng=None):
    """A single bin accumulating >2^24 counts stays exact (the carry is
    int32, host-accumulated in int64 — a f32 carry would round away
    increments past 16.7M)."""
    n, F = 650, 40                      # 40 * 650 * 649 = 16.87M pairs
    pts = np.random.default_rng(0).normal(scale=1e-3, size=(F, n, 3)) + 5.0
    cell = np.eye(3) * 10.0
    r, g = corr.rdf(pts, cell, np.ones(n, bool), r_max=1.0, n_bins=4)
    shells = 4 / 3 * np.pi * np.diff(np.linspace(0, 1.0, 5) ** 3)
    vol = 1000.0
    counts = g * (F * n * (n - 1) * shells / vol)
    assert int(round(counts.sum())) == F * n * (n - 1)
    assert counts.sum() > 2 ** 24      # the regression actually bites


def test_rdf_overlapping_selections_no_self_spike():
    """A selection contained in another: shared atoms are never paired
    with themselves and the normalization accounts for the overlap."""
    rng = np.random.default_rng(19)
    n = 120
    traj = rng.uniform(0, 12.0, size=(30, n, 3))
    cell = np.eye(3) * 12.0
    sub = np.zeros(n, bool)
    sub[:40] = True
    r, g = corr.rdf(traj, cell, sub, np.ones(n, bool), n_bins=30)
    assert g[0] < 5.0                   # no r=0 self spike
    assert abs(g[5:].mean() - 1.0) < 0.1


def test_r_max_validation():
    cell = np.eye(3) * 8.0
    traj = np.zeros((2, 3, 3))
    mask = np.ones(3, bool)
    with pytest.raises(ValueError, match="minimum-image validity"):
        corr.rdf(traj, cell, mask, r_max=4.5)
    # exact mode extends validity to the full height
    corr.rdf(traj, cell, mask, r_max=4.5, exact=True)
    with pytest.raises(ValueError, match="minimum-image validity"):
        corr.rdf(traj, cell, mask, r_max=8.5, exact=True)
    with pytest.raises(ValueError, match="minimum-image validity"):
        corr.van_hove_distinct(traj, cell, mask, lags=[0], r_max=4.5)


def test_van_hove_distinct_shared_origins():
    rng = np.random.default_rng(29)
    traj = rng.uniform(0, 9.0, size=(50, 8, 3))
    cell = np.eye(3) * 9.0
    # all lags share the origin grid of the largest lag; a max-lag with
    # a huge stride still has origin 0
    r, G = corr.van_hove_distinct(traj, cell, np.ones(8, bool),
                                  lags=[0, 10, 40], n_bins=10)
    assert G.shape == (3, 10)
    r2, G2 = corr.van_hove_distinct(traj, cell, np.ones(8, bool),
                                    lags=[49], origin_stride=60, n_bins=10)
    assert np.isfinite(G2).all()


def test_fit_window_single_source_of_truth():
    from sitator_tpu.ops.msd import fit_window
    assert fit_window(400, (0.0, 0.004)) == (1, 3)
    assert fit_window(100, (0.2, 0.5)) == (20, 50)
    assert fit_window(5, (0.2, 0.9)) == (1, 4)


def test_selection_masks_and_verbose_logging():
    """Boolean-mask selection path, species-not-found and wrong-shape
    raises, and the verbose branches of all three correlation engines
    (coverage audit)."""
    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu import SiteNetwork
    from sitator_tpu.core.sitetraj import SiteTrajectory
    from sitator_tpu.dynamics import ScatteringAnalysis

    md = make_hopping_trajectory(n_cells=2, a=4.0, n_ions=3, n_frames=60,
                                 jump_rate=0.05, seed=7)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    st = SiteTrajectory(sn, np.zeros((md.n_frames, md.n_ions), np.int64))
    st.set_real_traj(md.traj)

    ra = RDFAnalysis(select_a=np.asarray(md.mobile_mask, bool),
                     n_bins=24, verbose=True).run(st)
    assert ra.g_.shape == (24,)
    with pytest.raises(ValueError, match="no atoms of species"):
        RDFAnalysis(select_a=99, verbose=False).run(st)
    with pytest.raises(ValueError, match=r"must be \(n_atoms,\)"):
        RDFAnalysis(select_a=np.ones(3, bool), verbose=False).run(st)
    VanHoveAnalysis(lags=(0, 5), n_bins=16, origin_stride=10,
                    verbose=True).run(st)
    sa = ScatteringAnalysis(q_max=2.5, n_shells=3, verbose=True).run(st)
    assert np.isfinite(sa.S_q_).any()
