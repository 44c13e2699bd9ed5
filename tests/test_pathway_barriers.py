"""PathwayBarrierAnalysis: periodic trilinear interpolation exactness,
the forward/backward end-point identity, a Boltzmann-sampled analytic
double-well recovering its programmed barrier, and the full-pipeline
route."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
from sitator_tpu.dynamics import PathwayBarrierAnalysis
from sitator_tpu.dynamics.energetics import _trilinear_periodic

_K_B_EV = 8.617333262e-5


def test_trilinear_periodic_exact_at_centers_and_wraps():
    rng = np.random.default_rng(3)
    grid = rng.uniform(1, 2, size=(6, 5, 4))
    n = np.array(grid.shape)
    # exact at bin centers
    idx = np.stack(np.meshgrid(*[np.arange(k) for k in n],
                               indexing="ij"), -1).reshape(-1, 3)
    frac = (idx + 0.5) / n
    got = _trilinear_periodic(grid, frac)
    np.testing.assert_allclose(got, grid.ravel(), rtol=1e-12)
    # midpoint between two centers along x averages them (incl. the
    # periodic seam between the last and first bin)
    for i in list(range(n[0] - 1)) + [n[0] - 1]:
        frac = np.array([[((i + 1.0) % n[0]) / n[0], 0.5 / n[1],
                          0.5 / n[2]]])
        want = 0.5 * (grid[i % n[0], 0, 0]
                      + grid[(i + 1) % n[0], 0, 0])
        assert _trilinear_periodic(grid, frac)[0] == pytest.approx(
            want, rel=1e-12)


def _two_site_st(traj, centers, L):
    F, M = traj.shape[:2]
    species = np.array([3] * M)
    s = Structure(traj[0], species, np.eye(3) * L)
    sn = SiteNetwork(s, np.zeros(M, bool), np.ones(M, bool))
    sn.centers = np.asarray(centers, dtype=np.float64)
    st = SiteTrajectory(sn, np.zeros((F, M), dtype=int))
    st.set_real_traj(traj)
    return st, sn


def test_boltzmann_double_well_recovers_programmed_barrier():
    """Positions sampled from rho ∝ exp(-E(x)/kT) with
    E = Ea sin²(pi x / (L/2)): minima at x = 0, L/2, barrier Ea between
    them — the profiled barrier matches Ea both ways."""
    rng = np.random.default_rng(11)
    L, T = 10.0, 600.0
    kT = _K_B_EV * T
    Ea = 2.0 * kT
    n_pts = 600_000

    def energy(x):
        return Ea * np.sin(np.pi * x / (L / 2)) ** 2

    xs = np.empty(0)
    while len(xs) < n_pts:
        prop = rng.uniform(0, L, n_pts)
        keep = rng.uniform(0, 1, n_pts) < np.exp(-energy(prop) / kT)
        xs = np.concatenate([xs, prop[keep]])
    xs = xs[:n_pts]
    yz = rng.uniform(0, L, (n_pts, 2))
    pts = np.column_stack([xs, yz])
    F, M = 3000, n_pts // 3000
    traj = pts[: F * M].reshape(F, M, 3)

    centers = np.array([[0.0, L / 2, L / 2], [L / 2, L / 2, L / 2]])
    st, sn = _two_site_st(traj, centers, L)
    pa = PathwayBarrierAnalysis(temperature=T, n_bins=40, sigma=0.3,
                                n_samples=81, verbose=False).run(st)
    E = sn.density_barrier_ij
    assert E[0, 1] == pytest.approx(Ea, rel=0.15)
    assert E[1, 0] == pytest.approx(Ea, rel=0.15)
    s, prof = pa.profiles_[(0, 1)]
    assert s[-1] == pytest.approx(L / 2)
    assert prof[0] == 0.0
    # the peak sits mid-path
    assert s[np.argmax(prof)] == pytest.approx(L / 4, abs=0.5)


def test_forward_backward_difference_is_endpoint_free_energy():
    """Algebraic identity of the profile readout, independent of any
    physics: E_ij − E_ji == −kT (ln ρ_j − ln ρ_i) at the path ends."""
    rng = np.random.default_rng(7)
    L, T = 8.0, 500.0
    traj = rng.uniform(0, L, (800, 50, 3))   # any density field
    centers = np.array([[1.0, 2.0, 3.0], [5.0, 6.0, 1.0]])
    st, sn = _two_site_st(traj, centers, L)
    pa = PathwayBarrierAnalysis(temperature=T, n_bins=16, sigma=0.8,
                                verbose=False).run(st)
    E = sn.density_barrier_ij
    (s, prof) = pa.profiles_[(0, 1)]
    assert E[0, 1] - E[1, 0] == pytest.approx(prof[-1] - prof[0],
                                              rel=1e-12)


def test_unsampled_path_gives_nan_and_validation():
    L = 10.0
    rng = np.random.default_rng(5)
    # all density in one corner: the path interior crosses zero density
    traj = rng.uniform(0, 1.0, (100, 20, 3))
    centers = np.array([[0.5, 0.5, 0.5], [5.0, 5.0, 5.0]])
    st, sn = _two_site_st(traj, centers, L)
    pa = PathwayBarrierAnalysis(temperature=300.0, n_bins=20,
                                sigma=0.2, verbose=False).run(st)
    assert np.isnan(sn.density_barrier_ij[0, 1])
    assert (0, 1) not in pa.profiles_
    with pytest.raises(ValueError, match="temperature"):
        PathwayBarrierAnalysis(temperature=0.0)
    with pytest.raises(ValueError, match="n_samples"):
        PathwayBarrierAnalysis(temperature=300.0, n_samples=2)
    st2 = SiteTrajectory(sn, np.zeros((4, 20), dtype=int))
    with pytest.raises(ValueError, match="real trajectory"):
        PathwayBarrierAnalysis(temperature=300.0, verbose=False).run(st2)


def test_pathway_barriers_on_real_pipeline():
    """Hopping MD end-to-end: every observed jump edge gets a finite,
    positive barrier of a few kT, and both directions are populated."""
    from sitator_tpu.dynamics import JumpAnalysis
    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu.landmark import LandmarkAnalysis
    from sitator_tpu.voronoi import VoronoiSiteGenerator
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=6,
                                 n_frames=2000, jump_rate=0.05, seed=4)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    sn = VoronoiSiteGenerator(verbose=False).run(sn)
    st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          verbose=False).run(sn, md.traj)
    st = JumpAnalysis(verbose=False).run(st)
    st.set_real_traj(md.traj)
    pa = PathwayBarrierAnalysis(temperature=600.0, min_jumps=5,
                                verbose=False).run(st)
    E = st.site_network.density_barrier_ij
    finite = E[np.isfinite(E)]
    assert len(finite) >= 4
    # >= 0: from the downhill side of an uphill profile the interior
    # never exceeds the endpoint, so that direction's barrier is 0
    assert (finite >= 0).all()
    assert (finite > 0).sum() >= 4
    kT = _K_B_EV * 600.0
    assert np.median(finite) < 20 * kT


def test_plot_barrier_profiles_draws():
    import matplotlib
    matplotlib.use("Agg")
    from sitator_tpu.visualization import plot_barrier_profiles
    rng = np.random.default_rng(13)
    L = 8.0
    traj = rng.uniform(0, L, (400, 40, 3))
    centers = np.array([[1.0, 1.0, 1.0], [4.0, 4.0, 4.0],
                        [7.0, 1.0, 4.0]])
    st, sn = _two_site_st(traj, centers[:2], L)
    sn.centers = centers                      # 3 sites, all-pairs mode
    st2 = SiteTrajectory(sn, np.zeros((400, 40), dtype=int))
    st2.set_real_traj(traj)
    pa = PathwayBarrierAnalysis(temperature=400.0, n_bins=16,
                                sigma=0.8, verbose=False).run(st2)
    fig = plot_barrier_profiles(pa)
    fig.canvas.draw()
    lines = [l for l in fig.axes[0].get_lines() if len(l.get_xdata()) > 2]
    assert len(lines) == len(pa.profiles_)
    assert fig.axes[0].get_legend() is not None


def test_plot_barrier_profiles_reverse_edge_and_errors():
    import matplotlib
    matplotlib.use("Agg")
    from sitator_tpu.visualization import plot_barrier_profiles
    rng = np.random.default_rng(17)
    L = 8.0
    traj = rng.uniform(0, L, (300, 30, 3))
    centers = np.array([[1.0, 1.0, 1.0], [4.0, 4.0, 4.0]])
    st, sn = _two_site_st(traj, centers, L)
    pa = PathwayBarrierAnalysis(temperature=400.0, n_bins=16,
                                sigma=0.8, verbose=False).run(st)
    fig = plot_barrier_profiles(pa, edges=[(1, 0)])   # reversed key
    fig.canvas.draw()
    (line,) = [l for l in fig.axes[0].get_lines()
               if len(l.get_xdata()) > 2]
    y = line.get_ydata()
    s, prof = pa.profiles_[(0, 1)]
    np.testing.assert_allclose(y, prof[::-1] - prof[-1], rtol=1e-12)
    assert y[0] == 0.0                    # re-referenced to site 1's end
    with pytest.raises(ValueError, match="no profile"):
        plot_barrier_profiles(pa, edges=[(0, 5)])


def test_max_distance_filter_rerun_and_verbose():
    """max_distance prunes candidate pairs by min-image center distance;
    re-running replaces the edge attribute; an all-pruned pair set yields
    all-NaN barriers and no profiles (coverage audit)."""
    rng = np.random.default_rng(0)
    L = 8.0
    traj = rng.uniform(0, L, (200, 4, 3))
    centers = np.array([[1.0, 1.0, 1.0], [3.0, 3.0, 3.0]])
    st, sn = _two_site_st(traj, centers, L)
    kw = dict(temperature=300.0, n_bins=12, sigma=0.5, n_samples=9,
              verbose=True)
    pa = PathwayBarrierAnalysis(max_distance=10.0, **kw).run(st)
    assert (0, 1) in pa.profiles_
    E1 = sn.density_barrier_ij.copy()
    PathwayBarrierAnalysis(max_distance=10.0, **kw).run(st)
    np.testing.assert_allclose(sn.density_barrier_ij, E1)
    # centers are sqrt(12) ~ 3.46 apart: a 0.5 AA cap prunes the pair
    pa2 = PathwayBarrierAnalysis(max_distance=0.5, **kw).run(st)
    assert not pa2.profiles_
    assert np.isnan(sn.density_barrier_ij).all()
