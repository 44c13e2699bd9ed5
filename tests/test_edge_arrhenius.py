"""EdgeArrheniusAnalysis: per-edge activation energies recovered from a
temperature series of analyzed networks, across independent site
numberings."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import (EdgeArrheniusAnalysis, JumpAnalysis,
                                  KineticMonteCarlo)

KB = 8.617333262e-5


def _net(centers, cell=10.0):
    structure = Structure(np.zeros((2, 3)), [16, 3], np.eye(3) * cell)
    sn = SiteNetwork(structure, np.array([1, 0], bool),
                     np.array([0, 1], bool))
    sn.centers = np.asarray(centers, dtype=np.float64)
    return sn


CENTERS = np.array([[2.0, 2, 2], [6.0, 2, 2], [2.0, 6, 2]])
# per-edge barriers (eV) and attempt frequencies (per frame)
EA = np.array([[np.nan, 0.20, 0.30],
               [0.25, np.nan, 0.35],
               [0.15, 0.40, np.nan]])
# attempt frequencies kept < 1 per frame so the frame-resolution chain
# in the KMC integration test stays a valid probability at 1200 K
NU = np.array([[np.nan, 0.30, 0.50],
               [0.20, np.nan, 0.40],
               [0.60, 0.10, np.nan]])


def _exact_network(T, perm):
    """A network whose JumpAnalysis attributes encode the Arrhenius law
    EXACTLY (no sampling noise), with sites numbered by ``perm``."""
    k = NU * np.exp(-EA / (KB * T))          # rates in the canonical order
    t_i = np.full(3, 1e6)                    # frames at each site
    n_ij = k * t_i[:, None]
    np.fill_diagonal(n_ij, 0.0)
    sn = _net(CENTERS[perm])
    inv = np.argsort(perm)
    sn.add_edge_attribute("n_ij", n_ij[np.ix_(perm, perm)])
    sn.add_site_attribute("total_corrected_residences", t_i[perm])
    return sn


def test_exact_recovery_across_permuted_numberings():
    temps = [600.0, 800.0, 1200.0]
    perms = [np.array([0, 1, 2]), np.array([2, 0, 1]),
             np.array([1, 2, 0])]
    series = [(T, _exact_network(T, p)) for T, p in zip(temps, perms)]
    ea = EdgeArrheniusAnalysis(verbose=False).run(series)
    off = ~np.eye(3, dtype=bool)
    np.testing.assert_allclose(ea.Ea_ij_[off], EA[off], atol=1e-10)
    np.testing.assert_allclose(np.exp(ea.lnnu_ij_[off]), NU[off],
                               rtol=1e-8)
    assert (ea.n_points_ij_[off] == 3).all()
    # attributes written on the reference (first) network
    ref = series[0][1]
    np.testing.assert_allclose(ref.Ea_ij[off], EA[off], atol=1e-10)
    assert np.isfinite(ref.Ea_site).all()
    # mappings recover the permutations
    np.testing.assert_array_equal(ea.mappings_[1], np.argsort(perms[1]))


def test_kmc_sampled_series_recovers_barriers():
    """Statistical integration: KMC-resampled trajectories at three
    temperatures, full JumpAnalysis remeasurement, Ea within a few
    percent.  The window starts at 700 K so even the slowest edge
    (Ea=0.4, nu=0.1) collects enough hops for a stable ln-rate — at
    600 K it sees ~2 hops and its point is pure noise (measured in a
    probe run: max |dEa| 0.080 at 600 K vs 0.006 at 700 K)."""
    temps = [700.0, 900.0, 1200.0]
    series = []
    for i, T in enumerate(temps):
        k = NU * np.exp(-EA / (KB * T))
        P = np.where(np.isnan(k), 0.0, k)
        np.fill_diagonal(P, 0.0)
        assert P.sum(1).max() < 0.9
        P[np.arange(3), np.arange(3)] = 1.0 - P.sum(1)
        sn = _net(CENTERS)
        st = KineticMonteCarlo(n_walkers=64, n_frames=20000, seed=i,
                               start="stationary", transition_matrix=P,
                               verbose=False).run(sn)
        JumpAnalysis(verbose=False).run(st)
        series.append((T, st.site_network))
    ea = EdgeArrheniusAnalysis(verbose=False).run(series)
    off = ~np.eye(3, dtype=bool)
    np.testing.assert_allclose(ea.Ea_ij_[off], EA[off], atol=0.02)
    assert np.isfinite(ea.Ea_site_).all()


def test_validation_and_sparse_edges():
    sn = _exact_network(600.0, np.array([0, 1, 2]))
    with pytest.raises(ValueError, match="at least 2"):
        EdgeArrheniusAnalysis(verbose=False).run([(600.0, sn)])
    with pytest.raises(ValueError, match="distinct"):
        EdgeArrheniusAnalysis(verbose=False).run([(600.0, sn),
                                                  (600.0, sn)])
    with pytest.raises(ValueError, match="JumpAnalysis"):
        EdgeArrheniusAnalysis(verbose=False).run(
            [(600.0, sn), (800.0, _net(CENTERS))])
    with pytest.raises(ValueError, match="min_points"):
        EdgeArrheniusAnalysis(min_points=1)
    # an edge below min_counts at every T stays NaN
    s1 = _exact_network(600.0, np.array([0, 1, 2]))
    s2 = _exact_network(900.0, np.array([0, 1, 2]))
    for s in (s1, s2):
        n = s.n_ij.copy()
        n[0, 1] = 1.0                      # starved edge
        s.remove_attribute("n_ij")
        s.add_edge_attribute("n_ij", n)
    ea = EdgeArrheniusAnalysis(min_counts=5, verbose=False).run(
        [(600.0, s1), (900.0, s2)])
    assert np.isnan(ea.Ea_ij_[0, 1])
    assert np.isfinite(ea.Ea_ij_[1, 0])


def test_unmatched_sites_stay_nan():
    """A site missing at one temperature (e.g. unoccupied and removed)
    leaves its edges NaN when min_points cannot be met."""
    temps = [600.0, 800.0]
    s_full = _exact_network(600.0, np.array([0, 1, 2]))
    # second network lacks site 2 entirely
    k = NU[:2, :2] * np.exp(-EA[:2, :2] / (KB * 800.0))
    t_i = np.full(2, 1e6)
    n_ij = np.where(np.isnan(k), 0.0, k) * t_i[:, None]
    s_small = _net(CENTERS[:2])
    s_small.add_edge_attribute("n_ij", n_ij)
    s_small.add_site_attribute("total_corrected_residences", t_i)
    ea = EdgeArrheniusAnalysis(min_points=2, match_cutoff=1.0,
                               verbose=False).run(
        [(temps[0], s_full), (temps[1], s_small)])
    assert ea.mappings_[1][2] == -1
    assert np.isnan(ea.Ea_ij_[2, :]).all()
    assert np.isnan(ea.Ea_ij_[:, 2]).all()
    assert np.isfinite(ea.Ea_ij_[0, 1])


def _edge_collections(fig):
    from mpl_toolkits.mplot3d.art3d import Line3DCollection
    return [c for ax in fig.axes for c in ax.collections
            if isinstance(c, Line3DCollection)]


def test_network_plotter_handles_nan_edge_attr(tmp_path):
    """SiteNetworkPlotter DRAWS the finite entries of a NaN-padded,
    one-directional Ea_ij edge attribute (NaN in the reverse direction
    must not poison the symmetrization, nor NaN the width scale)."""
    import matplotlib
    matplotlib.use("Agg")
    from sitator_tpu.visualization import SiteNetworkPlotter
    sn = _exact_network(600.0, np.array([0, 1, 2]))
    ea = np.full((3, 3), np.nan)
    ea[0, 1] = 0.2                       # reverse directions are NaN —
    ea[1, 2] = 0.4                       # the common EdgeArrhenius shape
    sn.add_edge_attribute("Ea_ij", ea)
    fig = SiteNetworkPlotter(edge_attr="Ea_ij").plot(sn)
    cols = _edge_collections(fig)
    assert len(cols) == 1
    fig.canvas.draw()       # 3D segments project into 2D at draw time
    segs = cols[0].get_segments()
    assert len(segs) == 2                # both finite edges drawn
    widths = np.asarray(cols[0].get_linewidths())
    assert np.isfinite(widths).all()
    fig.savefig(tmp_path / "ea.png")
    assert (tmp_path / "ea.png").stat().st_size > 1000
    # all-NaN attribute: nothing drawn, no crash
    sn.remove_attribute("Ea_ij")
    sn.add_edge_attribute("Ea_ij", np.full((3, 3), np.nan))
    fig = SiteNetworkPlotter(edge_attr="Ea_ij").plot(sn)
    assert len(_edge_collections(fig)) == 0
    import matplotlib.pyplot as plt
    plt.close("all")
