"""Conduction bottlenecks: engineered single-chain (every site
critical) vs redundant ladder (none critical), plus the full-pipeline
route."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, Structure
from sitator_tpu.network import ConductionBottleneckAnalysis


def _network(centers, L):
    pos = np.zeros((2, 3))
    s = Structure(pos, [16, 16], np.eye(3) * L)
    sn = SiteNetwork(s, np.ones(2, bool), np.zeros(2, bool))
    sn.centers = np.asarray(centers, dtype=np.float64)
    return sn


def test_single_periodic_chain_every_site_critical():
    """A 1D ring through the periodic boundary: removing ANY site
    breaks percolation (1D → 0D)."""
    L = 8.0
    centers = [[1, 4, 4], [3, 4, 4], [5, 4, 4], [7, 4, 4]]
    sn = _network(centers, L)
    n_ij = np.zeros((4, 4))
    for i in range(4):
        n_ij[i, (i + 1) % 4] = 5
    sn.add_edge_attribute("n_ij", n_ij)
    cb = ConductionBottleneckAnalysis(verbose=False).run(sn)
    assert cb.base_dim_ == 1
    assert set(cb.critical_sites_.tolist()) == {0, 1, 2, 3}
    assert (cb.removal_dims_ == 0).all()
    assert sn.has_attribute("betweenness")
    # a cycle is symmetric: equal betweenness everywhere
    np.testing.assert_allclose(cb.betweenness_,
                               cb.betweenness_[0])


def test_redundant_ladder_has_no_critical_sites():
    """Two parallel periodic chains joined by rungs: any single site
    can be removed without killing percolation."""
    L = 8.0
    centers = []
    for y in (2.0, 6.0):
        for x in (1.0, 3.0, 5.0, 7.0):
            centers.append([x, y, 4.0])
    sn = _network(centers, L)
    S = 8
    n_ij = np.zeros((S, S))
    for c in range(2):                       # chain edges with wrap
        base = 4 * c
        for i in range(4):
            n_ij[base + i, base + (i + 1) % 4] = 5
    for i in range(4):                        # rungs
        n_ij[i, 4 + i] = 5
    sn.add_edge_attribute("n_ij", n_ij)
    cb = ConductionBottleneckAnalysis(verbose=False).run(sn)
    assert cb.base_dim_ == 1
    assert len(cb.critical_sites_) == 0
    assert (cb.removal_dims_ == 1).all()


def test_bottleneck_on_real_pipeline():
    from sitator_tpu.dynamics import JumpAnalysis
    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu.landmark import LandmarkAnalysis
    from sitator_tpu.voronoi import VoronoiSiteGenerator
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=6,
                                 n_frames=2500, jump_rate=0.06, seed=8)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    sn = VoronoiSiteGenerator(verbose=False).run(sn)
    st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          verbose=False).run(sn, md.traj)
    cb = ConductionBottleneckAnalysis(verbose=False).run(st)
    assert cb.base_dim_ >= 1                  # SC lattice percolates
    assert st.site_network.betweenness.shape == (
        st.site_network.n_sites,)
    assert np.isfinite(cb.betweenness_).all()
    with pytest.raises(ValueError, match="n_ij"):
        ConductionBottleneckAnalysis(verbose=False).run(
            _network([[1, 1, 1]], 8.0))
