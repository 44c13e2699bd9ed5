"""Validation on REAL molecular dynamics (BAOAB Langevin integration,
`make_langevin_trajectory`) — the closest available stand-in for the
reference ecosystem's real-AIMD integration test (SURVEY.md §5): ion
motion emerges from equations of motion (anharmonic wells, window
recrossings, correlated vibrations), not from an imposed Poisson
process, and the full landmark pipeline must still recover the physics.
"""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.io import ArrayTrajectory, make_langevin_trajectory
from sitator_tpu.landmark import LandmarkAnalysis, StreamingLandmarkAnalysis
from sitator_tpu.ops.pbc import PBCCalculator
from sitator_tpu.voronoi import VoronoiSiteGenerator


@pytest.fixture(scope="module")
def langevin_run():
    md = make_langevin_trajectory(n_cells=3, a=4.0, n_ions=4,
                                  n_frames=1500, kT=0.45, seed=1)
    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    seeds = VoronoiSiteGenerator(merge_tol=0.05, verbose=False).run(sn0)
    la = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          minimum_site_occupancy=0.01, verbose=False)
    st = la.run(seeds, md.traj)
    return md, seeds, st


def test_langevin_thermodynamics_sane():
    """The generator's host obeys equipartition: tethered-atom vibration
    amplitude matches sqrt(kT/k) to ~10% (the integrator samples the
    canonical ensemble, i.e. this is real dynamics, not jitter)."""
    md = make_langevin_trajectory(n_cells=3, n_frames=600, seed=3)
    host = md.traj[:, md.static_mask].astype(np.float64)
    ref = md.structure.positions[md.static_mask]
    sig = np.std(host - ref[None], axis=(0, 1))
    expect = np.sqrt(0.40 / 30.0)
    np.testing.assert_allclose(sig, expect, rtol=0.12)
    # ions never melt out of the interstitial network
    calc = PBCCalculator(md.structure.cell)
    d = calc.pairwise_distances(
        md.traj[-1, md.mobile_mask].astype(np.float64), md.true_sites)
    assert d.min(axis=1).max() < 2.0


def test_langevin_site_recovery(langevin_run):
    """Landmark analysis on real dynamics discovers sites on the true
    potential minima (cage centers) and no phantoms."""
    md, _, st = langevin_run
    sn = st.site_network
    calc = PBCCalculator(md.structure.cell)
    d = calc.pairwise_distances(sn.centers, md.true_sites)
    assert d.min(axis=1).max() < 0.7          # every discovered site real
    visited, counts = np.unique(md.true_assignments, return_counts=True)
    well = visited[counts >= 30]
    d_wv = calc.pairwise_distances(sn.centers, md.true_sites[well])
    assert d_wv.min(axis=0).max() < 0.7       # well-visited sites found


def test_langevin_label_agreement(langevin_run):
    """Per-frame assignments agree with the geometric nearest-cage-center
    labels on the overwhelming majority of frames (disagreement is
    confined to window recrossings)."""
    md, _, st = langevin_run
    sn = st.site_network
    calc = PBCCalculator(md.structure.cell)
    d = calc.pairwise_distances(sn.centers, md.true_sites)
    to_true = d.argmin(axis=1)                # discovered -> true site
    labels = np.asarray(st.traj)
    mapped = np.where(labels >= 0, to_true[np.maximum(labels, 0)], -1)
    known = labels >= 0
    assert known.mean() > 0.95
    agree = (mapped == md.true_assignments) & known
    assert agree.sum() / known.sum() > 0.90


def test_langevin_jump_parity_and_engine_consistency(langevin_run):
    """Debounced jump counts track the geometric ground truth within a
    generous envelope (recrossing flicker is physical here), and the
    streaming engine reproduces the classic engine's jump totals on the
    same centers."""
    from sitator_tpu.dynamics import JumpAnalysis, RemoveShortJumps
    md, seeds, st = langevin_run
    st2 = RemoveShortJumps(frame_threshold=3, verbose=False).run(st)
    ja = JumpAnalysis(verbose=False)
    ja.run(st2)
    found = int(st2.site_network.n_ij.sum())
    true = int(md.true_n_ij.sum())
    assert true > 10                          # the dynamics actually hops
    assert 0.5 * true <= found <= 2.5 * true, (found, true)

    # cross-engine: streaming with the same fitted centers
    sla = StreamingLandmarkAnalysis(cutoff_midpoint=4.0,
                                    cutoff_steepness=3.0,
                                    block_frames=256, verbose=False)
    centers = sla.fit_centers(seeds, ArrayTrajectory(md.traj))
    out = sla.run(seeds, md.traj, centers=centers)
    # both engines see hop activity of the same magnitude
    assert 0.3 * found <= int(out.n_ij.sum()) <= 4.0 * found


def test_diffusion_suite_on_real_dynamics():
    """Kinetics closure on genuine equations of motion: tracer D from the
    MSD, site-hop D from the discretized path, and the relaxation
    observables are mutually consistent on the BAOAB trajectory."""
    from sitator_tpu import SiteNetwork
    from sitator_tpu.dynamics import (DiffusionAnalysis,
                                      RelaxationAnalysis,
                                      SiteDiffusionAnalysis)
    from sitator_tpu.io import make_langevin_trajectory
    from sitator_tpu.landmark import LandmarkAnalysis
    from sitator_tpu.voronoi import VoronoiSiteGenerator

    md = make_langevin_trajectory(n_cells=3, a=4.0, n_ions=4,
                                  n_frames=1200, seed=7)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    sn = VoronoiSiteGenerator(merge_tol=0.05).run(sn)
    st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          verbose=False).run(sn, md.traj)
    st.set_real_traj(md.traj)

    da = DiffusionAnalysis(timestep=1.0, verbose=False).run(st)
    sd = SiteDiffusionAnalysis(timestep=1.0, verbose=False).run(st)
    assert da.D_tracer_ > 0
    # real dynamics: in-well vibration inflates neither estimate by much
    # past the diffusive window; the site path must carry the transport
    ratio = sd.D_site_ / da.D_tracer_
    assert 0.3 < ratio < 3.0, (sd.D_site_, da.D_tracer_)

    # relaxation: hop-scale q, F_s decays, alpha2 is non-Gaussian at
    # intermediate times (hopping), small at the longest lag
    ra = RelaxationAnalysis(q=2 * np.pi / 4.0, timestep=1.0,
                            origin_stride=7, verbose=False).run(st)
    assert ra.fs_[0] == 1.0
    assert ra.fs_[-1] < 0.5
    assert np.isfinite(ra.tau_alpha_)
    assert ra.alpha2_.max() > 0.05    # discrete hops => non-Gaussian
