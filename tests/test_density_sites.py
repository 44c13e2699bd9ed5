"""Density-based site seeding: exact device histograms, periodic
smoothing/peak extraction against ground truth, and the generator
end-to-end (hopping MD → recovered true sites → landmark pipeline)."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.io import make_hopping_trajectory
from sitator_tpu.network import DensitySiteGenerator, match_sites
from sitator_tpu.ops import density as density_ops


def test_density_grid_exact_counts():
    """Counts are exact and land in the right bins: stationary atoms put
    every frame in one known bin; totals conserve F*M."""
    cell = np.diag([8.0, 10.0, 12.0])
    F = 500
    pos = np.tile(np.array([[1.0, 2.5, 11.9], [7.9, 9.9, 0.1]]),
                  (F, 1, 1))
    grid = density_ops.density_grid(pos, cell, n_bins=4)
    assert grid.sum() == F * 2
    assert grid[0, 1, 3] == F            # 1.0/8*4=0.5, 2.5/10*4=1, 11.9/12*4=3.96
    assert grid[3, 3, 0] == F
    # coordinates outside the cell wrap periodically
    grid2 = density_ops.density_grid(pos + np.array([8.0, -10.0, 24.0]),
                                     cell, n_bins=4)
    np.testing.assert_array_equal(np.asarray(grid2), np.asarray(grid))


def test_density_grid_chunking_invariance_and_validation():
    rng = np.random.default_rng(5)
    cell = np.eye(3) * 9.0
    traj = rng.uniform(0, 9.0, size=(301, 7, 3))
    a = density_ops.density_grid(traj, cell, n_bins=8, chunk=301)
    b = density_ops.density_grid(traj, cell, n_bins=8, chunk=64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="no atoms"):
        density_ops.density_grid(traj, cell, mask=np.zeros(7, bool))
    with pytest.raises(ValueError, match="at least 2"):
        density_ops.density_grid(traj, cell, n_bins=1)


def test_find_density_peaks_known_blobs():
    """Two Gaussian blobs (one across the periodic boundary) → exactly
    two peaks at the blob centers, strongest first, sub-bin refined."""
    rng = np.random.default_rng(11)
    cell = np.eye(3) * 10.0
    c1 = np.array([3.3, 5.1, 7.2])
    c2 = np.array([0.1, 9.9, 0.2])       # straddles the corner
    pts = np.concatenate([
        c1 + rng.normal(scale=0.25, size=(6000, 3)),
        c2 + rng.normal(scale=0.25, size=(3000, 3))])[None]
    grid = density_ops.density_grid(pts, cell, n_bins=40)
    smoothed = density_ops.smooth_density(grid, cell, sigma=0.4)
    centers, weights = density_ops.find_density_peaks(
        smoothed, cell, threshold_rel=0.1, min_distance=1.5)
    assert len(centers) == 2
    assert weights[0] > weights[1]        # strongest (c1) first
    from sitator_tpu.network.compare import min_image_distance_matrix
    D = min_image_distance_matrix(centers, np.stack([c1, c2]), cell)
    assert D[0, 0] < 0.3 and D[1, 1] < 0.3


def test_find_density_peaks_empty():
    centers, weights = density_ops.find_density_peaks(
        np.zeros((8, 8, 8)), np.eye(3) * 5.0)
    assert centers.shape == (0, 3) and weights.shape == (0,)


def test_smooth_density_triclinic_isotropic():
    """A delta smoothed with sigma spreads ~isotropically in cartesian
    space even for a skewed cell: compare the decay one bin away along
    the short and long axes against the analytic Gaussian ratio."""
    cell = np.array([[6.0, 0, 0], [1.5, 12.0, 0], [0.8, 0.4, 24.0]])
    n = 24
    grid = np.zeros((n, n, n))
    grid[12, 12, 12] = 1.0
    sm = density_ops.smooth_density(grid, cell, sigma=1.0)
    heights = density_ops._cell_heights(cell)
    for axis, h in enumerate(heights):
        step = h / n                      # cartesian distance of 1 bin
        idx = [12, 12, 12]
        idx[axis] += 1
        expect = np.exp(-step ** 2 / 2.0)  # sigma = 1.0
        got = sm[tuple(idx)] / sm[12, 12, 12]
        assert got == pytest.approx(expect, rel=0.05), (axis, got, expect)


def test_generator_recovers_true_sites_and_feeds_landmark():
    """Hopping MD: the generator's centers match the ground-truth site
    positions the ions actually visited, and the produced network (with
    its nearest-static vertices) runs through LandmarkAnalysis."""
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=6,
                                 n_frames=1500, jump_rate=0.05, seed=3)
    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    gen = DensitySiteGenerator(n_bins=36, sigma=0.5, threshold=0.02,
                               min_distance=1.5, verbose=False)
    sn = gen.run(sn0, md.traj)

    visited = np.unique(md.true_assignments)
    true_visited = md.true_sites[visited]
    # every recovered center sits on a visited true site (< 0.5 Å)...
    truth = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    truth.centers = true_visited
    mapping, dists = match_sites(sn, truth)
    assert (mapping >= 0).all()
    assert np.nanmax(dists) < 0.5
    # ...and every frequently-visited site is recovered
    counts = np.bincount(md.true_assignments.ravel(),
                         minlength=len(md.true_sites))[visited]
    frequent = counts > 0.01 * md.true_assignments.size
    matched_truth = set(mapping[mapping >= 0].tolist())
    missing = [int(i) for i in np.flatnonzero(frequent)
               if i not in matched_truth]
    assert not missing, (missing, counts)

    assert sn.has_attribute("site_density")
    assert sn.has_vertices
    assert all(len(v) == 8 for v in sn.vertices)

    from sitator_tpu.landmark import LandmarkAnalysis
    st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          verbose=False).run(sn, md.traj)
    assert st.percent_unassigned < 0.05      # a FRACTION, not a percent


def test_generator_validation():
    with pytest.raises(ValueError, match="threshold"):
        DensitySiteGenerator(threshold=1.2)
    with pytest.raises(ValueError, match="n_vertices"):
        DensitySiteGenerator(n_vertices=0)
    # a huge min_distance collapses everything onto the strongest peak
    md = make_hopping_trajectory(n_cells=2, a=4.0, n_ions=2,
                                 n_frames=50, seed=9)
    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    sn = DensitySiteGenerator(min_distance=100.0, verbose=False).run(
        sn0, md.traj)
    assert sn.n_sites == 1


def test_density_grid_out_of_core_reader(tmp_path):
    """A disk-backed reader sweeps chunkwise to the identical grid —
    the generator never materializes the trajectory."""
    from sitator_tpu.io import write_xyz, open_trajectory
    md = make_hopping_trajectory(n_cells=2, a=4.0, n_ions=3,
                                 n_frames=257, jump_rate=0.04, seed=13)
    path = str(tmp_path / "md.npy")
    np.save(path, md.traj.astype(np.float32))
    reader = open_trajectory(path)
    cell = md.structure.cell
    a = density_ops.density_grid(md.traj.astype(np.float32), cell,
                                 mask=md.mobile_mask, n_bins=16,
                                 chunk=64)
    b = density_ops.density_grid(reader, cell, mask=md.mobile_mask,
                                 n_bins=16, chunk=64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    sn = DensitySiteGenerator(n_bins=24, verbose=False).run(sn0, reader)
    assert sn.n_sites >= 1


def test_density_grid_stride_matches_materialized_subsample():
    rng = np.random.default_rng(17)
    cell = np.eye(3) * 9.0
    traj = rng.uniform(0, 9.0, size=(157, 5, 3))
    for stride in (1, 2, 3, 7):
        a = density_ops.density_grid(traj, cell, n_bins=8, chunk=32,
                                     stride=stride)
        b = density_ops.density_grid(traj[::stride], cell, n_bins=8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="stride"):
        density_ops.density_grid(traj, cell, stride=0)


def test_no_peaks_raises_and_verbose_run(monkeypatch):
    """A peakless density field raises the instructive no-peaks error
    (an all-zero grid genuinely yields zero peaks — '> threshold*max'
    excludes everything); the verbose run logs its summary (coverage
    audit)."""
    from sitator_tpu.ops import density as density_ops
    # the genuine zero-peak input at the ops layer
    c, w = density_ops.find_density_peaks(np.zeros((6, 6, 6)),
                                          np.eye(3) * 8.0)
    assert len(c) == 0 and len(w) == 0
    md = make_hopping_trajectory(n_cells=2, a=4.0, n_ions=2,
                                 n_frames=50, seed=9)
    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    empty = (np.zeros((0, 3)), np.zeros(0))
    monkeypatch.setattr(density_ops, "find_density_peaks",
                        lambda *a, **k: empty)
    with pytest.raises(ValueError, match="no density peaks"):
        DensitySiteGenerator(verbose=False).run(sn0, md.traj)
    monkeypatch.undo()
    sn = DensitySiteGenerator(n_bins=24, verbose=True).run(sn0, md.traj)
    assert sn.n_sites > 0
