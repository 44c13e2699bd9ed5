"""Dynamics layer: scan-based JumpAnalysis vs oracle, MCL, merging, filters,
and the full-pipeline jump-rate parity gate (BASELINE.md gate 2)."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
from sitator_tpu.dynamics import (
    AverageVibrationalFrequency,
    JumpAnalysis,
    MergeSitesByDistance,
    MergeSitesByDynamics,
    RemoveShortJumps,
    RemoveUnoccupiedSites,
)
from sitator_tpu.io import make_hopping_trajectory
from sitator_tpu.landmark import LandmarkAnalysis
from sitator_tpu.ops.mcl import markov_cluster
from sitator_tpu.ops.pbc import PBCCalculator
from sitator_tpu.voronoi import VoronoiSiteGenerator


def make_network(n_sites, n_mobile=3, n_static=6, seed=0, a=10.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, a, size=(n_static + n_mobile, 3))
    species = np.array([16] * n_static + [3] * n_mobile)
    s = Structure(pos, species, np.eye(3) * a)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, a, size=(n_sites, 3))
    return sn


def oracle_jump_stats(traj, S):
    """Pure-python oracle for the jump scan (SURVEY.md §4.3 semantics)."""
    F, M = traj.shape
    n_ij = np.zeros((S, S), dtype=int)
    lag = np.zeros((S, S), dtype=int)
    res_sum = np.zeros(S, dtype=int)
    res_cnt = np.zeros(S, dtype=int)
    last = -np.ones(M, dtype=int)
    res = np.zeros(M, dtype=int)
    for f in range(F):
        for m in range(M):
            s = traj[f, m]
            if s < 0:
                continue
            if last[m] < 0:
                last[m], res[m] = s, 1
            elif s == last[m]:
                res[m] += 1
            else:
                n_ij[last[m], s] += 1
                lag[last[m], s] += res[m]
                res_sum[last[m]] += res[m]
                res_cnt[last[m]] += 1
                last[m], res[m] = s, 1
    return n_ij, lag, res_sum, res_cnt


def test_jump_analysis_matches_oracle(rng):
    S = 7
    traj = rng.integers(-1, S, size=(200, 5)).astype(np.int32)
    sn = make_network(S, n_mobile=5)
    st = SiteTrajectory(sn, traj)
    JumpAnalysis(verbose=False).run(st)
    n_ij, lag, res_sum, res_cnt = oracle_jump_stats(traj, S)
    np.testing.assert_array_equal(sn.n_ij, n_ij)
    want_lag = np.where(n_ij > 0, lag / np.maximum(n_ij, 1), np.nan)
    np.testing.assert_allclose(sn.jump_lag, want_lag)
    want_rt = np.where(res_cnt > 0, res_sum / np.maximum(res_cnt, 1), np.nan)
    np.testing.assert_allclose(sn.residence_times, want_rt)
    # p_ij rows are distributions over observed jumps
    rows = n_ij.sum(1) > 0
    np.testing.assert_allclose(sn.p_ij[rows].sum(1), 1.0, atol=1e-12)
    occ = np.bincount(traj[traj >= 0], minlength=S) / 200
    np.testing.assert_allclose(sn.occupancies, occ)


def test_jump_analysis_unknown_gap_policy():
    """Jumps across unknown gaps count; unknown frames don't extend residence."""
    sn = make_network(3, n_mobile=1)
    traj = np.array([[0], [0], [-1], [-1], [1], [1], [1], [2]])
    st = SiteTrajectory(sn, traj)
    JumpAnalysis(verbose=False).run(st)
    assert sn.n_ij[0, 1] == 1 and sn.n_ij[1, 2] == 1
    assert sn.n_ij.sum() == 2
    # residence at 0 before jumping = 2 known frames
    assert sn.jump_lag[0, 1] == 2
    assert sn.jump_lag[1, 2] == 3


def oracle_jump_stats_break(traj, S):
    """Oracle for unknown_policy='break': an unknown frame forgets the
    previous site (no jump across the gap)."""
    F, M = traj.shape
    n_ij = np.zeros((S, S), dtype=int)
    lag = np.zeros((S, S), dtype=int)
    res_sum = np.zeros(S, dtype=int)
    res_cnt = np.zeros(S, dtype=int)
    last = -np.ones(M, dtype=int)
    res = np.zeros(M, dtype=int)
    for f in range(F):
        for m in range(M):
            s = traj[f, m]
            if s < 0:
                last[m] = -1
                continue
            if last[m] < 0:
                last[m], res[m] = s, 1
            elif s == last[m]:
                res[m] += 1
            else:
                n_ij[last[m], s] += 1
                lag[last[m], s] += res[m]
                res_sum[last[m]] += res[m]
                res_cnt[last[m]] += 1
                last[m], res[m] = s, 1
    return n_ij, lag, res_sum, res_cnt


def test_jump_analysis_break_policy():
    """unknown_policy='break': gaps split residences and record no jump."""
    import jax.numpy as jnp
    from sitator_tpu.ops.jumps import jump_stats, jump_stats_parallel
    sn = make_network(3, n_mobile=1)
    traj = np.array([[0], [0], [-1], [-1], [1], [1], [1], [2]])
    st = SiteTrajectory(sn, traj)
    JumpAnalysis(unknown_policy="break", verbose=False).run(st)
    assert sn.n_ij[0, 1] == 0          # no jump across the gap
    assert sn.n_ij[1, 2] == 1
    assert sn.n_ij.sum() == 1
    assert sn.jump_lag[1, 2] == 3

    # scan and parallel formulations agree with the oracle on random data
    rng2 = np.random.default_rng(77)
    big = rng2.integers(-1, 6, size=(300, 7)).astype(np.int32)
    want = oracle_jump_stats_break(big, 6)
    for fn in (jump_stats, jump_stats_parallel):
        got = fn(jnp.asarray(big), 6, unknown_policy="break")
        np.testing.assert_array_equal(np.asarray(got["n_ij"]), want[0])
        np.testing.assert_array_equal(np.asarray(got["lag_sum"]), want[1])
        np.testing.assert_array_equal(np.asarray(got["res_sum"]), want[2])
        np.testing.assert_array_equal(np.asarray(got["res_cnt"]), want[3])
    # the two device formulations agree bit-for-bit on carries too
    a = jump_stats(jnp.asarray(big), 6, unknown_policy="break")
    b = jump_stats_parallel(jnp.asarray(big), 6, unknown_policy="break")
    np.testing.assert_array_equal(np.asarray(a["last_sites"]),
                                  np.asarray(b["last_sites"]))
    np.testing.assert_array_equal(np.asarray(a["last_res"]),
                                  np.asarray(b["last_res"]))


def test_mcl_two_blocks():
    """Two 3-cliques weakly connected → two MCL clusters."""
    A = np.zeros((6, 6))
    for i in range(3):
        for j in range(3):
            A[i, j] = A[i + 3, j + 3] = 10.0
    A[2, 3] = A[3, 2] = 0.1
    groups = markov_cluster(A, inflation=2.0)
    gsets = sorted(tuple(sorted(g)) for g in groups)
    assert gsets == [(0, 1, 2), (3, 4, 5)]


def test_mcl_identity_no_merge():
    groups = markov_cluster(np.eye(5), inflation=2.0)
    assert len(groups) == 5


def test_merge_by_distance():
    sn = make_network(4)
    sn.centers = np.array([[1.0, 1, 1], [1.4, 1, 1], [5, 5, 5], [9.9, 1, 1]])
    # wrap-around: site 3 at 9.9 is 1.1 from site 0 through the boundary
    traj = np.array([[0, 1, 2], [3, 1, 2]])
    st = SiteTrajectory(sn, traj)
    st2 = MergeSitesByDistance(threshold=1.2, verbose=False).run(st)
    # 0-1 merge (0.4 apart), 0-3 merge via PBC (1.1) -> single linkage {0,1,3}
    assert st2.site_network.n_sites == 2
    # trajectory relabeled consistently
    assert st2.traj[0, 0] == st2.traj[1, 0]


def test_merge_respects_site_types():
    sn = make_network(3)
    sn.centers = np.array([[1.0, 1, 1], [1.2, 1, 1], [1.1, 1.2, 1]])
    sn.site_types = np.array([0, 1, 0])
    traj = np.zeros((4, 3), dtype=np.int32)
    st = SiteTrajectory(sn, traj)
    st2 = MergeSitesByDistance(threshold=1.0, verbose=False).run(st)
    # types 0 and 1 cannot merge despite proximity
    assert st2.site_network.n_sites == 2
    st3 = MergeSitesByDistance(threshold=1.0, check_types=False,
                               verbose=False).run(st)
    assert st3.site_network.n_sites == 1


def test_merge_by_dynamics_collapses_flickering_pair():
    """Two pseudo-sites with rapid back-and-forth hopping merge; a third,
    rarely-visited distant site survives."""
    rng = np.random.default_rng(0)
    sn = make_network(3)
    sn.centers = np.array([[1.0, 1, 1], [1.5, 1, 1], [6, 6, 6]])
    # ion flickers between 0 and 1 constantly, visits 2 once
    col = rng.integers(0, 2, size=300).astype(np.int32)
    col[200:210] = 2
    traj = np.stack([col, np.zeros(300, np.int32),
                     np.ones(300, np.int32)], axis=1)
    st = SiteTrajectory(sn, traj)
    st2 = MergeSitesByDynamics(distance_threshold=2.0, verbose=False).run(st)
    assert st2.site_network.n_sites == 2
    # the flicker pair became one site; all its frames agree
    merged_label = st2.traj[0, 1]
    assert st2.traj[0, 2] == merged_label  # ions 1,2 sat on sites 0,1


def test_merge_distance_guard_blocks_far_merge():
    sn = make_network(2, n_mobile=1)
    sn.centers = np.array([[1.0, 1, 1], [6.0, 6, 6]])
    col = np.tile([0, 1], 100).astype(np.int32)
    traj = col[:, None]
    st = SiteTrajectory(sn, traj)
    st2 = MergeSitesByDynamics(distance_threshold=2.0, verbose=False).run(st)
    # dynamics say merge, geometry says no
    assert st2.site_network.n_sites == 2


def test_remove_unoccupied_sites():
    sn = make_network(5)
    sn.add_site_attribute("site_radii", np.arange(5.0))
    traj = np.array([[0, 2, 4], [0, 2, 4]])
    st = SiteTrajectory(sn, traj)
    st2 = RemoveUnoccupiedSites(verbose=False).run(st)
    assert st2.site_network.n_sites == 3
    np.testing.assert_array_equal(st2.traj, [[0, 1, 2], [0, 1, 2]])
    np.testing.assert_allclose(st2.site_network.site_radii, [0, 2, 4])


def test_remove_short_jumps():
    sn = make_network(3, n_mobile=1)
    col = np.array([0, 0, 0, 1, 0, 0, 2, 2, 2, 2, 1, 2, 2, 0])
    st = SiteTrajectory(sn, col[:, None].astype(np.int32))
    st2 = RemoveShortJumps(frame_threshold=2, verbose=False).run(st)
    want = np.array([0, 0, 0, 0, 0, 0, 2, 2, 2, 2, 2, 2, 2, 0])
    np.testing.assert_array_equal(st2.traj[:, 0], want)


def test_remove_short_jumps_ignores_unknown():
    sn = make_network(3, n_mobile=1)
    col = np.array([0, -1, 0, 1, -1, 0, 0])
    st = SiteTrajectory(sn, col[:, None].astype(np.int32))
    st2 = RemoveShortJumps(frame_threshold=2, verbose=False).run(st)
    np.testing.assert_array_equal(st2.traj[:, 0], [0, -1, 0, 0, -1, 0, 0])


def test_average_vibrational_frequency():
    """A pure harmonic oscillation yields its own frequency."""
    F, f0 = 2048, 0.05  # cycles per frame
    t = np.arange(F)
    pos = np.zeros((F, 2, 3))
    pos[:, 1, 0] = 5.0 + 0.3 * np.sin(2 * np.pi * f0 * t)
    pos[:, 1, 1] = 5.0
    pos[:, 0, :] = 1.0
    nu = AverageVibrationalFrequency(timestep=1.0).run(
        pos, mobile_mask=np.array([False, True]), cell=np.eye(3) * 10)
    assert abs(nu - f0) < 0.005


# ------------------------------------------------- full pipeline parity ---
def test_full_pipeline_jump_rate_parity():
    """BASELINE.md parity gate 2: seed → landmark → merge → jump statistics
    recover the ground-truth hop counts of the synthetic MD."""
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=4, n_frames=800,
                                 jump_rate=0.02, sigma_mobile=0.25,
                                 sigma_static=0.04, seed=42)
    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    seeds = VoronoiSiteGenerator(merge_tol=0.05).run(sn0)
    la = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          verbose=False)
    st = la.run(seeds, md.traj)
    st = MergeSitesByDynamics(distance_threshold=2.0, verbose=False).run(st)
    st = RemoveShortJumps(frame_threshold=2, verbose=False).run(st)
    JumpAnalysis(verbose=False).run(st)
    sn = st.site_network

    # map discovered sites -> true sites; after merging it must be 1:1
    calc = PBCCalculator(md.structure.cell)
    d = calc.pairwise_distances(sn.centers, md.true_sites)
    site_map = d.argmin(axis=1)
    assert len(np.unique(site_map)) == sn.n_sites

    # ground-truth n_ij restricted to discovered sites, via the map
    got = np.zeros_like(md.true_n_ij)
    for a in range(sn.n_sites):
        for b in range(sn.n_sites):
            got[site_map[a], site_map[b]] += sn.n_ij[a, b]
    # total jump-count parity within 10%
    n_true = md.true_n_ij.sum()
    assert abs(int(got.sum()) - n_true) <= max(2, 0.1 * n_true)
    # per-edge parity: every true edge with >=3 hops recovered within 2 hops
    big = np.argwhere(md.true_n_ij >= 3)
    for a, b in big:
        assert abs(got[a, b] - md.true_n_ij[a, b]) <= 2


def test_mcl_expansion_is_matrix_power():
    """Regression: expansion=e must compute m^e per iteration, not the
    repeated-squaring m^(2^(e-1)).  One iteration with huge prune-off and
    inflation=1 reduces MCL to exactly one expansion step."""
    import jax.numpy as jnp
    from sitator_tpu.ops.mcl import mcl_iterate
    rng2 = np.random.default_rng(3)
    T = rng2.random((5, 5))
    T = T / T.sum(0, keepdims=True)
    got = np.asarray(mcl_iterate(jnp.asarray(T, jnp.float32), 1.0,
                                 expansion=3, max_iters=1, prune=0.0))
    want = np.linalg.matrix_power(T, 3)
    want = want / want.sum(0, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_jump_rate_parity_with_poisson_truth():
    """BASELINE parity gate 2 (jump-RATE parity): mean residence time
    recovered by JumpAnalysis from the ground-truth assignments matches
    the generator's Poisson attempt rate (residence ~ Geometric(p_eff),
    mean 1/p_eff with p_eff = jump_rate x acceptance)."""
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=4,
                                 n_frames=6000, jump_rate=0.05, seed=23)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    sn.centers = md.true_sites
    st = SiteTrajectory(sn, md.true_assignments)
    ja = JumpAnalysis(verbose=False)
    ja.run(st)
    res_cnt = np.asarray(sn.n_ij).sum()
    # completed residences: total frames spent before each recorded jump
    mean_res = (np.nansum(np.asarray(sn.residence_times)
                          * np.asarray(sn.n_ij).sum(axis=1))
                / max(res_cnt, 1))
    # acceptance: a jump attempt targets one of 6 neighbors uniformly;
    # with 4 ions on 27 sites a target is rarely occupied (>= 0.9)
    expected_lo, expected_hi = 1.0 / 0.05, 1.0 / (0.05 * 0.85)
    assert expected_lo * 0.8 < mean_res < expected_hi * 1.2, \
        (mean_res, expected_lo, expected_hi)
    # and the total jump count is consistent with rate x time x ions
    expect_jumps = 0.05 * 0.9 * 6000 * 4
    assert 0.75 * expect_jumps < res_cnt < 1.15 * expect_jumps, \
        (res_cnt, expect_jumps)


def test_jump_stats_exact_matches_one_shot():
    """Blocked int64 accumulation is bitwise-equal to the one-shot scan
    (carry chaining across forced tiny blocks, both policies)."""
    import jax.numpy as jnp
    from sitator_tpu.ops.jumps import jump_stats, jump_stats_exact

    rng = np.random.default_rng(11)
    traj = rng.integers(-1, 6, size=(233, 9)).astype(np.int32)
    for policy in ("persist", "break"):
        want = jump_stats(jnp.asarray(traj), 6, unknown_policy=policy)
        for bf in (7, 50, 10_000):
            got = jump_stats_exact(traj, 6, unknown_policy=policy,
                                   block_frames=bf)
            for k in want:
                np.testing.assert_array_equal(
                    np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
        assert got["n_ij"].dtype == np.int64
        assert got["lag_sum"].dtype == np.int64


def test_jump_stats_exact_no_int32_wrap():
    """Adversarially long carried residences: three ions each carry a
    2^30-frame residence; the correct lag_sum[0, 1] = 3*2^30 + 3 exceeds
    int32 range.  The exact path must report it whether the closes land in
    different blocks (per-block spill) or the SAME block (the sound
    carried-residence bound routes the block to the NumPy int64 scan);
    the one-shot int32 device scan demonstrably wraps."""
    from sitator_tpu.ops.jumps import jump_stats, jump_stats_exact

    big = np.int32(1 << 30)
    init_last = np.zeros(3, dtype=np.int32)      # all ions sit at site 0
    init_res = np.full(3, big, dtype=np.int32)   # ...for 2^30 frames already
    # ion m jumps 0->1 at frame m
    traj = np.zeros((3, 3), dtype=np.int32)
    for m in range(3):
        traj[m:, m] = 1
    # oracle: ion m closes residence big+m at frame m
    want = sum(int(big) + m for m in range(3))

    for bf in (1, 10_000):                       # multi-block and one-block
        got = jump_stats_exact(traj, 2, init_last=init_last,
                               init_res=init_res, block_frames=bf)
        assert int(got["lag_sum"][0, 1]) == want, bf
        assert int(got["res_sum"][0]) == want, bf
    # the one-shot int32 scan demonstrably wraps on the same input
    import jax.numpy as jnp
    raw = jump_stats(jnp.asarray(traj), 2, init_last=jnp.asarray(init_last),
                     init_res=jnp.asarray(init_res))
    assert int(np.asarray(raw["lag_sum"])[0, 1]) != want


def test_jump_stats_exact_numpy_fallback_matches_device():
    """The NumPy int64 fallback block is bit-equivalent to the device scan
    on benign data (fuzz, both policies, incl. unknown frames) — forced by
    injecting a carry that trips the hazard bound without affecting the
    statistics (the carrying ion never appears)."""
    from sitator_tpu.ops.jumps import jump_stats, jump_stats_exact

    rng = np.random.default_rng(3)
    traj = rng.integers(-1, 5, size=(97, 6)).astype(np.int32)
    traj[:, 5] = -1                      # ion 5 is never assigned
    init_res = np.zeros(6, np.int32)
    init_res[5] = np.int32((1 << 31) - 2)  # trips the bound, closes never
    init_last = np.full(6, -1, np.int32)
    for policy in ("persist", "break"):
        want = jump_stats(traj, 5, init_last=init_last,
                          init_res=init_res, unknown_policy=policy)
        got = jump_stats_exact(traj, 5, init_last=init_last,
                               init_res=init_res, unknown_policy=policy,
                               block_frames=10_000)
        for k in ("n_ij", "lag_sum", "res_sum", "res_cnt", "occ_counts"):
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]),
                                          err_msg=(policy, k))
