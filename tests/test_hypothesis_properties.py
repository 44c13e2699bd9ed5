"""Hypothesis property tests (SURVEY.md §5 item 2, deepened).

The fixed-seed property tests in ``test_pbc.py`` / ``test_edge_cases.py``
sample a handful of named cells; here the *cell itself* is drawn from a
strategy (random mildly-skewed triclinic lattices) and every algebraic
invariant is checked against an independent float64 brute-force oracle,
with hypothesis shrinking any counterexample.

Shapes are kept FIXED inside each jitted-property test so the whole run
costs O(1) compiles; hypothesis varies only array *contents* (the axis
that actually finds bugs).
"""
import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from sitator_tpu.ops import pbc
from sitator_tpu.ops.jumps import jump_stats, jump_stats_exact

SETTINGS = dict(deadline=None, max_examples=60,
                suppress_health_check=[hyp.HealthCheck.too_slow])


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

@st.composite
def triclinic_cells(draw):
    """Random lower-triangular cell: diagonals in [3, 9], off-diagonals
    bounded by 0.5x the smaller adjacent diagonal — skewed enough to break
    naive orthorhombic math, mild enough that the 27-image exact search is
    provably sufficient (every Wigner-Seitz neighbor is a +-1 image)."""
    d = [draw(st.floats(3.0, 9.0)) for _ in range(3)]
    cell = np.diag(d)
    for i, j in ((1, 0), (2, 0), (2, 1)):
        lim = 0.5 * min(d[i], d[j])
        cell[i, j] = draw(st.floats(-lim, lim))
    return cell


def _pts(draw, n, scale=30.0):
    flat = draw(st.lists(st.floats(-scale, scale, allow_nan=False,
                                   allow_infinity=False, width=32),
                         min_size=3 * n, max_size=3 * n))
    return np.asarray(flat, np.float64).reshape(n, 3)


@st.composite
def cell_and_points(draw, n):
    return draw(triclinic_cells()), _pts(draw, n)


# ---------------------------------------------------------------------------
# PBC layer vs float64 brute force
# ---------------------------------------------------------------------------

def _brute_min_dist(dx, cell):
    """Exhaustive (2r+1)^3-image minimum distance in float64, with the image
    radius r grown to cover however many cells the raw displacement spans."""
    frac = dx @ np.linalg.inv(cell)
    r = int(np.ceil(np.abs(frac).max())) + 1
    shifts = np.array([[i, j, k]
                       for i in range(-r, r + 1)
                       for j in range(-r, r + 1)
                       for k in range(-r, r + 1)], np.float64) @ cell
    cand = dx[None, :] + shifts
    return float(np.sqrt((cand * cand).sum(1)).min())


@settings(**SETTINGS)
@given(cell_and_points(2))
def test_exact_min_image_matches_125_image_oracle(cp):
    cell, pts = cp
    ci = np.linalg.inv(cell)
    a, b = pts
    got = float(pbc.pbc_distance(jnp.asarray(a), jnp.asarray(b),
                                 jnp.asarray(cell), jnp.asarray(ci),
                                 exact=True))
    want = _brute_min_dist(b - a, cell)
    assert got == pytest.approx(want, rel=2e-5, abs=2e-4)


@settings(**SETTINGS)
@given(cell_and_points(4))
def test_wrap_idempotent_and_in_cell(cp):
    cell, pts = cp
    ci = np.linalg.inv(cell)
    w1 = np.asarray(pbc.wrap(jnp.asarray(pts), jnp.asarray(cell),
                             jnp.asarray(ci)))
    f = w1 @ np.linalg.inv(cell)
    assert (f > -1e-5).all() and (f < 1 + 1e-5).all()
    w2 = np.asarray(pbc.wrap(jnp.asarray(w1), jnp.asarray(cell),
                             jnp.asarray(ci)))
    # idempotence up to the wrap seam: compare as min-image displacement
    d = np.asarray(pbc.pbc_distance(jnp.asarray(w1), jnp.asarray(w2),
                                    jnp.asarray(cell), jnp.asarray(ci)))
    assert d.max() < 1e-4


@settings(**SETTINGS)
@given(cell_and_points(2), st.lists(st.floats(-40, 40, width=32),
                                    min_size=3, max_size=3))
def test_distance_translation_invariance(cp, tvec):
    cell, pts = cp
    ci = np.linalg.inv(cell)
    a, b = pts
    t = np.asarray(tvec, np.float64)
    d0 = float(pbc.pbc_distance(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(cell), jnp.asarray(ci),
                                exact=True))
    d1 = float(pbc.pbc_distance(jnp.asarray(a + t), jnp.asarray(b + t),
                                jnp.asarray(cell), jnp.asarray(ci),
                                exact=True))
    assert d1 == pytest.approx(d0, rel=3e-5, abs=3e-4)


@settings(**SETTINGS)
@given(cell_and_points(2),
       st.lists(st.integers(-3, 3), min_size=3, max_size=3))
def test_distance_lattice_shift_invariance(cp, nshift):
    cell, pts = cp
    ci = np.linalg.inv(cell)
    a, b = pts
    shift = np.asarray(nshift, np.float64) @ cell
    d0 = float(pbc.pbc_distance(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(cell), jnp.asarray(ci),
                                exact=True))
    d1 = float(pbc.pbc_distance(jnp.asarray(a + shift), jnp.asarray(b),
                                jnp.asarray(cell), jnp.asarray(ci),
                                exact=True))
    assert d1 == pytest.approx(d0, rel=3e-5, abs=3e-4)


@settings(**SETTINGS)
@given(triclinic_cells(), st.data())
def test_pbc_average_lattice_equivariance(cell, data):
    """Scattering a clustered point cloud across arbitrary periodic images
    must not move its PBC mean (the property site centers depend on)."""
    ci = np.linalg.inv(cell)
    n = 5
    # cluster within a ball of radius < 1/4 of the smallest cell height
    heights = 1.0 / np.linalg.norm(ci, axis=0)
    rad = 0.2 * heights.min()
    center = _pts(data.draw, 1, scale=10.0)[0]
    offs = _pts(data.draw, n, scale=1.0) / 1.0
    offs *= rad / max(np.abs(offs).max(), 1e-9)
    pts = center + offs
    shifts = np.asarray(
        data.draw(st.lists(st.integers(-2, 2), min_size=3 * n,
                           max_size=3 * n)), np.float64).reshape(n, 3) @ cell
    m0 = np.asarray(pbc.pbc_average(jnp.asarray(pts), jnp.asarray(cell),
                                    jnp.asarray(ci)))
    m1 = np.asarray(pbc.pbc_average(jnp.asarray(pts + shifts),
                                    jnp.asarray(cell), jnp.asarray(ci)))
    d = float(pbc.pbc_distance(jnp.asarray(m0), jnp.asarray(m1),
                               jnp.asarray(cell), jnp.asarray(ci),
                               exact=True))
    assert d < 5e-4


@settings(**SETTINGS)
@given(cell_and_points(4))
def test_frac_cart_roundtrip(cp):
    cell, pts = cp
    ci = np.linalg.inv(cell)
    back = np.asarray(pbc.to_cart(pbc.to_frac(jnp.asarray(pts),
                                              jnp.asarray(ci)),
                                  jnp.asarray(cell)))
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# writer/reader round-trips over random triclinic cells
# ---------------------------------------------------------------------------

@settings(deadline=None, max_examples=25)
@given(cell_and_points(4), st.sampled_from(["xyz", "lammps", "xdatcar"]))
def test_writer_roundtrip_random_triclinic(tmp_path_factory, cp, fmt):
    """write_*/read_* round-trip exactly (to text precision) for random
    lower-triangular triclinic cells and unwrapped positions — exercises
    the LAMMPS tilt-factor and XDATCAR fractional conversions far beyond
    the fixed cells in test_writers.py."""
    from sitator_tpu.core.structure import Structure
    from sitator_tpu.io import formats as iof

    cell, pts = cp
    pts = np.asarray(pts, np.float64)
    traj = np.stack([pts, pts + 0.25])
    s = Structure(pts, ["Si", "Si", "Si", "Li"], cell)
    d = tmp_path_factory.mktemp("rt")
    if fmt == "xyz":
        p = d / "t.xyz"
        iof.write_xyz(p, s, traj)
        s2, t2 = iof.read_xyz(p, index="all")
    elif fmt == "lammps":
        p = d / "t.lammpstrj"
        iof.write_lammps_dump(p, s, traj)
        s2, t2 = iof.read_lammps_dump(p)
    else:
        p = d / "XDATCAR"
        iof.write_xdatcar(p, s, traj)
        s2, t2 = iof.read_xdatcar(p)
    np.testing.assert_allclose(s2.cell, cell, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), traj, atol=2e-5)
    np.testing.assert_array_equal(s2.species, s.species)


# ---------------------------------------------------------------------------
# jump statistics vs an independent Python oracle
# ---------------------------------------------------------------------------

F, M, S = 20, 3, 4          # FIXED shapes: one compile per policy


def _oracle(traj, S, policy):
    """Reference-semantics jump scan, written independently of ops/jumps.py
    (per-ion Python state machine, no vectorization)."""
    Fn, Mn = traj.shape
    n_ij = np.zeros((S, S), np.int64)
    lag = np.zeros((S, S), np.int64)
    res_sum = np.zeros(S, np.int64)
    res_cnt = np.zeros(S, np.int64)
    occ = np.zeros(S, np.int64)
    last = [-1] * Mn
    res = [0] * Mn
    for f in range(Fn):
        for m in range(Mn):
            s = int(traj[f, m])
            if s >= 0:
                occ[s] += 1
                if last[m] >= 0 and s != last[m]:
                    n_ij[last[m], s] += 1
                    lag[last[m], s] += res[m]
                    res_sum[last[m]] += res[m]
                    res_cnt[last[m]] += 1
                    res[m] = 1
                elif last[m] == s:
                    res[m] += 1
                else:
                    res[m] = 1
                last[m] = s
            elif policy == "break":
                last[m] = -1
                res[m] = 0
    return n_ij, lag, res_sum, res_cnt, occ, np.array(last), np.array(res)


traj_arrays = st.lists(st.integers(-1, S - 1), min_size=F * M,
                       max_size=F * M).map(
    lambda v: np.asarray(v, np.int32).reshape(F, M))


@settings(**SETTINGS)
@given(traj_arrays, st.sampled_from(["persist", "break"]))
def test_jump_stats_matches_oracle(traj, policy):
    want = _oracle(traj, S, policy)
    got = jump_stats(jnp.asarray(traj), S, unknown_policy=policy)
    np.testing.assert_array_equal(np.asarray(got.n_ij), want[0])
    np.testing.assert_array_equal(np.asarray(got.lag_sum), want[1])
    np.testing.assert_array_equal(np.asarray(got.res_sum), want[2])
    np.testing.assert_array_equal(np.asarray(got.res_cnt), want[3])
    np.testing.assert_array_equal(np.asarray(got.occ_counts), want[4])
    np.testing.assert_array_equal(np.asarray(got.last_sites), want[5])
    np.testing.assert_array_equal(np.asarray(got.last_res), want[6])


@settings(**SETTINGS)
@given(traj_arrays, st.sampled_from(["persist", "break"]),
       st.sets(st.integers(1, F - 1), max_size=4))
def test_jump_stats_block_chaining_invariance(traj, policy, cuts):
    """Splitting the trajectory at ARBITRARY frame boundaries and chaining
    the (last, res) carry must reproduce the unsplit scan exactly — the
    invariant the streaming engine's cross-block carry rests on."""
    bounds = [0] + sorted(cuts) + [F]
    last = res = None
    acc = None
    for a, b in zip(bounds[:-1], bounds[1:]):
        got = jump_stats(jnp.asarray(traj[a:b]), S, init_last=last,
                         init_res=res, unknown_policy=policy)
        last = got.last_sites
        res = got.last_res
        part = {k: np.asarray(got[k]).astype(np.int64)
                for k in ("n_ij", "lag_sum", "res_sum", "res_cnt",
                          "occ_counts")}
        acc = part if acc is None else {k: acc[k] + part[k] for k in acc}
    whole = jump_stats(jnp.asarray(traj), S, unknown_policy=policy)
    for k in acc:
        np.testing.assert_array_equal(acc[k], np.asarray(whole[k]),
                                      err_msg=k)
    np.testing.assert_array_equal(np.asarray(last),
                                  np.asarray(whole.last_sites))
    np.testing.assert_array_equal(np.asarray(res),
                                  np.asarray(whole.last_res))


@settings(**SETTINGS)
@given(traj_arrays, st.sampled_from(["persist", "break"]))
def test_jump_stats_exact_agrees(traj, policy):
    """The int64-exact path (any block size) equals the int32 scan on
    non-hazardous inputs."""
    a = jump_stats(jnp.asarray(traj), S, unknown_policy=policy)
    b = jump_stats_exact(traj, S, unknown_policy=policy, block_frames=7)
    for k in ("n_ij", "lag_sum", "res_sum", "res_cnt", "occ_counts"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


# ---------------------------------------------------------------------------
# kinetics ops: MSD / unwrap / RDF invariants
# ---------------------------------------------------------------------------

@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 25})
def test_msd_fft_equals_brute_force_property(data):
    """The FFT identity equals the O(F^2) time-origin average for
    arbitrary trajectories (any F, including odd and tiny)."""
    from sitator_tpu.ops.msd import msd_fft
    F = data.draw(st.integers(2, 40))
    N = data.draw(st.integers(1, 4))
    flat = data.draw(st.lists(
        st.floats(-50, 50, allow_nan=False, width=32),
        min_size=F * N * 3, max_size=F * N * 3))
    pos = np.asarray(flat, np.float64).reshape(F, N, 3)
    msd, per_atom = msd_fft(pos)
    brute = np.zeros(F)
    for m in range(1, F):
        d = pos[m:] - pos[:-m]
        brute[m] = (d ** 2).sum(-1).mean()
    np.testing.assert_allclose(msd, brute, rtol=1e-8, atol=1e-6)


@given(data=st.data(), cell=triclinic_cells())
@settings(**{**SETTINGS, "max_examples": 25})
def test_unwrap_inverts_wrapping_property(data, cell):
    """Any continuous path with sub-half-cell steps survives
    wrap -> unwrap exactly (up to the frame-0 image offset)."""
    from sitator_tpu.ops.msd import unwrap_trajectory
    F, N = 30, 2
    # steps bounded well inside the minimum-image radius of this cell
    h = 1.0 / np.linalg.norm(np.linalg.inv(cell), axis=0).min()
    flat = data.draw(st.lists(
        st.floats(-0.25, 0.25, allow_nan=False, width=32),
        min_size=(F - 1) * N * 3, max_size=(F - 1) * N * 3))
    steps = np.asarray(flat, np.float64).reshape(F - 1, N, 3) * (h / 4)
    truth = np.concatenate([np.zeros((1, N, 3)),
                            np.cumsum(steps, axis=0)], axis=0)
    frac = truth @ np.linalg.inv(cell)
    wrapped = (frac - np.floor(frac)) @ cell
    un = unwrap_trajectory(wrapped, cell)
    shift = truth[0] - un[0]
    np.testing.assert_allclose(un + shift, truth, atol=1e-7)


@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 15})
def test_rdf_rotation_invariance_property(data):
    """g(r) is invariant under a rigid rotation of cell + positions."""
    from scipy.spatial.transform import Rotation
    from sitator_tpu.ops.correlation import rdf
    cell = np.diag([7.0, 8.0, 9.0])
    flat = data.draw(st.lists(
        st.floats(0.0, 1.0, allow_nan=False, width=32,
                  exclude_max=True),
        min_size=2 * 12 * 3, max_size=2 * 12 * 3))
    frac = np.asarray(flat, np.float64).reshape(2, 12, 3)
    traj = frac @ cell
    seed = data.draw(st.integers(0, 2 ** 16))
    R = Rotation.random(rng=np.random.default_rng(seed)).as_matrix()
    mask = np.ones(12, bool)
    r1, g1 = rdf(traj, cell, mask, r_max=3.0, n_bins=12)
    r2, g2 = rdf(traj @ R.T, cell @ R.T, mask, r_max=3.0, n_bins=12)
    # f32 distances may jitter counts across bin edges; compare with a
    # one-count tolerance in the un-normalized domain
    shells = 4 / 3 * np.pi * np.diff(np.linspace(0, 3.0, 13) ** 3)
    norm = 2 * 12 * 11 * shells / abs(np.linalg.det(cell))
    np.testing.assert_allclose(g1 * norm, g2 * norm, atol=2.0)


# ---------------------------------------------------------------------------
# site matching and residence segmentation properties
# ---------------------------------------------------------------------------

@given(data=st.data(), cell=triclinic_cells())
@settings(**{**SETTINGS, "max_examples": 25})
def test_match_sites_recovers_permutation_property(data, cell):
    """A permuted + sub-separation-jittered + rewrapped copy of any
    center set is matched by the inverse permutation."""
    from sitator_tpu import SiteNetwork
    from sitator_tpu.core.structure import Structure
    from sitator_tpu.network import match_sites, min_image_distance_matrix

    S = 8
    # centers on a fractional grid (guaranteed separation), then jitter
    frac = (np.stack(np.meshgrid([0.1, 0.6], [0.15, 0.65], [0.2, 0.7],
                                 indexing="ij"), -1).reshape(-1, 3))
    centers = frac @ cell
    D = min_image_distance_matrix(centers, centers, cell)
    np.fill_diagonal(D, np.inf)
    sep = D.min()
    perm = np.asarray(data.draw(st.permutations(range(S))))
    jit_flat = data.draw(st.lists(
        st.floats(-1.0, 1.0, allow_nan=False, width=32),
        min_size=3 * S, max_size=3 * S))
    jitter = np.asarray(jit_flat, np.float64).reshape(S, 3)
    # bound each jitter VECTOR's norm by 0.2*sep (< sep/2 guarantees the
    # optimal matching is the identity pairing)
    jitter *= 0.2 * sep / max(1e-9,
                              np.linalg.norm(jitter, axis=1).max())
    moved = centers[perm] + jitter
    # rewrap into the cell (matching must be wrap-invariant)
    f = moved @ np.linalg.inv(cell)
    moved = (f - np.floor(f)) @ cell

    def _net(c):
        structure = Structure(np.zeros((1, 3)), [16], cell)
        sn = SiteNetwork(structure, np.ones(1, bool), np.zeros(1, bool))
        sn.centers = c
        return sn

    mapping, dists = match_sites(_net(centers), _net(moved))
    np.testing.assert_array_equal(mapping, np.argsort(perm))
    assert np.nanmax(dists) <= 0.21 * sep


@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 40})
def test_residence_segments_match_bruteforce_property(data):
    """Run-length segmentation with censoring equals a direct per-ion
    Python scan, for arbitrary label arrays including -1 runs."""
    from sitator_tpu.dynamics.residence import residence_segments

    F = data.draw(st.integers(2, 40))
    M = data.draw(st.integers(1, 3))
    n_sites = 3
    flat = data.draw(st.lists(st.integers(-1, n_sites - 1),
                              min_size=F * M, max_size=F * M))
    labels = np.asarray(flat, np.int64).reshape(F, M)

    def oracle(labels):
        segs = [[] for _ in range(n_sites)]
        for m in range(labels.shape[1]):
            lab = labels[:, m].copy()
            # persist fill
            last = -1
            for t in range(len(lab)):
                if lab[t] >= 0:
                    last = lab[t]
                else:
                    lab[t] = last
            runs = []
            t = 0
            while t < len(lab):
                u = t
                while u < len(lab) and lab[u] == lab[t]:
                    u += 1
                runs.append((lab[t], u - t))
                t = u
            for k in range(1, len(runs) - 1):
                s, n = runs[k]
                if s >= 0 and runs[k - 1][0] >= 0 and runs[k + 1][0] >= 0:
                    segs[s].append(n)
        return segs

    got = residence_segments(labels, unknown_policy="persist")
    want = oracle(labels)
    got += [np.empty(0, np.int64)] * (n_sites - len(got))
    for s in range(n_sites):
        np.testing.assert_array_equal(np.sort(got[s]), np.sort(want[s]),
                                      err_msg=f"site {s}")


@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 30})
def test_mfpt_kemeny_constant_property(data):
    """For ANY ergodic chain, sum_j pi_j * M[i, j] is independent of the
    start site i (the Kemeny constant) — a sharp identity of the
    fundamental-matrix MFPT computation."""
    from sitator_tpu.dynamics.kmc import (KineticMonteCarlo,
                                          mean_first_passage_times)
    S = data.draw(st.integers(2, 6))
    flat = data.draw(st.lists(st.floats(0.0625, 1.0, width=32),
                              min_size=S * S, max_size=S * S))
    P = np.asarray(flat, np.float64).reshape(S, S)
    P = P / P.sum(axis=1, keepdims=True)   # strictly positive => ergodic
    M = mean_first_passage_times(P)
    pi = KineticMonteCarlo._stationary(P)
    kemeny = M @ pi                         # (S,) of identical values
    np.testing.assert_allclose(kemeny, kemeny[0], rtol=1e-8)
    # sanity: diagonal zero, off-diagonal positive and finite
    assert (np.diag(M) == 0).all()
    off = ~np.eye(S, dtype=bool)
    assert (M[off] > 0).all() and np.isfinite(M[off]).all()


@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 30})
def test_vacancy_complement_invariant_property(data):
    """For ANY label array: in every frame the tracked vacancy sites are
    exactly the complement of the occupied sites (strict policy), each
    listed once, and identity columns never change site without the
    site being vacant."""
    from sitator_tpu import SiteNetwork
    from sitator_tpu.core.sitetraj import SiteTrajectory
    from sitator_tpu.core.structure import Structure
    from sitator_tpu.dynamics import VacancyAnalysis

    S, M = 8, 5
    F = data.draw(st.integers(2, 20))
    flat = data.draw(st.lists(st.integers(-1, S - 1),
                              min_size=F * M, max_size=F * M))
    labels = np.asarray(flat, np.int64).reshape(F, M)
    # guarantee at least one vacancy exists somewhere (M < S already
    # guarantees it per frame)
    structure = Structure(np.zeros((M + 1, 3)), [16] + [3] * M,
                          np.eye(3) * 11.0)
    mask = np.zeros(M + 1, bool)
    mask[0] = True
    sn = SiteNetwork(structure, mask, ~mask)
    sn.centers = np.random.default_rng(0).uniform(0, 11, (S, 3))
    va = VacancyAnalysis(unknown_policy="strict", verbose=False)
    vt = va.run(SiteTrajectory(sn, labels))
    out = vt.traj
    for f in range(F):
        occupied = set(labels[f][labels[f] >= 0].tolist())
        expect = set(range(S)) - occupied
        tracked = out[f][out[f] >= 0].tolist()
        assert len(tracked) == len(set(tracked))      # one slot per site
        assert set(tracked) == expect
    assert va.n_vacancies_.tolist() == [S - len(set(
        labels[f][labels[f] >= 0].tolist())) for f in range(F)]


@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 25})
def test_msd_tensor_trace_and_psd_property(data):
    """For arbitrary trajectories the covariance tensor is symmetric,
    its trace equals the scalar MSD, and every lag's tensor is positive
    semidefinite (it is an average of outer products)."""
    from sitator_tpu.ops.msd import msd_fft, msd_tensor_fft
    F = data.draw(st.integers(2, 30))
    N = data.draw(st.integers(1, 3))
    flat = data.draw(st.lists(
        st.floats(-50, 50, allow_nan=False, width=32),
        min_size=F * N * 3, max_size=F * N * 3))
    pos = np.asarray(flat, np.float64).reshape(F, N, 3)
    T, trace_pa = msd_tensor_fft(pos, per_atom_trace=True)
    msd, per_atom = msd_fft(pos)
    np.testing.assert_allclose(T, np.swapaxes(T, 1, 2), rtol=0, atol=0)
    np.testing.assert_allclose(np.trace(T, axis1=1, axis2=2), msd,
                               rtol=1e-8, atol=1e-6)
    np.testing.assert_allclose(trace_pa, per_atom, rtol=1e-8, atol=1e-6)
    # PSD up to FFT cancellation noise: the S1−2·S2 identity subtracts
    # terms of magnitude ~max|pos|², so the noise floor is absolute in
    # that scale (NOT relative to max|T|, which itself collapses to the
    # noise for constant trajectories).
    tol = 1e-12 * max(float(np.abs(pos).max()) ** 2, 1.0) * F
    for m in range(F):
        evals = np.linalg.eigvalsh(T[m])
        assert evals.min() > -tol, (m, evals)


@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 25})
def test_cross_msd_bilinear_and_cauchy_schwarz_property(data):
    """cross_msd is symmetric, cross(x,x) is the MSD of x, and every
    lag obeys |C_ab| <= sqrt(C_aa C_bb) (Cauchy–Schwarz over the
    origin average)."""
    from sitator_tpu.ops.msd import cross_msd_fft
    F = data.draw(st.integers(2, 40))
    flat = data.draw(st.lists(
        st.floats(-30, 30, allow_nan=False, width=32),
        min_size=F * 6, max_size=F * 6))
    arr = np.asarray(flat, np.float64).reshape(2, F, 3)
    xa, xb = arr
    c_ab = cross_msd_fft(xa, xb)
    c_aa = cross_msd_fft(xa, xa)
    c_bb = cross_msd_fft(xb, xb)
    np.testing.assert_allclose(c_ab, cross_msd_fft(xb, xa), rtol=1e-10,
                               atol=1e-10)
    assert (c_aa >= -1e-8).all() and (c_bb >= -1e-8).all()
    slack = 1e-7 * (1 + np.abs(c_aa) + np.abs(c_bb))
    assert (np.abs(c_ab) <= np.sqrt(np.maximum(c_aa, 0)
                                    * np.maximum(c_bb, 0)) + slack).all()


@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 20})
def test_density_modes_parseval_property(data):
    """rho_q invariants for arbitrary positions: |rho_q| <= N for every
    mode, rho at n and at -n are conjugates (checked via a doubled call),
    and lattice-translation invariance of |rho_q|."""
    from sitator_tpu.ops.scattering import (allowed_wavevectors,
                                            collective_density_modes)
    cell = data.draw(triclinic_cells())
    N = data.draw(st.integers(1, 6))
    flat = data.draw(st.lists(
        st.floats(-20, 20, allow_nan=False, width=32),
        min_size=N * 3, max_size=N * 3))
    pos = np.asarray(flat, np.float64).reshape(1, N, 3)
    n, q, mag = allowed_wavevectors(cell, q_max=3.0)
    if len(n) == 0:
        return
    mask = np.ones(N, bool)
    rho = collective_density_modes(pos, cell, mask, n)[0]
    assert (np.abs(rho) <= N + 1e-3 * N).all()
    neg = collective_density_modes(pos, cell, mask, -n)[0]
    np.testing.assert_allclose(neg, np.conj(rho), atol=2e-3 * N)
    # translating every atom by a lattice vector leaves rho unchanged
    shift = data.draw(st.tuples(*[st.integers(-2, 2)] * 3))
    pos2 = pos + np.asarray(shift, np.float64) @ cell
    rho2 = collective_density_modes(pos2, cell, mask, n)[0]
    np.testing.assert_allclose(rho2, rho, atol=2e-3 * N)


@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 20})
def test_density_grid_properties(data):
    """For arbitrary positions: counts conserve F*M, disjoint masks add
    (grid(a) + grid(b) == grid(a|b)), and integer-lattice translations
    leave the periodic grid's multiset of counts invariant (the grid
    itself rolls)."""
    from sitator_tpu.ops.density import density_grid
    F = data.draw(st.integers(1, 12))
    N = data.draw(st.integers(2, 6))
    n_bins = data.draw(st.sampled_from([2, 4, 8]))
    cell = np.diag(data.draw(st.lists(
        st.floats(4.0, 20.0), min_size=3, max_size=3)))
    # positions at bin centers (arbitrary periodic images): binning is
    # float32, so a point *at* a bin seam may legally land either side
    # under translation — keep the property exact by staying off seams
    bins = data.draw(st.lists(st.integers(-3 * n_bins, 4 * n_bins),
                              min_size=F * N * 3, max_size=F * N * 3))
    frac = (np.asarray(bins, np.float64).reshape(F, N, 3) + 0.5) / n_bins
    pos = frac * np.diag(cell)
    grid = np.asarray(density_grid(pos, cell, n_bins=n_bins))
    assert grid.sum() == F * N
    mask_a = np.zeros(N, bool)
    mask_a[: N // 2] = True
    ga = np.asarray(density_grid(pos, cell, mask=mask_a, n_bins=n_bins))
    gb = np.asarray(density_grid(pos, cell, mask=~mask_a,
                                 n_bins=n_bins))
    if mask_a.any():
        np.testing.assert_array_equal(ga + gb, grid)
    shift_bins = data.draw(st.integers(0, n_bins - 1))
    shift = np.array([shift_bins * cell[0, 0] / n_bins, 0.0, 0.0])
    rolled = np.asarray(density_grid(pos + shift, cell, n_bins=n_bins))
    np.testing.assert_array_equal(
        rolled, np.roll(grid, shift_bins, axis=0))


@given(data=st.data())
@settings(**{**SETTINGS, "max_examples": 20,
             "suppress_health_check": [
                 hyp.HealthCheck.too_slow,
                 hyp.HealthCheck.large_base_example]})
def test_density_peak_nms_invariants(data):
    """For arbitrary smooth fields: returned peaks are pairwise at
    least min_distance apart (minimum image), sorted strongest-first,
    and every returned weight exceeds the relative threshold."""
    from sitator_tpu.network.compare import min_image_distance_matrix
    from sitator_tpu.ops.density import find_density_peaks, smooth_density
    n = 6
    cell = np.diag(data.draw(st.lists(st.floats(5.0, 15.0),
                                      min_size=3, max_size=3)))
    flat = data.draw(st.lists(
        st.floats(0.0, 10.0, allow_nan=False, width=32),
        min_size=n ** 3, max_size=n ** 3))
    grid = smooth_density(
        np.asarray(flat, np.float64).reshape(n, n, n), cell, 0.6)
    thr = data.draw(st.floats(0.01, 0.5))
    mind = data.draw(st.floats(0.5, 4.0))
    centers, weights = find_density_peaks(grid, cell,
                                          threshold_rel=thr,
                                          min_distance=mind)
    if len(centers) == 0:
        return
    assert (np.diff(weights) <= 1e-12).all()      # strongest first
    assert (weights > thr * grid.max() - 1e-9).all()
    if len(centers) > 1:
        D = min_image_distance_matrix(centers, centers, cell)
        np.fill_diagonal(D, np.inf)
        assert D.min() >= mind - 1e-9
