"""Direct contract tests for the public symbols a round-5 API-vs-tests
audit found exercised only indirectly (through the engines that consume
them): the MSD helpers (``drift_curve``, ``fit_diffusivity``,
``lag_statistics``), ``forward_fill_labels``, ``cell_to_parameters``,
``bv_mismatch_grid``, the kernel-side helpers (``pack_cell_params`` /
``load_cell_params`` round trip, ``min_image_xyz``, ``merge_top2``,
``prepare_vertex_planes``), the SOAP per-environment entry points
(``soap_descriptors_env``, ``radial_smearing_table``), the meshed
``mxu_analysis_step``, and the attribute-dict result types
(``JumpStats``, ``ClusterResult``)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sitator_tpu.core.sitetraj import forward_fill_labels
from sitator_tpu.core.structure import cell_to_parameters
from sitator_tpu.ops.cluster import ClusterResult
from sitator_tpu.ops.jumps import JumpStats
from sitator_tpu.ops.kernel_common import (
    load_cell_params,
    merge_top2,
    min_image_xyz,
    pack_cell_params,
)


# ---------------------------------------------------------------- MSD ops

def test_drift_curve_recovers_rigid_translation():
    from sitator_tpu.ops.msd import drift_curve
    rng = np.random.default_rng(0)
    cell = np.diag([8.0, 9.0, 10.0])
    base = rng.uniform(0, 8, (12, 3))
    v = np.array([0.03, -0.05, 0.02])
    F = 40
    traj = base[None] + np.arange(F)[:, None, None] * v[None, None]
    # wrap into the cell: drift_curve must unwrap internally
    frac = traj @ np.linalg.inv(cell)
    wrapped = (frac - np.floor(frac)) @ cell
    d = drift_curve(wrapped, cell)
    np.testing.assert_allclose(d, np.arange(F)[:, None] * v[None],
                               atol=1e-9)
    # mask selecting a subgroup sees only that subgroup's (same) drift
    mask = np.zeros(12, bool)
    mask[:5] = True
    d_sub = drift_curve(wrapped, cell, mask=mask)
    np.testing.assert_allclose(d_sub, d, atol=1e-9)


def test_drift_curve_mask_validation():
    from sitator_tpu.ops.msd import drift_curve
    traj = np.zeros((3, 4, 3))
    with pytest.raises(ValueError, match="mask must be"):
        drift_curve(traj, np.eye(3) * 5, mask=np.ones(3, bool))
    with pytest.raises(ValueError, match="selects no atoms"):
        drift_curve(traj, np.eye(3) * 5, mask=np.zeros(4, bool))


def test_fit_diffusivity_exact_linear():
    from sitator_tpu.ops.msd import fit_diffusivity
    t = np.linspace(0.0, 10.0, 101)
    D_true, c_true, dim = 0.7, 0.3, 3
    msd = 2 * dim * D_true * t + c_true
    D, c = fit_diffusivity(t, msd, dim=dim)
    assert D == pytest.approx(D_true, rel=1e-12)
    assert c == pytest.approx(c_true, rel=1e-9)
    # dim rescales the slope-to-D conversion
    D2, _ = fit_diffusivity(t, msd, dim=1)
    assert D2 == pytest.approx(3 * D_true, rel=1e-12)


def test_lag_statistics_deterministic_displacements():
    from sitator_tpu.ops.msd import lag_statistics
    # constant-velocity atoms: |dr(lag)| is a single magnitude, so
    # <r^4> = <r^2>^2 exactly and alpha2 = 3/5 - 1 = -0.4
    v = np.array([[0.1, 0.0, 0.0], [0.0, 0.2, 0.0]])
    F = 30
    pos = np.arange(F)[:, None, None] * v[None]
    lags = [1, 5, 10]
    q = 2.0
    m2, m4, alpha2, fs = lag_statistics(pos, lags, q=q)
    speeds2 = (v ** 2).sum(axis=1)
    for k, lag in enumerate(lags):
        r2 = lag ** 2 * speeds2
        assert m2[k] == pytest.approx(r2.mean(), rel=1e-12)
        assert m4[k] == pytest.approx((r2 ** 2).mean(), rel=1e-12)
        want_fs = np.mean(np.sin(q * np.sqrt(r2)) / (q * np.sqrt(r2)))
        assert fs[k] == pytest.approx(want_fs, rel=1e-12)
    # single-magnitude displacement per atom pair -> alpha2 from moments
    want_a2 = 3 * m4 / (5 * m2 ** 2) - 1
    np.testing.assert_allclose(alpha2, want_a2, rtol=1e-12)
    # without q, fs is None; bad q raises
    assert lag_statistics(pos, lags)[3] is None
    with pytest.raises(ValueError, match="q must be positive"):
        lag_statistics(pos, lags, q=0.0)


# --------------------------------------------------- label forward fill

def test_forward_fill_labels_policies():
    labels = np.array([[-1, 2], [3, -1], [-1, -1], [4, 5]])
    out = forward_fill_labels(labels)
    np.testing.assert_array_equal(out, [[-1, 2], [3, 2], [3, 2], [4, 5]])
    assert out.dtype == np.int64
    out_first = forward_fill_labels(labels, leading="first")
    np.testing.assert_array_equal(out_first,
                                  [[3, 2], [3, 2], [3, 2], [4, 5]])
    # input is never mutated
    np.testing.assert_array_equal(labels[0], [-1, 2])
    with pytest.raises(ValueError, match="no assigned site"):
        forward_fill_labels(np.array([[-1, 1], [-1, 2]]), leading="first")
    with pytest.raises(ValueError, match="leading must be"):
        forward_fill_labels(labels, leading="backfill")


# ------------------------------------------------------- cell parameters

def test_cell_to_parameters_known_cell():
    # hexagonal-ish: a = b = 4, c = 6, gamma = 120 deg
    cell = np.array([[4.0, 0.0, 0.0],
                     [-2.0, 2 * np.sqrt(3.0), 0.0],
                     [0.0, 0.0, 6.0]])
    a, b, c, alpha, beta, gamma = cell_to_parameters(cell)
    assert (a, b, c) == pytest.approx((4.0, 4.0, 6.0))
    assert (alpha, beta, gamma) == pytest.approx((90.0, 90.0, 120.0))


# -------------------------------------------------------- bond valence

def test_bv_mismatch_grid_minimum_at_ideal_shell():
    from sitator_tpu.ops.bondvalence import bv_mismatch_grid
    # one anion at the origin of a big cubic cell: V(r) = exp((r0-r)/b),
    # so |V - v_ideal| -> 0 on the shell r* = r0 - b ln(v_ideal)
    cell = np.eye(3) * 12.0
    anions = np.zeros((1, 3))
    r0, v_ideal, b = 1.8, 0.5, 0.37
    r_star = r0 - b * np.log(v_ideal)
    grid = bv_mismatch_grid(anions, r0, cell, v_ideal, n_bins=32, b=b)
    assert grid.shape == (32, 32, 32)
    best = np.unravel_index(np.argmin(grid), grid.shape)
    d_at_best = np.linalg.norm(
        ((np.array(best) + 0.5) / 32 * 12.0 + 6.0) % 12.0 - 6.0)
    assert d_at_best == pytest.approx(r_star, abs=12.0 / 32)
    with pytest.raises(ValueError, match="n_bins"):
        bv_mismatch_grid(anions, r0, cell, v_ideal, n_bins=1)
    with pytest.raises(ValueError, match="no anions"):
        bv_mismatch_grid(np.zeros((0, 3)), r0, cell, v_ideal)


# ------------------------------------------- kernel-side shared helpers

def test_pack_load_cell_params_roundtrip_orthorhombic():
    params, triclinic = pack_cell_params(
        jnp.asarray([8.0, 9.0, 10.0]), jnp.asarray([4.0, 3.0, 0.35]))
    assert not triclinic
    cell, mid, steep, thr = load_cell_params(np.asarray(params), False)
    assert tuple(float(x) for x in cell) == (8.0, 9.0, 10.0)
    assert (float(mid), float(steep), float(thr)) == pytest.approx(
        (4.0, 3.0, 0.35))


def test_pack_load_cell_params_roundtrip_triclinic():
    C = np.array([[8.0, 0, 0], [1.0, 9.0, 0], [0.5, 0.3, 10.0]],
                 np.float32)
    params, triclinic = pack_cell_params(jnp.asarray(C),
                                         jnp.asarray([4.0, 3.0, 0.35]))
    assert triclinic
    (rows, inv), mid, steep, thr = load_cell_params(np.asarray(params),
                                                    True)
    np.testing.assert_allclose(np.asarray(rows).reshape(3, 3), C)
    np.testing.assert_allclose(np.asarray(inv).reshape(3, 3),
                               np.linalg.inv(C), rtol=1e-6)
    assert (float(mid), float(steep), float(thr)) == pytest.approx(
        (4.0, 3.0, 0.35))


@pytest.mark.parametrize("triclinic", [False, True])
def test_min_image_xyz_matches_fractional_roundtrip(triclinic):
    rng = np.random.default_rng(3)
    C = (np.array([[8.0, 0, 0], [1.5, 9.0, 0], [0.7, -0.4, 10.0]])
         if triclinic else np.diag([8.0, 9.0, 10.0]))
    d = rng.uniform(-25, 25, (50, 3))
    if triclinic:
        cell_arg = (tuple(np.float32(C.ravel())),
                    tuple(np.float32(np.linalg.inv(C).ravel())))
    else:
        cell_arg = tuple(np.float32(np.diag(C)))
    dx, dy, dz = min_image_xyz(jnp.asarray(d[:, 0], jnp.float32),
                               jnp.asarray(d[:, 1], jnp.float32),
                               jnp.asarray(d[:, 2], jnp.float32),
                               cell_arg, triclinic)
    got = np.stack([np.asarray(dx), np.asarray(dy), np.asarray(dz)],
                   axis=1)
    f = d @ np.linalg.inv(C)
    want = (f - np.round(f)) @ C
    np.testing.assert_allclose(got, want, atol=2e-4)


class _RefStandin:
    """Pallas-Ref-like wrapper over a numpy array: reads return COPIES
    (a Pallas ``ref[...]`` read is a value, not a view — a bare numpy
    array would alias writes back into previously-read values)."""

    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, key):
        return jnp.asarray(self.arr[key])

    def __setitem__(self, key, value):
        self.arr[key] = np.asarray(value)


def test_merge_top2_union_and_tie_semantics():
    acc_arr = np.zeros((3, 2), np.float32)
    acc = _RefStandin(acc_arr)
    tile1 = jnp.asarray([[1.0, 3.0, 2.0],
                         [5.0, 5.0, 1.0],     # tied max: 2nd-largest IS max
                         [0.5, 0.1, 0.2]])
    merge_top2(acc, tile1)
    np.testing.assert_allclose(acc_arr, [[3, 2], [5, 5], [0.5, 0.2]])
    tile2 = jnp.asarray([[2.5, 0.0, 0.0],
                         [6.0, 0.0, 0.0],
                         [0.05, 0.0, 0.0]])
    merge_top2(acc, tile2)
    # union top-2 across both tiles
    np.testing.assert_allclose(acc_arr, [[3, 2.5], [6, 5], [0.5, 0.2]])


def test_prepare_vertex_planes_contract():
    from sitator_tpu.ops.landmark_pallas import prepare_vertex_planes
    rng = np.random.default_rng(5)
    B, N, S, V = 2, 15, 4, 3
    static = rng.normal(size=(B, N, 3)).astype(np.float32)
    verts = rng.integers(0, N, (S, V)).astype(np.int32)
    vmask = rng.random((S, V)) < 0.7
    vp, mask = prepare_vertex_planes(jnp.asarray(static),
                                     jnp.asarray(verts),
                                     jnp.asarray(vmask))
    assert vp.shape == (B, 3, V, S)
    assert mask.shape == (V, S)
    np.testing.assert_array_equal(np.asarray(mask),
                                  vmask.T.astype(np.float32))
    for s in range(S):
        for v in range(V):
            np.testing.assert_allclose(np.asarray(vp[:, :, v, s]),
                                       static[:, verts[s, v], :])


# ------------------------------------------------------------- SOAP env

def test_soap_descriptors_env_matches_shared_env():
    from sitator_tpu.site_descriptors.soap import (soap_descriptors,
                                                   soap_descriptors_env)
    rng = np.random.default_rng(7)
    cell = np.eye(3) * 10.0
    N, P = 12, 3
    positions = rng.uniform(0, 10, (N, 3)).astype(np.float32)
    species = np.array([8] * 8 + [14] * 4)
    probes = rng.uniform(2, 8, (P, 3)).astype(np.float32)
    want = soap_descriptors(probes, positions, species, cell,
                            r_cut=4.0, sigma=0.5, n_max=3, l_max=2)
    envs = np.broadcast_to(positions, (P, N, 3))
    got = soap_descriptors_env(probes, envs, species, cell,
                               r_cut=4.0, sigma=0.5, n_max=3, l_max=2)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # per-probe environments really are independent: perturbing one env
    # changes only that probe's descriptor
    envs2 = np.array(envs)
    envs2[1] += 0.37
    got2 = soap_descriptors_env(probes, envs2, species, cell,
                                r_cut=4.0, sigma=0.5, n_max=3, l_max=2)
    np.testing.assert_allclose(got2[0], got[0], atol=1e-6)
    assert np.abs(got2[1] - got[1]).max() > 1e-4
    with pytest.raises(ValueError, match="density"):
        soap_descriptors_env(probes, envs, species, cell, n_max=3,
                             l_max=2, density="lorentzian")


def test_radial_smearing_table_contract():
    from sitator_tpu.site_descriptors.soap import radial_smearing_table
    n_max, l_max, r_cut = 3, 2, 4.0
    table, dR = radial_smearing_table(r_cut, 0.5, n_max, l_max,
                                      n_grid=64, n_quad=256)
    assert table.shape == (64, n_max, l_max + 1)
    assert np.isfinite(table).all()
    assert dR == pytest.approx(r_cut / 63)
    # l>0 channels vanish at R=0 (i_l(0)=0 for l>=1); l=0 does not
    assert np.abs(table[0, :, 1:]).max() < 1e-8
    assert np.abs(table[0, :, 0]).max() > 1e-6


# ------------------------------------------------- meshed MXU step

def test_mxu_analysis_step_matches_xla_reference():
    from sitator_tpu.ops import landmark as lmops
    from sitator_tpu.ops.landmark_mxu import (permute_centers,
                                              prepare_mxu_basis)
    from sitator_tpu.ops.jumps import jump_stats
    from sitator_tpu.parallel.mesh import frame_mesh, shard_frames
    from sitator_tpu.parallel.pipeline import mxu_analysis_step

    rng = np.random.default_rng(17)
    B, M, N, S, V, K = 16, 7, 40, 20, 5, 6
    cell = np.diag([11.0, 12.0, 13.0]).astype(np.float32)
    frac = rng.random((B, M + N, 3)).astype(np.float32)
    pos = frac @ cell
    mobile, static = pos[:, :M], pos[:, M:]
    verts = np.stack([rng.choice(N, V, replace=False)
                      for _ in range(S)]).astype(np.int32)
    vmask = rng.random((S, V)) < 0.8
    vmask[:, 0] = True
    centers = rng.random((K, S)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    site_pos = static[0][verts].mean(axis=1)

    A = lmops.vertex_membership_matrix(verts, vmask, N)
    lv = lmops.landmark_vectors(
        jnp.asarray(mobile), jnp.asarray(static), A, jnp.asarray(cell),
        jnp.asarray(np.linalg.inv(cell), jnp.float32), 3.0, 4.0)
    lvn, _ = lmops.normalize_landmark_vectors(lv)
    want_lab, _ = lmops.assign_to_centers(
        lvn, jnp.asarray(centers), jnp.ones(K, bool), 0.3)
    want_stats = jump_stats(np.asarray(want_lab), K)

    basis = prepare_mxu_basis(verts, vmask, site_pos, cell, s_tile=128)
    mesh = frame_mesh()
    labels, confs, stats = mxu_analysis_step(
        mesh, shard_frames(mobile, mesh), shard_frames(static, mesh),
        {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in basis.items()},
        jnp.asarray(np.diag(cell), jnp.float32),
        jnp.asarray(permute_centers(centers, basis)),
        midpoint=3.0, steepness=4.0, threshold=0.3,
        mxu_bf16=False, interpret=True, n_sites=K)
    np.testing.assert_array_equal(np.asarray(labels),
                                  np.asarray(want_lab))
    np.testing.assert_array_equal(np.asarray(stats["n_ij"]),
                                  np.asarray(want_stats["n_ij"]))


# ----------------------------------------------- attribute result dicts

@pytest.mark.parametrize("cls", [JumpStats, ClusterResult])
def test_result_dicts_attribute_access(cls):
    r = cls(alpha=1, beta=np.arange(3))
    assert r.alpha == 1
    np.testing.assert_array_equal(r.beta, np.arange(3))
    with pytest.raises(AttributeError, match="gamma"):
        r.gamma
