"""MXU-product landmark kernel vs the XLA formulation and the gather
kernel (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sitator_tpu.ops import landmark as lmops
from sitator_tpu.ops.landmark_mxu import (
    mxu_assign_blocks,
    mxu_supported,
    permute_centers,
    prepare_mxu_basis,
)
from sitator_tpu.ops.landmark_pallas import fused_assign_blocks


def _system(rng, B=2, M=7, N=40, S=20, V=5, K=6, L=11.0, cell=None):
    if cell is None:
        cell = np.diag([L, L + 1, L + 2]).astype(np.float32)
    frac = rng.random((B, M + N, 3)).astype(np.float32)
    pos = frac @ cell
    mobile, static = pos[:, :M], pos[:, M:]
    verts = np.stack([rng.choice(N, V, replace=False)
                      for _ in range(S)]).astype(np.int32)
    vmask = rng.random((S, V)) < 0.8
    vmask[:, 0] = True
    centers = rng.random((K, S)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # site positions for Morton ordering: mean vertex position (frame 0)
    site_pos = static[0][verts].mean(axis=1)
    return cell, mobile, static, verts, vmask, centers, site_pos


def _xla_reference(cell, mobile, static, verts, vmask, centers, thr,
                   cutoff_shape="logistic", peak_evening="none"):
    A = lmops.vertex_membership_matrix(verts, vmask, static.shape[1])
    lv = lmops.landmark_vectors(
        jnp.asarray(mobile), jnp.asarray(static), A, jnp.asarray(cell),
        jnp.asarray(np.linalg.inv(cell), jnp.float32), 3.0, 4.0,
        cutoff_shape=cutoff_shape)
    lv = lmops.peak_even(lv, peak_evening)
    lvn, _ = lmops.normalize_landmark_vectors(lv)
    return lmops.assign_to_centers(lvn, jnp.asarray(centers),
                                   jnp.ones(len(centers), bool), thr)


@pytest.mark.parametrize("cutoff_shape", ["logistic", "logistic_r2"])
def test_mxu_kernel_matches_xla(rng, cutoff_shape):
    r = np.random.default_rng(11)
    cell, mobile, static, verts, vmask, centers, site_pos = _system(r)
    want_lab, want_conf = _xla_reference(cell, mobile, static, verts,
                                         vmask, centers, 0.3,
                                         cutoff_shape=cutoff_shape)
    basis = prepare_mxu_basis(verts, vmask, site_pos, cell, s_tile=128)
    got_lab, got_conf = mxu_assign_blocks(
        jnp.asarray(mobile), jnp.asarray(static), basis,
        jnp.asarray(np.diag(cell).astype(np.float32)),
        permute_centers(centers, basis), midpoint=3.0, steepness=4.0,
        threshold=0.3, mxu_bf16=False, interpret=True,
        cutoff_shape=cutoff_shape)
    np.testing.assert_array_equal(np.asarray(want_lab), np.asarray(got_lab))
    np.testing.assert_allclose(np.asarray(want_conf), np.asarray(got_conf),
                               atol=2e-5)


def test_mxu_kernel_triclinic(rng):
    r = np.random.default_rng(13)
    L = 11.0
    cell = np.array([[L, 0, 0],
                     [0.25 * L, L + 1, 0],
                     [-0.15 * L, 0.2 * L, L + 2]], np.float32)
    cell, mobile, static, verts, vmask, centers, site_pos = _system(
        r, cell=cell)
    want_lab, want_conf = _xla_reference(cell, mobile, static, verts,
                                         vmask, centers, 0.3)
    basis = prepare_mxu_basis(verts, vmask, site_pos, cell, s_tile=128)
    got_lab, got_conf = mxu_assign_blocks(
        jnp.asarray(mobile), jnp.asarray(static), basis,
        jnp.asarray(cell), permute_centers(centers, basis),
        midpoint=3.0, steepness=4.0, threshold=0.3, mxu_bf16=False,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(want_lab), np.asarray(got_lab))
    np.testing.assert_allclose(np.asarray(want_conf), np.asarray(got_conf),
                               atol=2e-5)


def test_mxu_kernel_peak_clip(rng):
    r = np.random.default_rng(17)
    cell, mobile, static, verts, vmask, centers, site_pos = _system(
        r, S=200)  # 200 sites -> 2 tiles at s_tile=128: cross-tile top-2
    want_lab, want_conf = _xla_reference(cell, mobile, static, verts,
                                         vmask, centers, 0.3,
                                         peak_evening="clip")
    basis = prepare_mxu_basis(verts, vmask, site_pos, cell, s_tile=128)
    got_lab, got_conf = mxu_assign_blocks(
        jnp.asarray(mobile), jnp.asarray(static), basis,
        jnp.asarray(np.diag(cell).astype(np.float32)),
        permute_centers(centers, basis), midpoint=3.0, steepness=4.0,
        threshold=0.3, mxu_bf16=False, interpret=True,
        peak_evening="clip")
    np.testing.assert_array_equal(np.asarray(want_lab), np.asarray(got_lab))
    np.testing.assert_allclose(np.asarray(want_conf), np.asarray(got_conf),
                               atol=2e-5)


def test_mxu_kernel_vertex_multiplicity(rng):
    """A repeated vertex index must square its factor (A multiplicity)."""
    r = np.random.default_rng(19)
    cell, mobile, static, verts, vmask, centers, site_pos = _system(r)
    verts = verts.copy()
    verts[0, 1] = verts[0, 0]  # duplicate vertex in site 0
    vmask = np.ones_like(vmask)
    want_lab, want_conf = _xla_reference(cell, mobile, static, verts,
                                         vmask, centers, 0.3)
    basis = prepare_mxu_basis(verts, vmask, site_pos, cell, s_tile=128)
    got_lab, got_conf = mxu_assign_blocks(
        jnp.asarray(mobile), jnp.asarray(static), basis,
        jnp.asarray(np.diag(cell).astype(np.float32)),
        permute_centers(centers, basis), midpoint=3.0, steepness=4.0,
        threshold=0.3, mxu_bf16=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(want_lab), np.asarray(got_lab))
    np.testing.assert_allclose(np.asarray(want_conf), np.asarray(got_conf),
                               atol=2e-5)


def test_mxu_matches_gather_kernel(rng):
    """Same labels as fused_assign_blocks (both f32, interpret)."""
    r = np.random.default_rng(23)
    cell, mobile, static, verts, vmask, centers, site_pos = _system(
        r, S=150, K=8)
    basis = prepare_mxu_basis(verts, vmask, site_pos, cell, s_tile=128)
    diag = jnp.asarray(np.diag(cell).astype(np.float32))
    la, ca = mxu_assign_blocks(
        jnp.asarray(mobile), jnp.asarray(static), basis, diag,
        permute_centers(centers, basis), midpoint=3.0, steepness=4.0,
        threshold=0.3, mxu_bf16=False, interpret=True,
        cutoff_shape="logistic_r2")
    lb, cb = fused_assign_blocks(
        jnp.asarray(mobile), jnp.asarray(static), jnp.asarray(verts),
        jnp.asarray(vmask), diag, jnp.asarray(centers),
        midpoint=3.0, steepness=4.0, threshold=0.3, s_tile=128,
        mxu_bf16=False, interpret=True, cutoff_shape="logistic_r2")
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=2e-5)


def test_mxu_supported_cost_gate():
    # SC-like shared-vertex basis: supported
    rng = np.random.default_rng(3)
    n = 64
    verts = np.stack([rng.choice(12, 5, replace=False)
                      for _ in range(n)]).astype(np.int32)  # heavy sharing
    vmask = np.ones_like(verts, dtype=bool)
    site_pos = rng.random((n, 3)) * 10
    basis = prepare_mxu_basis(verts, vmask, site_pos, np.eye(3) * 10,
                              s_tile=64)
    assert mxu_supported(basis)
    # adversarial no-sharing basis: every site its own atoms
    verts2 = np.arange(n * 5, dtype=np.int32).reshape(n, 5)
    basis2 = prepare_mxu_basis(verts2, vmask, site_pos, np.eye(3) * 10,
                               s_tile=64)
    assert not mxu_supported(basis2)
