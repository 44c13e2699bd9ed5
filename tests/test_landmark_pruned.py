"""Spatially-pruned fused kernel vs the XLA formulation (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sitator_tpu.ops import landmark as lmops
from sitator_tpu.ops.landmark_pallas_pruned import (
    prepare_pruned_sites,
    pruned_assign_blocks,
)


def _sc_system(n_cells=4, B=3, n_ions=6, seed=3, K=24):
    """SC cage system with analytic vertex sets (ions near sites)."""
    import __graft_entry__ as g
    mobile, static, verts, vmask, cell, n_static = g._example_system(
        n_cells=n_cells, n_frames=B, n_ions=n_ions, seed=seed)
    grid = np.stack(np.meshgrid(*[np.arange(n_cells)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    site_pos = (grid + 0.5) * 4.0
    site_rad = np.full(len(site_pos), 4.0 * np.sqrt(3) / 2)
    rng = np.random.default_rng(1)
    centers = np.abs(rng.random((K, verts.shape[0]))).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    return mobile, static, verts, vmask, cell, n_static, site_pos, \
        site_rad, centers


def _xla_ref(mobile, static, verts, vmask, cell, n_static, centers, thr):
    A = lmops.vertex_membership_matrix(verts, vmask, n_static)
    lv = lmops.landmark_vectors(
        jnp.asarray(mobile), jnp.asarray(static), A, jnp.asarray(cell),
        jnp.asarray(np.linalg.inv(cell), jnp.float32), 4.0, 3.0)
    lvn, _ = lmops.normalize_landmark_vectors(lv)
    return lmops.assign_to_centers(lvn, jnp.asarray(centers),
                                   jnp.ones(len(centers), bool), thr)


@pytest.mark.parametrize("prune", [False, True])
def test_pruned_kernel_matches_xla(prune):
    (mobile, static, verts, vmask, cell, n_static, site_pos, site_rad,
     centers) = _sc_system()
    cell_diag = np.diag(cell).astype(np.float32)
    want_lab, want_conf = _xla_ref(mobile, static, verts, vmask, cell,
                                   n_static, centers, 0.1)
    prep = prepare_pruned_sites(verts, vmask, centers, site_pos, site_rad,
                                cell_diag, s_tile=128, bins_per_axis=4)
    lab, conf = pruned_assign_blocks(
        jnp.asarray(mobile), jnp.asarray(static), prep,
        jnp.asarray(cell_diag), midpoint=4.0, steepness=3.0, threshold=0.1,
        m_tile=128, bins_per_axis=4, interpret=True, prune=prune)
    np.testing.assert_array_equal(np.asarray(want_lab), np.asarray(lab))
    np.testing.assert_allclose(np.asarray(want_conf), np.asarray(conf),
                               atol=2e-3)  # bf16 similarity matmul


def test_pruned_tile_bounds_cover_sites():
    """Tile bounding spheres must contain every member site (plus its node
    radius) — the safety invariant the pruning skip relies on.  (Whether
    pruning actually skips pairs depends on cell size vs the truncation
    radius; exactness under skipping is covered above.)"""
    (mobile, static, verts, vmask, cell, n_static, site_pos, site_rad,
     centers) = _sc_system(n_cells=6, B=1, n_ions=4, K=8)
    cell_diag = np.diag(cell).astype(np.float32)
    s_tile = 128
    prep = prepare_pruned_sites(verts, vmask, centers, site_pos, site_rad,
                                cell_diag, s_tile=s_tile, bins_per_axis=6)
    order = prep["site_order"]
    pos_s = site_pos[order]
    rad_s = site_rad[order]
    tc = np.asarray(prep["tile_center"])
    tr = np.asarray(prep["tile_rad"])
    for t in range(prep["n_st"]):
        lo, hi = t * s_tile, min((t + 1) * s_tile, len(pos_s))
        if lo >= len(pos_s):
            continue
        d = pos_s[lo:hi] - tc[t]
        d -= np.round(d / cell_diag) * cell_diag
        dist = np.sqrt((d * d).sum(1)) + rad_s[lo:hi]
        assert (dist <= tr[t] + 1e-6).all()


def test_pruned_sites_permutation_consistency():
    """Site sorting permutes centers columns consistently: cluster labels
    must be identical to the unsorted XLA reference (labels index cluster
    rows, which are never permuted)."""
    (mobile, static, verts, vmask, cell, n_static, site_pos, site_rad,
     centers) = _sc_system(seed=11)
    cell_diag = np.diag(cell).astype(np.float32)
    prep = prepare_pruned_sites(verts, vmask, centers, site_pos, site_rad,
                                cell_diag, s_tile=128, bins_per_axis=4)
    order = prep["site_order"]
    # the permutation really is a permutation
    assert sorted(order.tolist()) == list(range(len(site_pos)))
    np.testing.assert_allclose(np.asarray(prep["centers"]),
                               centers[:, order])
