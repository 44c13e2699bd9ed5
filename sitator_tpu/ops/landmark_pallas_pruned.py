"""Spatially-pruned fused landmark kernel — the production TPU hot path.

Physics: the logistic cutoff makes landmark contributions decay like
``exp(-steepness·d)``; beyond ``r_trunc = midpoint + LOGC_CUT/steepness``
a single vertex factor is < e^-LOGC_CUT and the whole site's landmark value
is numerically irrelevant (vertices surround their node, so ion→node
distance lower-bounds the farthest vertex distance).  Exploiting it the TPU
way (static shapes, no gathers in the kernel):

- sites are **pre-sorted into spatially compact tiles** (host, once); each
  tile carries a bounding sphere;
- ions are **sorted by spatial bin per frame** (XLA argsort) so each
  128-ion tile is compact; per-tile PBC bounding boxes come from
  segment min/max;
- an ``rel[b, s_tile, m_tile]`` mask (XLA prepass) marks tile pairs closer
  than ``r_trunc`` + margins; the kernel body runs under ``@pl.when(rel)``
  — ~97%% of tile pairs skip both the VPU distance work and the MXU
  similarity matmul;
- grid order ``(b, s_tile, m_tile)`` keeps the (S_t, K) centers tile
  resident across the inner ion loop while ONE full-M ``(M, K)``
  similarity accumulator lives in VMEM scratch, sliced per ion tile.

Labels are computed in sorted order and unsorted on the way out.  Dropped
contributions are bounded by e^-LOGC_CUT per factor — orders of magnitude
below the assignment threshold's sensitivity.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sitator_tpu.ops.kernel_common import (load_cell_params, min_image_xyz,
                                           round_up as _round_up)
from sitator_tpu.ops.landmark_pallas import prepare_vertex_planes

__all__ = ["prepare_pruned_sites", "pruned_assign_blocks", "LOGC_CUT"]

LOGC_CUT = 16.0


def prepare_pruned_sites(verts, vmask, centers, site_pos, site_rad,
                         cell_diag, s_tile=512, bins_per_axis=8):
    """Host-side, once per analysis: sort sites into spatially compact
    tiles and compute per-tile bounding spheres.

    verts (S, V), vmask (S, V), centers (K, S) cluster-center matrix whose
    columns follow the site order, site_pos (S, 3) landmark node positions,
    site_rad (S,) node radii.  Returns a dict of sorted/padded arrays plus
    tile bounds, ready for :func:`pruned_assign_blocks`.
    """
    verts = np.asarray(verts)
    vmask = np.asarray(vmask)
    centers = np.asarray(centers, np.float32)
    site_pos = np.asarray(site_pos, np.float64)
    site_rad = np.asarray(site_rad, np.float64)
    cell_diag = np.asarray(cell_diag, np.float64)
    S, V = verts.shape

    frac = (site_pos / cell_diag) % 1.0
    q = np.minimum((frac * bins_per_axis).astype(np.int64),
                   bins_per_axis - 1)
    key = (q[:, 0] * bins_per_axis + q[:, 1]) * bins_per_axis + q[:, 2]
    order = np.argsort(key, kind="stable")

    verts_s = verts[order]
    vmask_s = vmask[order]
    centers_s = centers[:, order]
    pos_s = site_pos[order]
    rad_s = site_rad[order]

    SP = _round_up(S, s_tile)
    n_st = SP // s_tile
    # per-tile bounding sphere over site node positions (PBC-aware via the
    # tile's first site as reference image)
    tile_center = np.zeros((n_st, 3))
    tile_rad = np.zeros(n_st)
    for t in range(n_st):
        lo, hi = t * s_tile, min((t + 1) * s_tile, S)
        if lo >= S:
            tile_center[t] = 0.0
            tile_rad[t] = -1e9  # empty tile: never relevant
            continue
        p = pos_s[lo:hi]
        ref = p[0]
        d = p - ref
        d -= np.round(d / cell_diag) * cell_diag
        c = ref + d.mean(0)
        tile_center[t] = c % cell_diag
        dc = p - c
        dc -= np.round(dc / cell_diag) * cell_diag
        tile_rad[t] = np.sqrt((dc * dc).sum(1)).max() + rad_s[lo:hi].max()

    return dict(
        verts=jnp.asarray(verts_s),
        vmask=jnp.asarray(vmask_s),
        centers=jnp.asarray(centers_s),
        site_order=order,
        tile_center=jnp.asarray(tile_center, jnp.float32),
        tile_rad=jnp.asarray(tile_rad, jnp.float32),
        s_tile=s_tile,
        n_st=n_st,
    )


def _kernel(rel_ref, mob_ref, vp_ref, mask_ref, centers_ref, params_ref,
            labels_ref, confs_ref, sims_acc, norm_acc, *, V, n_st, m_tile):
    b = pl.program_id(0)
    st = pl.program_id(1)
    mt = pl.program_id(2)
    row0 = pl.multiple_of(mt * m_tile, m_tile)

    @pl.when(st == 0)
    def _():
        sims_acc[pl.ds(row0, m_tile), :] = jnp.zeros(
            (m_tile, sims_acc.shape[1]), sims_acc.dtype)
        norm_acc[pl.ds(row0, m_tile), :] = jnp.zeros(
            (m_tile, 1), norm_acc.dtype)

    cell, midpoint, steepness, threshold = load_cell_params(
        params_ref, triclinic=False)

    @pl.when(rel_ref[b, st, mt] != 0)
    def _():
        mx = mob_ref[0, 0, :]
        my = mob_ref[0, 1, :]
        mz = mob_ref[0, 2, :]
        loglv = jnp.zeros((m_tile, vp_ref.shape[-1]), jnp.float32)
        for v in range(V):
            dx = mx[:, None] - vp_ref[0, 0, v, :][None, :]
            dy = my[:, None] - vp_ref[0, 1, v, :][None, :]
            dz = mz[:, None] - vp_ref[0, 2, v, :][None, :]
            dx, dy, dz = min_image_xyz(dx, dy, dz, cell, triclinic=False)
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            logc = -jax.nn.softplus(steepness * (d - midpoint))
            loglv = loglv + mask_ref[v, :][None, :] * logc
        loglv = loglv + mask_ref[V, :][None, :] * (-1.0e4)
        lv = jnp.exp(loglv)
        norm_acc[pl.ds(row0, m_tile), 0] += jnp.sum(lv * lv, axis=1)
        sims_acc[pl.ds(row0, m_tile), :] += jax.lax.dot_general(
            lv.astype(jnp.bfloat16), centers_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(st == n_st - 1)
    def _():
        nrm = norm_acc[pl.ds(row0, m_tile), 0]
        inv = jax.lax.rsqrt(jnp.maximum(nrm, 1e-24))
        sims = sims_acc[pl.ds(row0, m_tile), :] * inv[:, None]
        conf = jnp.max(sims, axis=1)
        lab = jnp.argmax(sims, axis=1).astype(jnp.int32)
        lab = jnp.where((conf >= threshold) & (nrm > 0), lab, -1)
        labels_ref[b, pl.ds(row0, m_tile)] = lab
        confs_ref[b, pl.ds(row0, m_tile)] = jnp.where(nrm > 0, conf, 0.0)


@partial(jax.jit,
         static_argnames=("midpoint", "steepness", "threshold", "s_tile",
                          "m_tile", "n_st", "interpret"))
def _pruned_call(mob_sorted, vp, vmask_kill, centers_pad, rel, params,
                 *, midpoint, steepness, threshold, s_tile, m_tile, n_st,
                 interpret):
    B, _, MP = mob_sorted.shape
    V = vp.shape[2]
    KP = centers_pad.shape[1]
    n_mt = MP // m_tile
    kernel = partial(_kernel, V=V, n_st=n_st, m_tile=m_tile)
    return pl.pallas_call(
        kernel,
        grid=(B, n_st, n_mt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # rel
            pl.BlockSpec((1, 3, m_tile), lambda b, st, mt: (b, 0, mt),
                         memory_space=pltpu.VMEM),                 # mobile
            pl.BlockSpec((1, 3, V, s_tile), lambda b, st, mt: (b, 0, 0, st),
                         memory_space=pltpu.VMEM),                 # vertex pl
            pl.BlockSpec((V + 1, s_tile), lambda b, st, mt: (0, st),
                         memory_space=pltpu.VMEM),                 # mask
            pl.BlockSpec((s_tile, KP), lambda b, st, mt: (st, 0),
                         memory_space=pltpu.VMEM),                 # centers
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # params
        ],
        out_specs=[
            pl.BlockSpec((B, MP), lambda b, st, mt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, MP), lambda b, st, mt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, MP), jnp.int32),
            jax.ShapeDtypeStruct((B, MP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((MP, KP), jnp.float32),
            pltpu.VMEM((MP, 1), jnp.float32),
        ],
        interpret=interpret,
    )(rel, mob_sorted, vp, vmask_kill, centers_pad, params)


def pruned_assign_blocks(mobile, static, prep, cell_diag, *, midpoint,
                         steepness, threshold, m_tile=256, bins_per_axis=8,
                         interpret=False, prune=True, margin=1.0):
    """Pruned fused landmark + assign for a block of frames.

    mobile (B, M, 3), static (B, N, 3); ``prep`` from
    :func:`prepare_pruned_sites`; cell_diag (3,).  ``margin`` widens the
    tile-relevance radius (same length units as the positions) to cover
    static-lattice thermal drift of the vertex atoms away from the ideal
    site geometry the tile bounds were built from.  Returns (labels (B, M),
    confs (B, M)) in the ORIGINAL ion order, labels indexing the centers'
    cluster rows (−1 below threshold).
    """
    return _pruned_assign_impl(
        mobile, static, prep["verts"], prep["vmask"], prep["centers"],
        prep["tile_center"], prep["tile_rad"], jnp.asarray(cell_diag),
        midpoint=midpoint, steepness=steepness, threshold=threshold,
        s_tile=prep["s_tile"], n_st=prep["n_st"], m_tile=m_tile,
        bins_per_axis=bins_per_axis, interpret=interpret, prune=prune,
        margin=float(margin))


@partial(jax.jit,
         static_argnames=("midpoint", "steepness", "threshold", "s_tile",
                          "n_st", "m_tile", "bins_per_axis", "interpret",
                          "prune", "margin"))
def _pruned_assign_impl(mobile, static, verts, vmask, centers, tile_center,
                        tile_rad, cell_diag, *, midpoint, steepness,
                        threshold, s_tile, n_st, m_tile, bins_per_axis,
                        interpret, prune, margin=1.0):
    B, M, _ = mobile.shape
    S, V = verts.shape
    K = centers.shape[0]
    MP = _round_up(max(M, m_tile), m_tile)
    SP = n_st * s_tile
    KP = _round_up(K, 128)

    # ---- per-frame spatial sort of ions ------------------------------
    frac = (mobile / cell_diag[None, None, :]) % 1.0
    qb = jnp.minimum((frac * bins_per_axis).astype(jnp.int32),
                     bins_per_axis - 1)
    key = (qb[..., 0] * bins_per_axis + qb[..., 1]) * bins_per_axis \
        + qb[..., 2]                                           # (B, M)
    order = jnp.argsort(key, axis=1)                           # (B, M)
    mob_sorted = jnp.take_along_axis(mobile, order[..., None], axis=1)
    # pad with the last sorted ion (keeps tiles compact)
    mob_pad = jnp.concatenate(
        [mob_sorted,
         jnp.broadcast_to(mob_sorted[:, -1:], (B, MP - M, 3))], axis=1)

    # ---- relevance mask ----------------------------------------------
    n_mt = MP // m_tile
    if prune:
        tiles = mob_pad.reshape(B, n_mt, m_tile, 3)
        ref = tiles[:, :, :1, :]
        d = tiles - ref
        d = d - jnp.round(d / cell_diag) * cell_diag
        mn = jnp.min(d, axis=2)
        mx = jnp.max(d, axis=2)
        mt_center = (ref[:, :, 0, :] + 0.5 * (mn + mx)) % cell_diag
        mt_rad = 0.5 * jnp.sqrt(jnp.sum((mx - mn) ** 2, axis=-1))  # (B,n_mt)
        dc = mt_center[:, None, :, :] - tile_center[None, :, None, :]
        dc = dc - jnp.round(dc / cell_diag) * cell_diag
        dist = jnp.sqrt(jnp.sum(dc * dc, axis=-1))            # (B,n_st,n_mt)
        r_trunc = midpoint + LOGC_CUT / steepness
        # margin: static-lattice thermal jitter allowance (caller units)
        rel = (dist - mt_rad[:, None, :] - tile_rad[None, :, None]
               < r_trunc + margin)
        rel = rel & (tile_rad > -1e8)[None, :, None]
    else:
        rel = jnp.ones((B, n_st, n_mt), bool)
    rel = rel.astype(jnp.int32)

    # ---- padded kernel inputs ----------------------------------------
    mob_planes = jnp.transpose(mob_pad, (0, 2, 1))            # (B, 3, MP)
    vp, mask = prepare_vertex_planes(static, verts, vmask)
    vp = jnp.pad(vp, ((0, 0), (0, 0), (0, 0), (0, SP - S)))
    mask = jnp.pad(mask, ((0, 0), (0, SP - S)))
    pad_kill = jnp.zeros((1, SP), jnp.float32).at[0, S:].set(1.0)
    mask = jnp.concatenate([mask, pad_kill], axis=0)
    cpad = jnp.pad(centers.T.astype(jnp.float32),
                   ((0, SP - S), (0, KP - K)))                # (SP, KP)

    params = jnp.asarray([cell_diag[0], cell_diag[1], cell_diag[2],
                          midpoint, steepness, threshold], jnp.float32)

    labels_s, confs_s = _pruned_call(
        mob_planes, vp, mask, cpad, rel, params, midpoint=midpoint,
        steepness=steepness, threshold=threshold, s_tile=s_tile,
        m_tile=m_tile, n_st=n_st, interpret=interpret)

    # ---- unsort back to original ion order ---------------------------
    labels_s = labels_s[:, :M]
    confs_s = confs_s[:, :M]
    inv = jnp.argsort(order, axis=1)
    labels = jnp.take_along_axis(labels_s, inv, axis=1)
    confs = jnp.take_along_axis(confs_s, inv, axis=1)
    return labels, confs