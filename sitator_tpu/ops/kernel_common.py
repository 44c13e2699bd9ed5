"""Shared helpers for the fused Pallas landmark kernels.

The kernel-side functions here are pure jnp expressions traced inline into
the calling kernel (no Pallas state of their own), so factoring them out of
``landmark_pallas`` / ``landmark_mxu`` does not
change the generated Mosaic code — it only keeps the kernels' cell
handling and top-2 logic from drifting apart.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["round_up", "pack_cell_params", "load_cell_params",
           "min_image_xyz", "merge_top2", "is_tpu_backend"]


def is_tpu_backend():
    """True when JAX's default backend is the TPU.

    The remote-chip plugin has registered under two platform names over
    time ("axon" historically, "tpu" after the 2026-08 rename, with
    ``JAX_PLATFORMS=axon`` still able to select the old name) — every
    fused-kernel gate must accept both, or an engine silently takes the
    dense XLA fallback on a perfectly good chip.  Single source of truth
    for that check."""
    import jax
    return jax.default_backend() in ("tpu", "axon")


def round_up(x, m):
    """Round ``x`` up to the next multiple of ``m``."""
    return (x + m - 1) // m * m


def pack_cell_params(cell, consts):
    """Trace-side: pack the cell + trailing scalar constants into the
    kernel's SMEM params vector.

    ``cell``: (3,) orthorhombic diagonal lengths or (3, 3) triclinic matrix
    (rows are lattice vectors); ``consts``: 1-D float32 array of trailing
    scalars (midpoint, steepness, threshold).  Returns
    ``(params, triclinic)``; unpack in-kernel with :func:`load_cell_params`.
    """
    cell = jnp.asarray(cell, jnp.float32)
    if cell.ndim == 2:
        cell_inv = jnp.linalg.inv(cell).astype(jnp.float32)
        return jnp.concatenate([cell.ravel(), cell_inv.ravel(), consts]), True
    return jnp.concatenate([cell, consts]), False


def load_cell_params(params_ref, triclinic):
    """Kernel-side: unpack the SMEM params vector built by
    :func:`pack_cell_params` → ``(cell, midpoint, steepness, threshold)``.

    ``cell`` is the ``(rows, inverse)`` scalar-tuple pair for triclinic
    cells, or the ``(lx, ly, lz)`` diagonal lengths otherwise — pass it
    straight to :func:`min_image_xyz`.
    """
    if triclinic:
        c = tuple(params_ref[k] for k in range(9))
        ci = tuple(params_ref[9 + k] for k in range(9))
        return (c, ci), params_ref[18], params_ref[19], params_ref[20]
    cell = (params_ref[0], params_ref[1], params_ref[2])
    return cell, params_ref[3], params_ref[4], params_ref[5]


def min_image_xyz(dx, dy, dz, cell, triclinic):
    """Minimum-image displacement components (same math as
    ``ops.pbc.min_image_disp``).

    ``cell`` comes from :func:`load_cell_params`: per-axis lengths for the
    fast orthorhombic path, or the (rows, inverse) pair for the fractional
    round-trip (frac = d @ Cinv, frac -= round(frac), d = frac @ C).
    """
    if triclinic:
        c, ci = cell
        fx = dx * ci[0] + dy * ci[3] + dz * ci[6]
        fy = dx * ci[1] + dy * ci[4] + dz * ci[7]
        fz = dx * ci[2] + dy * ci[5] + dz * ci[8]
        fx = fx - jnp.round(fx)
        fy = fy - jnp.round(fy)
        fz = fz - jnp.round(fz)
        dx = fx * c[0] + fy * c[3] + fz * c[6]
        dy = fx * c[1] + fy * c[4] + fz * c[7]
        dz = fx * c[2] + fy * c[5] + fz * c[8]
        return dx, dy, dz
    lx, ly, lz = cell
    dx = dx - jnp.round(dx * (1.0 / lx)) * lx
    dy = dy - jnp.round(dy * (1.0 / ly)) * ly
    dz = dz - jnp.round(dz * (1.0 / lz)) * lz
    return dx, dy, dz


def merge_top2(top2_acc, lv):
    """Merge a tile's per-row top-2 of ``lv (rows, S_t)`` into the running
    top-2 scratch ``top2_acc (rows, 2)``.

    Ties: if the max occurs more than once, the 2nd-largest IS the max
    (matches ``lax.top_k`` semantics in ``ops.landmark.peak_even``).
    """
    m1 = jnp.max(lv, axis=1)
    is_max = lv >= m1[:, None]
    n_max = jnp.sum(is_max.astype(jnp.float32), axis=1)
    m2 = jnp.where(n_max > 1.0, m1,
                   jnp.max(jnp.where(is_max, -1.0, lv), axis=1))
    r1 = top2_acc[:, 0]
    r2 = top2_acc[:, 1]
    # top-2 of the union of two top-2 summaries
    top2_acc[:, 0] = jnp.maximum(r1, m1)
    top2_acc[:, 1] = jnp.maximum(jnp.minimum(r1, m1),
                                 jnp.maximum(r2, m2))
