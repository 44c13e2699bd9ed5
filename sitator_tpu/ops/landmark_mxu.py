"""MXU-product fused landmark kernel — the fastest production hot path.

Replaces the gather kernel's O(M·S·V) per-vertex distance recompute
(``ops/landmark_pallas.py``) with a two-stage formulation that exploits
vertex SHARING: neighbouring landmark polyhedra reuse the same static
atoms (8 sites per atom on a simple-cubic lattice), so a spatially compact
site tile of 256 sites touches only ~450 unique atoms — not 2048 slots.

Per (frame, site-tile) grid step, entirely in VMEM:

1. distance core on the tile's **unique vertex atoms** only:
   ``logc[m, u] = −softplus(k (d(m,u)² − d0²))``    (M, U)  VPU
   — ~4× fewer ion–atom pairs than the gather kernel at the bench basis;
2. the product over each site's vertices is a **matmul in log space**
   against the tile-local membership matrix:
   ``loglv = logc @ A_t``  with ``A_t (U, S_t)`` ∈ {0, 1, 2…}   MXU
   (multiplicity reproduces repeated vertex factors; masked slots simply
   never enter A — no in-kernel vertex masking at all);
3. ``lv = exp(loglv)`` → running norm² and ``lv @ centersᵀ`` as in the
   gather kernel; labels/confidences leave the chip, nothing else.

Host-side prep (once per landmark basis): order the sites by a balanced
kd split so every tile is a compact axis-aligned box, extract each tile's
unique-atom list, and build the padded per-tile ``A``.  :func:`mxu_supported` reports when
the basis shares enough vertices for this formulation to win; callers fall
back to the gather kernel otherwise.

Measured (one v5e chip, 10k-atom bench config, same process): gather
kernel 1467 fps → MXU-product 2631 fps, bit-identical labels.

Reference parity: this computes exactly the landmark vectors of
``sitator/landmark/helpers.pyx :: _fill_landmark_vectors`` (SURVEY.md
§3.2) — only the execution schedule is different.
"""
from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from sitator_tpu.ops.kernel_common import (load_cell_params, merge_top2,
                                           min_image_xyz, pack_cell_params,
                                           round_up as _round_up)

logger = logging.getLogger(__name__)

__all__ = ["prepare_mxu_basis", "prepare_engine_basis",
           "mxu_assign_blocks", "mxu_supported",
           "permute_centers", "mxu_landmark_blocks"]


def _kd_order(frac, s_tile):
    """Balanced kd-split site ordering: recursively split the site set
    along its widest fractional axis at exact ``s_tile`` multiples, so
    every consecutive ``s_tile`` slice of the returned permutation is a
    compact axis-aligned box.  (A Morton curve sliced at arbitrary tile
    offsets straddles octant jumps — tiles spanning half the cell — which
    both inflates per-tile unique-atom counts and breaks the preshift
    bound; the kd split bounds every tile's extent by construction.)"""
    S = len(frac)
    n_tiles = -(-S // s_tile)
    out = []

    def rec(ids, k):
        if k == 1:
            out.append(ids)
            return
        f = frac[ids]
        ax = int(np.argmax(f.max(axis=0) - f.min(axis=0)))
        k1 = k // 2
        n_left = min(k1 * s_tile, len(ids))
        o = ids[np.argsort(f[:, ax], kind="stable")]
        rec(o[:n_left], k1)
        rec(o[n_left:], k - k1)

    rec(np.arange(S), n_tiles)
    return np.concatenate(out)


def _tile_geometry(verts, vmask, site_pos, cell, s_tile, static_ref=None):
    """Host-side kd-tiling analysis shared by :func:`choose_s_tile` and
    :func:`prepare_mxu_basis` — ONE implementation, so the cost model can
    never drift from the real tiling.  Returns the site ordering, the
    per-tile unique-atom lists and padded sizes; given ``static_ref``,
    also the anchor-unwrapped per-tile reference geometry
    (``ref_u``/``anchors``/``rfrac``) that the preshift bound needs."""
    verts = np.asarray(verts)
    vmask = np.asarray(vmask).astype(bool)
    site_pos = np.asarray(site_pos, np.float64)
    cell = np.asarray(cell, np.float64)
    S, V = verts.shape
    inv = np.linalg.inv(cell)
    frac = (site_pos @ inv) % 1.0
    order = _kd_order(frac, s_tile)
    verts_s = verts[order]
    vmask_s = vmask[order]
    SP = _round_up(S, s_tile)
    n_st = SP // s_tile
    uniq = []
    for t in range(n_st):
        lo, hi = t * s_tile, min((t + 1) * s_tile, S)
        if lo >= S:
            uniq.append(np.zeros(0, np.int64))
            continue
        uniq.append(np.unique(verts_s[lo:hi][vmask_s[lo:hi]]))
    UP = _round_up(max(max((len(u) for u in uniq), default=1), 1), 128)
    g = dict(order=order, verts_s=verts_s, vmask_s=vmask_s, uniq=uniq,
             S=S, V=V, SP=SP, n_st=n_st, UP=UP)
    if static_ref is None:
        return g
    static_ref = np.asarray(static_ref, np.float64)
    site_frac = site_pos @ inv                   # NOT wrapped
    ref_frac = static_ref @ inv
    ref_u = np.zeros((n_st, UP, 3), np.float64)
    anchors = np.zeros((n_st, 3), np.float64)
    rfrac = np.zeros(3)
    for t in range(n_st):
        lo, hi = t * s_tile, min((t + 1) * s_tile, S)
        u = uniq[t]
        if lo >= S or len(u) == 0:
            continue
        # anchor: fractional centroid of the tile's sites, each unwrapped
        # to the first site's image (kd tiles are compact boxes, but may
        # still touch a face)
        sf = site_frac[order[lo:hi]]
        sf = sf - np.round(sf - sf[0])
        anchor_f = sf.mean(axis=0)
        af = ref_frac[u]
        af = af - np.round(af - anchor_f)        # unwrap atoms to anchor
        rfrac = np.maximum(rfrac, np.abs(af - anchor_f).max(axis=0))
        ref_u[t, :len(u)] = af @ cell
        # padded slots replay atom 0's coords; A never references them
        ref_u[t, len(u):] = ref_u[t, 0]
        anchors[t] = anchor_f @ cell
    g.update(ref_u=ref_u, anchors=anchors, rfrac=rfrac)
    return g


def _preshift_log_bound(rfrac, cell, midpoint, steepness, cutoff_shape,
                        vibration_margin):
    """log-cutoff value at the nearest distance any wrong-image pair can
    have under this tiling (see :func:`prepare_mxu_basis`); the preshift
    route is exact when this is ≤ −75."""
    cell = np.asarray(cell, np.float64)
    w = 1.0 / np.linalg.norm(np.linalg.inv(cell), axis=0)
    half_gap = 0.5 - rfrac - vibration_margin / w
    if not (half_gap > 0.0).all():
        return 0.0
    d_far = float(np.min(half_gap * w))
    if cutoff_shape == "logistic_r2":
        k2 = steepness / (2.0 * midpoint)
        return -(k2 * (d_far * d_far - midpoint * midpoint))
    return -(steepness * (d_far - midpoint))


def choose_s_tile(verts, vmask, site_pos, cell,
                  candidates=(128, 256), vpu_weight=25.0,
                  static_ref=None, midpoint=None, steepness=None,
                  cutoff_shape="logistic", vibration_margin=3.0):
    """Per-basis s_tile/UP co-tuning by a host-side cost model
    (PERFORMANCE.md 'Roofline' / round-4 lever).

    For each candidate tile size, compute the real kd tiling's unique-atom
    padding ``UP`` and tile count ``n_st`` (via the same
    :func:`_tile_geometry` the basis builder uses) and score the per-ion
    kernel work:

        cost = vpu_weight · 12 · (UP · n_st)     # distance+cutoff pairs
             + 2 · UP · SP                       # membership matmul (MXU)
             + 2 · SP · S                        # similarity matmul proxy
                                                 # (K unknown here; K ~ S)

    ``vpu_weight`` ≈ MXU-f32-FLOPs per VPU-FLOP (~25 on v5e) — but at the
    bench basis the chosen 128 *dominates* 256 in both terms (256 grows
    UP → A-work +103% at equal pairs), so the choice is insensitive to
    the weight.  Matches the measured on-chip ranking (r2-cont sweep:
    128 > 256 by ~2%; re-confirmed same-session round 4 —
    PERFORMANCE.md).

    Candidates MUST be multiples of 128: Mosaic requires the last block
    dimension (``kill``/``A``/lv tiles are ``(…, s_tile)``) be divisible
    by 128 unless it equals the whole array — measured on-chip, not just
    a docs caveat (s_tile=64 fails lowering at the flagship basis while
    passing in CPU interpret mode).

    When the preshift inputs (``static_ref`` + cutoff parameters) are
    given, any candidate that keeps the preshift bound beats every
    candidate that loses it, regardless of modeled cost — the measured
    +22% preshift win dwarfs single-digit tiling gains.
    """
    check_ps = (static_ref is not None and midpoint is not None
                and steepness is not None)
    best = None
    for st in candidates:
        g = _tile_geometry(verts, vmask, site_pos, cell, st,
                           static_ref if check_ps else None)
        cost = (vpu_weight * 12.0 * g["UP"] * g["n_st"]
                + 2.0 * g["UP"] * g["SP"] + 2.0 * g["SP"] * g["S"])
        loses_preshift = check_ps and _preshift_log_bound(
            g["rfrac"], cell, midpoint, steepness, cutoff_shape,
            vibration_margin) > -75.0
        key = (loses_preshift, cost)
        if best is None or key < best[0]:
            best = (key, st)
    return best[1]


def prepare_mxu_basis(verts, vmask, site_pos, cell, *, s_tile=256,
                      static_ref=None, midpoint=None,
                      steepness=None, cutoff_shape="logistic",
                      vibration_margin=3.0):
    """Host-side, once per landmark basis.

    verts (S, V) int32 indices into the static substructure, vmask (S, V),
    site_pos (S, 3) landmark node positions (used only for the spatial
    kd tiling — any representative per-site point works),
    cell (3, 3).  Returns a dict with device arrays:

    - ``uidx (n_st, UP)``: per-tile unique static-atom indices (0-padded);
    - ``A (n_st, UP, s_tile)``: tile-local vertex-membership/multiplicity;
    - ``kill (1, SP)``: 1.0 on padded site columns;
    - ``site_order (S,)``: permutation applied to the site axis — apply to
      cluster-center COLUMNS via :func:`permute_centers`;
    plus static metadata (``s_tile``, ``n_st``, ``UP``, cost ratio).

    **Tile-preshift route** (enabled when ``static_ref`` — the reference
    (n_static, 3) positions — and the cutoff parameters are given, and the
    cell is big enough): each tile's atoms are unwrapped once to the image
    nearest the tile anchor, so the kernel replaces the per-(ion, atom)
    minimum image (3·M·U rounds per tile) with ONE shift per (ion, tile).
    Exact by the underflow argument: a pair for which the single shift is
    not the minimum image has BOTH its raw and true min-image distances
    ≥ ``d_far = min_ax (0.5 − r_frac − vib_frac) · w_ax`` (inscribed cell
    widths ``w``); if ``log cutoff(d_far) ≤ −75``, the entry is ≤ 2.7e−33
    in either formulation — orders of magnitude below anything that can
    move an f32 assignment (see the bound's in-code note) — so labels are
    unchanged.  ``vibration_margin`` (Å) budgets per-frame
    static-atom drift on top of the reference geometry (the engines'
    ``static_movement_threshold`` guard keeps real drift far below it).
    Small cells fail the bound and fall back to the per-pair path
    (``preshift=False``).
    """
    have_ref = (static_ref is not None and midpoint is not None
                and steepness is not None)
    g = _tile_geometry(verts, vmask, site_pos, cell, s_tile,
                       static_ref if have_ref else None)
    S, V = g["S"], g["V"]
    SP, n_st, UP = g["SP"], g["n_st"], g["UP"]
    order, uniq = g["order"], g["uniq"]
    verts_s, vmask_s = g["verts_s"], g["vmask_s"]

    uidx = np.zeros((n_st, UP), np.int32)
    A = np.zeros((n_st, UP, s_tile), np.float32)
    for t in range(n_st):
        u = uniq[t]
        if len(u) == 0:
            continue
        uidx[t, :len(u)] = u
        lo, hi = t * s_tile, min((t + 1) * s_tile, S)
        vs = verts_s[lo:hi]
        vm = vmask_s[lo:hi]
        row = np.searchsorted(u, vs)            # (st_real, V)
        cols = np.broadcast_to(np.arange(hi - lo)[:, None], vs.shape)
        np.add.at(A, (t, row[vm], cols[vm]), 1.0)
    kill = np.zeros((1, SP), np.float32)
    kill[0, S:] = 1.0

    basis = dict(
        uidx=jnp.asarray(uidx),
        A=jnp.asarray(A),
        kill=jnp.asarray(kill),
        site_order=order,
        inv_order=jnp.asarray(np.argsort(order), jnp.int32),
        s_tile=int(s_tile),
        n_st=int(n_st),
        UP=int(UP),
        # elementwise-pair cost vs the gather kernel (lower = MXU path wins)
        cost_ratio=float(n_st * UP) / float(max(S * V, 1)),
        preshift=False,
    )

    if not have_ref:
        return basis
    # −75: a disagreeing pair contributes lv ≤ exp(−75) ≈ 2.7e−33 in
    # EITHER formulation, perturbing any similarity by < S·2.7e−33
    # ≈ 1e−28 total — an f32 argmax between values above ~1e−21 cannot
    # be flipped by that (ulp(1e−21) ≈ 1e−28), and confidences at
    # 1e−21 are unassignable noise in any real configuration.  Agreeing
    # pairs are the same minimum image computed either way (ulp-level
    # arithmetic reordering only, exactly like the gather↔MXU pairing).
    if _preshift_log_bound(g["rfrac"], cell, midpoint, steepness,
                           cutoff_shape, vibration_margin) <= -75.0:
        basis["preshift"] = True
        basis["ref_u"] = jnp.asarray(g["ref_u"], jnp.float32)
        basis["anchors"] = jnp.asarray(g["anchors"], jnp.float32)
    return basis


def prepare_engine_basis(verts, vmask, site_pos, cell, *, midpoint,
                         steepness, cutoff_shape, static_ref=None,
                         drift_budget=None, s_tile="auto"):
    """One-stop fused-route gate shared by every engine
    (``LandmarkAnalysis``, streaming fit + stream passes,
    ``SpmdLandmarkPipeline``): builds the kd basis with the preshift
    drift budget tied to the caller's drift guard
    (``vibration_margin = max(3, 2·budget)``; ``drift_budget=None`` ⇒
    preshift disabled, since nothing bounds static-atom drift), and
    returns None when the basis does not share enough vertices for the
    MXU route (:func:`mxu_supported`).  Keeping this policy in ONE place
    is what stops the four engines' budgets from drifting apart.

    ``s_tile='auto'`` co-tunes the tile size per basis via
    :func:`choose_s_tile` (picks 128 at the flagship SC basis),
    preferring candidates that keep the preshift bound."""
    vib = (max(3.0, 2.0 * float(drift_budget))
           if drift_budget is not None else 3.0)
    if s_tile == "auto":
        s_tile = choose_s_tile(
            verts, vmask, site_pos, cell,
            static_ref=static_ref if drift_budget is not None else None,
            midpoint=midpoint, steepness=steepness,
            cutoff_shape=cutoff_shape, vibration_margin=vib)
    basis = prepare_mxu_basis(
        verts, vmask, site_pos, cell, s_tile=s_tile,
        static_ref=static_ref if drift_budget is not None else None,
        midpoint=midpoint, steepness=steepness, cutoff_shape=cutoff_shape,
        vibration_margin=vib)
    ok = mxu_supported(basis)
    logger.debug(
        "fused-route gate: mxu=%s (cost_ratio %.3f), preshift=%s "
        "(drift budget %s)", ok, basis["cost_ratio"],
        basis["preshift"] if ok else "-", drift_budget)
    return basis if ok else None


def mxu_supported(basis, max_cost_ratio=0.75) -> bool:
    """True when the unique-atom formulation does less elementwise work
    than the gather kernel (vertex sharing is high enough).  Bases with no
    sharing (U → S·V) degrade past the gather kernel — fall back there."""
    return basis["cost_ratio"] <= max_cost_ratio


def permute_centers(centers, basis):
    """Permute cluster-center COLUMNS into the basis's kd-tile site order
    (labels index center ROWS and need no remapping)."""
    return np.asarray(centers)[:, basis["site_order"]]


def _tile_lv(mx, my, mz, vpu_ref, A_ref, kill_ref, anchors_ref, st, cell,
             midpoint, steepness, *, a_dtype, r2_cutoff, triclinic,
             preshift):
    """One tile's landmark vectors ``(M, S_t)`` — the distance core,
    log-cutoff, membership matmul and pad-kill shared VERBATIM by the
    assign kernel (:func:`_kernel`) and the lv-emitting kernel
    (:func:`_lv_kernel`), so the two can never drift apart."""
    if preshift:
        # ONE min-image per (ion, tile): shift each ion to the image
        # nearest the tile anchor; the tile's atoms were unwrapped to that
        # anchor at trace time, so the raw differences below are exact
        # minimum images for every pair that matters (far pairs underflow
        # exp to 0.0 either way — see prepare_mxu_basis)
        ax_ = anchors_ref[st, 0]
        ay_ = anchors_ref[st, 1]
        az_ = anchors_ref[st, 2]
        sx, sy, sz = min_image_xyz(mx - ax_, my - ay_, mz - az_,
                                   cell, triclinic)
        dx = (ax_ + sx)[:, None] - vpu_ref[0, 0, 0, :][None, :]  # (M, UP)
        dy = (ay_ + sy)[:, None] - vpu_ref[0, 0, 1, :][None, :]
        dz = (az_ + sz)[:, None] - vpu_ref[0, 0, 2, :][None, :]
    else:
        dx = mx[:, None] - vpu_ref[0, 0, 0, :][None, :]          # (M, UP)
        dy = my[:, None] - vpu_ref[0, 0, 1, :][None, :]
        dz = mz[:, None] - vpu_ref[0, 0, 2, :][None, :]
        dx, dy, dz = min_image_xyz(dx, dy, dz, cell, triclinic)
    d2 = dx * dx + dy * dy + dz * dz
    if r2_cutoff:
        k2 = steepness / (2.0 * midpoint)
        logc = -jax.nn.softplus(k2 * d2 - k2 * (midpoint * midpoint))
    else:
        logc = -jax.nn.softplus(steepness * (jnp.sqrt(d2) - midpoint))
    # product over vertices == matmul with the tile-local membership matrix
    loglv = jax.lax.dot_general(
        logc.astype(a_dtype), A_ref[0].astype(a_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (M, S_t)
    lv = jnp.exp(loglv)
    return jnp.where(kill_ref[0, :][None, :] > 0.0, 0.0, lv)


def _prep_mob_vpu(mobile, static, uidx, ref_u, cell, n_st, UP, MP,
                  preshift):
    """Trace-side input prep shared by both kernel entry points: pad the
    ion planes and gather (+ re-unwrap, when preshifting) each tile's
    unique-atom coordinate planes."""
    B = mobile.shape[0]
    mob = jnp.transpose(mobile, (0, 2, 1))
    mob = jnp.pad(mob, ((0, 0), (0, 0), (0, MP - mobile.shape[1])),
                  mode="edge")
    # per-tile unique-atom coordinate planes: one cheap XLA gather per block
    vpu = jnp.take(static, uidx.reshape(-1), axis=1).reshape(B, n_st, UP, 3)
    if preshift:
        # unwrap the per-frame atoms to the image nearest their unwrapped
        # reference (robust to arbitrary wrapping + drift in the input):
        # O(B·n_st·UP) elementwise, fused into the gather by XLA — the
        # kernel then skips per-(ion, atom) imaging entirely
        cm = jnp.diag(cell) if cell.ndim == 1 else cell
        d = vpu - ref_u[None]
        f = d @ jnp.linalg.inv(cm)
        vpu = ref_u[None] + (f - jnp.round(f)) @ cm
    return mob, jnp.transpose(vpu, (0, 1, 3, 2))           # (B, n_st, 3, UP)


def _kernel(mob_ref, vpu_ref, A_ref, kill_ref, centers_ref, params_ref,
            anchors_ref, labels_ref, confs_ref, sims_acc, norm_acc,
            top2_acc, *, n_st, a_dtype, mxu_dtype, r2_cutoff, triclinic,
            peak_clip, preshift):
    b = pl.program_id(0)
    p = pl.program_id(1)
    st = pl.program_id(2)
    acc_pass = 1 if peak_clip else 0

    @pl.when((p == acc_pass) & (st == 0))
    def _():
        sims_acc[:] = jnp.zeros_like(sims_acc)
        norm_acc[:] = jnp.zeros_like(norm_acc)

    if peak_clip:
        @pl.when((p == 0) & (st == 0))
        def _():
            top2_acc[:] = jnp.zeros_like(top2_acc)

    cell, midpoint, steepness, threshold = load_cell_params(
        params_ref, triclinic)

    mx = mob_ref[0, 0, :]
    my = mob_ref[0, 1, :]
    mz = mob_ref[0, 2, :]
    lv = _tile_lv(mx, my, mz, vpu_ref, A_ref, kill_ref, anchors_ref, st,
                  cell, midpoint, steepness, a_dtype=a_dtype,
                  r2_cutoff=r2_cutoff, triclinic=triclinic,
                  preshift=preshift)

    if peak_clip:
        @pl.when(p == 0)
        def _():
            merge_top2(top2_acc, lv)

    @pl.when(p == acc_pass)
    def _():
        lvc = jnp.minimum(lv, top2_acc[:, 1][:, None]) if peak_clip else lv
        norm_acc[:, 0] += jnp.sum(lvc * lvc, axis=1)
        sims_acc[:] += jax.lax.dot_general(
            lvc.astype(mxu_dtype), centers_ref[:].astype(mxu_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when((p == acc_pass) & (st == n_st - 1))
    def _():
        inv = jax.lax.rsqrt(jnp.maximum(norm_acc[:, 0], 1e-24))
        sims = sims_acc[:] * inv[:, None]
        conf = jnp.max(sims, axis=1)
        lab = jnp.argmax(sims, axis=1).astype(jnp.int32)
        labels_ref[b, :] = jnp.where(conf >= threshold, lab, -1)
        confs_ref[b, :] = conf


def _kernel_skew(mob_ref, vpu_ref, A_ref, kill_ref, centers_ref, params_ref,
                 anchors_ref, labels_ref, confs_ref, sims_acc, norm_acc,
                 lv_prev, *, n_st, a_dtype, mxu_dtype, r2_cutoff, triclinic,
                 preshift):
    """Software-pipelined variant of :func:`_kernel` (``peak_evening=
    'none'`` only): the grid runs ``n_st + 1`` tile steps; step ``st``
    computes tile ``st``'s landmark vectors (VPU distance core +
    membership matmul) while folding tile ``st - 1``'s similarity matmul
    from the ``lv_prev`` scratch into ``sims_acc``.  The two chains share
    no data except the scratch handoff (a WAR on the final store), so
    Mosaic is free to overlap the VPU work with the big MXU matmul that
    the plain kernel strictly serializes behind it — the per-tile
    latency-budget gap (PERFORMANCE.md 'Latency budget').  Accumulation
    ORDER over tiles is unchanged (tile t folds at step t+1,
    sequentially), so labels/confs are bit-identical to :func:`_kernel`.
    """
    b = pl.program_id(0)
    st = pl.program_id(2)

    @pl.when(st == 0)
    def _():
        sims_acc[:] = jnp.zeros_like(sims_acc)
        norm_acc[:] = jnp.zeros_like(norm_acc)

    cell, midpoint, steepness, threshold = load_cell_params(
        params_ref, triclinic)

    # fold tile st-1 (the centers index map already delivers block st-1)
    @pl.when(st > 0)
    def _():
        sims_acc[:] += jax.lax.dot_general(
            lv_prev[:].astype(mxu_dtype), centers_ref[:].astype(mxu_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # compute tile st (vpu/A/kill index maps deliver min(st, n_st-1))
    @pl.when(st < n_st)
    def _():
        st_eff = jnp.minimum(st, n_st - 1)   # anchors row stays in range
        mx = mob_ref[0, 0, :]
        my = mob_ref[0, 1, :]
        mz = mob_ref[0, 2, :]
        lv = _tile_lv(mx, my, mz, vpu_ref, A_ref, kill_ref, anchors_ref,
                      st_eff, cell, midpoint, steepness, a_dtype=a_dtype,
                      r2_cutoff=r2_cutoff, triclinic=triclinic,
                      preshift=preshift)
        norm_acc[:, 0] += jnp.sum(lv * lv, axis=1)
        lv_prev[:] = lv

    @pl.when(st == n_st)
    def _():
        inv = jax.lax.rsqrt(jnp.maximum(norm_acc[:, 0], 1e-24))
        sims = sims_acc[:] * inv[:, None]
        conf = jnp.max(sims, axis=1)
        lab = jnp.argmax(sims, axis=1).astype(jnp.int32)
        labels_ref[b, :] = jnp.where(conf >= threshold, lab, -1)
        confs_ref[b, :] = conf


@partial(jax.jit,
         static_argnames=("midpoint", "steepness", "threshold", "s_tile",
                          "n_st", "a_bf16", "mxu_bf16", "interpret",
                          "cutoff_shape", "peak_evening", "preshift",
                          "centers_store_f32", "skew"))
def _mxu_call(mobile, static, uidx, A, kill, cell, centers_perm, ref_u,
              anchors, *, midpoint, steepness, threshold, s_tile, n_st,
              a_bf16=False, mxu_bf16=True, interpret=False,
              cutoff_shape="logistic", peak_evening="none", preshift=False,
              centers_store_f32=True, skew=False):
    peak_clip = peak_evening == "clip"
    if skew and peak_clip:
        # the skew variant has no 2-pass (clip) kernel; silently running
        # the plain kernel here would corrupt any skew-vs-plain A/B
        raise ValueError("skew=True is not implemented for "
                         "peak_evening='clip'")
    n_passes = 2 if peak_clip else 1
    B, M, _ = mobile.shape
    UP = uidx.shape[1]
    SP = n_st * s_tile
    K = centers_perm.shape[0]
    MP = _round_up(M, 128)
    KP = _round_up(K, 128)

    mob, vpu = _prep_mob_vpu(mobile, static, uidx, ref_u, cell, n_st, UP,
                             MP, preshift)
    # Storing the padded weight matrix pre-cast to bf16 (the dtype the
    # similarity matmul consumes) would halve the kernel's dominant HBM
    # stream (38 -> 19 MB/frame at the bench basis) bit-identically — but
    # the same-process A/B measured 0.993x on v5e (tools/ab_centers_bf16,
    # PERFORMANCE.md rejected ledger): the kernel is not bandwidth-bound
    # on this stream, so f32 storage stays the default;
    # centers_store_f32=False opts in on bandwidth-starved hardware.
    cdt = (jnp.float32 if (centers_store_f32 or not mxu_bf16)
           else jnp.bfloat16)
    cpad = jnp.pad(centers_perm.astype(jnp.float32).T,
                   ((0, SP - centers_perm.shape[1]), (0, KP - K))
                   ).astype(cdt)

    consts = jnp.asarray([midpoint, steepness, threshold], jnp.float32)
    params, triclinic = pack_cell_params(cell, consts)

    if skew and not peak_clip:
        kernel = partial(_kernel_skew, n_st=n_st,
                         a_dtype=jnp.bfloat16 if a_bf16 else jnp.float32,
                         mxu_dtype=(jnp.bfloat16 if mxu_bf16
                                    else jnp.float32),
                         r2_cutoff=(cutoff_shape == "logistic_r2"),
                         triclinic=triclinic, preshift=preshift)
        last = n_st - 1
        labels, confs = pl.pallas_call(
            kernel,
            grid=(B, 1, n_st + 1),
            in_specs=[
                pl.BlockSpec((1, 3, MP), lambda b, p, st: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 3, UP),
                             lambda b, p, st: (b, jnp.minimum(st, last),
                                               0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, UP, s_tile),
                             lambda b, p, st: (jnp.minimum(st, last),
                                               0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_tile),
                             lambda b, p, st: (0, jnp.minimum(st, last)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_tile, KP),
                             lambda b, p, st: (jnp.maximum(st - 1, 0), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((B, MP), lambda b, p, st: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, MP), lambda b, p, st: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, MP), jnp.int32),
                jax.ShapeDtypeStruct((B, MP), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((MP, KP), jnp.float32),
                pltpu.VMEM((MP, 1), jnp.float32),
                pltpu.VMEM((MP, s_tile), jnp.float32),
            ],
            interpret=interpret,
        )(mob, vpu, A, kill, cpad, params, anchors)
        return labels[:, :M], confs[:, :M]

    kernel = partial(_kernel, n_st=n_st,
                     a_dtype=jnp.bfloat16 if a_bf16 else jnp.float32,
                     mxu_dtype=jnp.bfloat16 if mxu_bf16 else jnp.float32,
                     r2_cutoff=(cutoff_shape == "logistic_r2"),
                     triclinic=triclinic, peak_clip=peak_clip,
                     preshift=preshift)
    labels, confs = pl.pallas_call(
        kernel,
        grid=(B, n_passes, n_st),
        in_specs=[
            pl.BlockSpec((1, 3, MP), lambda b, p, st: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, UP), lambda b, p, st: (b, st, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UP, s_tile), lambda b, p, st: (st, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile), lambda b, p, st: (0, st),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_tile, KP), lambda b, p, st: (st, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, MP), lambda b, p, st: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, MP), lambda b, p, st: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, MP), jnp.int32),
            jax.ShapeDtypeStruct((B, MP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((MP, KP), jnp.float32),
            pltpu.VMEM((MP, 1), jnp.float32),
            pltpu.VMEM((MP, 2), jnp.float32),
        ],
        interpret=interpret,
    )(mob, vpu, A, kill, cpad, params, anchors)
    return labels[:, :M], confs[:, :M]


def _lv_kernel(mob_ref, vpu_ref, A_ref, kill_ref, params_ref, anchors_ref,
               lv_ref, *, a_dtype, r2_cutoff, triclinic, preshift):
    """Landmark-VECTOR variant of :func:`_kernel`: same distance core and
    log-space membership matmul, but the lv tile is the OUTPUT (no
    centers/assignment) — serves ``LandmarkAnalysis``, whose reference
    contract exposes ``.landmark_vectors`` and therefore cannot use the
    labels-only kernels."""
    st = pl.program_id(1)
    cell, midpoint, steepness, _thr = load_cell_params(params_ref,
                                                       triclinic)
    mx = mob_ref[0, 0, :]
    my = mob_ref[0, 1, :]
    mz = mob_ref[0, 2, :]
    lv_ref[0, :, :] = _tile_lv(
        mx, my, mz, vpu_ref, A_ref, kill_ref, anchors_ref, st, cell,
        midpoint, steepness, a_dtype=a_dtype, r2_cutoff=r2_cutoff,
        triclinic=triclinic, preshift=preshift)


@partial(jax.jit,
         static_argnames=("midpoint", "steepness", "s_tile", "n_st",
                          "a_bf16", "interpret", "cutoff_shape",
                          "preshift"))
def _mxu_lv_call(mobile, static, uidx, A, kill, cell, ref_u, anchors,
                 inv_order, *, midpoint, steepness, s_tile, n_st,
                 a_bf16=False, interpret=False, cutoff_shape="logistic",
                 preshift=False):
    B, M, _ = mobile.shape
    UP = uidx.shape[1]
    SP = n_st * s_tile
    MP = _round_up(M, 128)

    mob, vpu = _prep_mob_vpu(mobile, static, uidx, ref_u, cell, n_st, UP,
                             MP, preshift)
    consts = jnp.asarray([midpoint, steepness, 0.0], jnp.float32)
    params, triclinic = pack_cell_params(cell, consts)
    kernel = partial(_lv_kernel,
                     a_dtype=jnp.bfloat16 if a_bf16 else jnp.float32,
                     r2_cutoff=(cutoff_shape == "logistic_r2"),
                     triclinic=triclinic, preshift=preshift)
    lv = pl.pallas_call(
        kernel,
        grid=(B, n_st),
        in_specs=[
            pl.BlockSpec((1, 3, MP), lambda b, st: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, UP), lambda b, st: (b, st, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, UP, s_tile), lambda b, st: (st, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile), lambda b, st: (0, st),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, MP, s_tile), lambda b, st: (b, 0, st),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, MP, SP), jnp.float32),
        interpret=interpret,
    )(mob, vpu, A, kill, params, anchors)
    # back to the caller's site order (columns are in kd-tile order)
    return lv[:, :M, :][:, :, inv_order]


def mxu_landmark_blocks(mobile, static, basis, cell, *, midpoint,
                        steepness, a_bf16=False, interpret=False,
                        cutoff_shape="logistic"):
    """Landmark vectors ``(B, M, S)`` in the CALLER's site order via the
    MXU-product (+ preshift) kernel — the fast path for
    ``LandmarkAnalysis``'s reference-parity ``.landmark_vectors`` contract.
    Unlike :func:`mxu_assign_blocks` the full lv matrix leaves the chip,
    so normalization / peak evening / clustering stay in XLA on top."""
    preshift = bool(basis.get("preshift", False))
    n_st = basis["n_st"]
    ref_u = (basis["ref_u"] if preshift
             else jnp.zeros((n_st, basis["UP"], 3), jnp.float32))
    anchors = (basis["anchors"] if preshift
               else jnp.zeros((n_st, 3), jnp.float32))
    inv_order = basis.get("inv_order")
    if inv_order is None:   # hand-built basis dicts (tests/bench harnesses)
        inv_order = jnp.asarray(
            np.argsort(np.asarray(basis["site_order"])), jnp.int32)
    return _mxu_lv_call(
        mobile, static, basis["uidx"], basis["A"], basis["kill"], cell,
        ref_u, anchors, inv_order, midpoint=float(midpoint),
        steepness=float(steepness), s_tile=basis["s_tile"], n_st=n_st,
        a_bf16=a_bf16, interpret=interpret, cutoff_shape=cutoff_shape,
        preshift=preshift)


def mxu_assign_blocks(mobile, static, basis, cell, centers_perm, *,
                      midpoint, steepness, threshold, mxu_bf16=True,
                      a_bf16=False, interpret=False,
                      cutoff_shape="logistic", peak_evening="none",
                      centers_store_f32=True, skew=False):
    """Fused landmark + normalize + assign via the MXU-product kernel.

    ``basis`` from :func:`prepare_mxu_basis`; ``centers_perm`` (K, S) unit
    cluster centers with columns permuted by :func:`permute_centers`.
    ``cell``: (3,) orthorhombic lengths or (3, 3) triclinic.  Returns
    (labels (B, M) int32 with −1 below threshold, confs (B, M)) — labels
    index center rows, identical to ``fused_assign_blocks``.
    """
    preshift = bool(basis.get("preshift", False))
    n_st = basis["n_st"]
    ref_u = (basis["ref_u"] if preshift
             else jnp.zeros((n_st, basis["UP"], 3), jnp.float32))
    anchors = (basis["anchors"] if preshift
               else jnp.zeros((n_st, 3), jnp.float32))
    return _mxu_call(
        mobile, static, basis["uidx"], basis["A"], basis["kill"], cell,
        jnp.asarray(centers_perm, jnp.float32), ref_u, anchors,
        midpoint=float(midpoint),
        steepness=float(steepness), threshold=float(threshold),
        s_tile=basis["s_tile"], n_st=n_st, a_bf16=a_bf16,
        mxu_bf16=mxu_bf16, interpret=interpret, cutoff_shape=cutoff_shape,
        peak_evening=peak_evening, preshift=preshift,
        centers_store_f32=centers_store_f32, skew=skew)
