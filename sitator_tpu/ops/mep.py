"""Minimum-energy-path refinement on periodic density grids — the
simplified string method (E, Ren & Vanden-Eijnden, J. Chem. Phys. 126,
164103 (2007)) on the free-energy landscape ``F(r) = -kB T ln rho(r)``.

Beyond the reference surface (upstream ``sitator`` has no barrier
machinery at all; SURVEY.md §3 stops at jump statistics): this upgrades
:class:`~sitator_tpu.dynamics.energetics.PathwayBarrierAnalysis` from
straight minimum-image hop segments — an upper-bound proxy that is
pessimistic for curved mechanisms — to genuine minimum-energy paths on
the sampled density.

TPU mapping: the landscape is the (log-)density grid interpolated
trilinearly with periodic wrap; its gradient comes from ``jax.grad``
through the interpolation weights (piecewise multilinear — exactly the
analytic gradient, no finite differences); one string iteration is a
clipped gradient-descent step on every interior node plus an
equal-arc-length reparametrization, and the whole relaxation is a
single ``lax.scan`` jitted over ALL edges at once (``vmap`` over paths,
``vmap`` over nodes).  Static shapes throughout: one compile per
``(n_edges, n_points)``.

Working in log-density (not density) keeps gradients bounded where
sampling is thin: ``rho`` is floored at ``rho_floor_rel * max(rho)``
before the log, so unsampled voids present a steep-but-finite uphill
wall that pushes the string back into sampled territory — a straight
seed crossing a void can be *rescued* by the refinement.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["refine_string_paths"]


def _interp_log_rho(log_rho, inv_cell, n_bins, r):
    """Periodic trilinear interpolation of ``log_rho`` at one cartesian
    point ``r`` (bin CENTERS at fractional ``(i + 0.5) / n``), matching
    the convention of ``dynamics.energetics._trilinear_periodic``."""
    frac = r @ inv_cell
    frac = frac - jnp.floor(frac)
    x = frac * n_bins - 0.5
    i0 = jnp.floor(x).astype(jnp.int32)
    t = x - i0
    val = 0.0
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                idx = (i0 + jnp.array([di, dj, dk])) % n_bins
                w = ((t[0] if di else 1.0 - t[0])
                     * (t[1] if dj else 1.0 - t[1])
                     * (t[2] if dk else 1.0 - t[2]))
                val += w * log_rho[idx[0], idx[1], idx[2]]
    return val


@partial(jax.jit, static_argnames=("iterations",))
def _refine(log_rho, inv_cell, paths, iterations, max_step, smoothing):
    """One ``lax.scan`` of simplified-string iterations over all paths.

    paths : (E, P, 3) cartesian node positions (endpoints fixed).
    Returns the relaxed (E, P, 3) paths.
    """
    n_bins = jnp.asarray(log_rho.shape)
    P = paths.shape[1]

    # V(r) = -log rho(r); dV/dr via autodiff through the (piecewise
    # multilinear) interpolation — the exact analytic gradient
    grad_v = jax.grad(
        lambda r: -_interp_log_rho(log_rho, inv_cell, n_bins, r))
    grad_nodes = jax.vmap(jax.vmap(grad_v))          # (E, P, 3)

    s_target = jnp.linspace(0.0, 1.0, P)
    interior = ((jnp.arange(P) > 0) & (jnp.arange(P) < P - 1))[:, None]

    def reparam(pts):
        """Redistribute one path's nodes to equal arc length."""
        seg = jnp.linalg.norm(jnp.diff(pts, axis=0), axis=1) + 1e-12
        cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
        cum = cum / cum[-1]
        return jax.vmap(lambda c: jnp.interp(s_target, cum, c),
                        in_axes=1, out_axes=1)(pts)

    def step(pts, _):
        g = grad_nodes(pts)
        disp = -max_step * g
        norm = jnp.linalg.norm(disp, axis=-1, keepdims=True)
        disp = disp * jnp.minimum(1.0, max_step / (norm + 1e-30))
        pts = pts + disp * interior                  # endpoints pinned
        # mild along-string diffusion: damps node-to-node wiggle that
        # sampling-noise gradients inject in flat regions (arc-length
        # inflation), at negligible cost in genuine curvature
        lap = 0.5 * (pts[:, :-2] + pts[:, 2:]) - pts[:, 1:-1]
        pts = pts.at[:, 1:-1].add(smoothing * lap)
        return jax.vmap(reparam)(pts), None

    return jax.lax.scan(step, paths, None, length=iterations)[0]


def refine_string_paths(rho, cell, paths, iterations=300, max_step=None,
                        smoothing=0.2, rho_floor_rel=1e-9):
    """Relax straight seed paths to minimum-energy paths on a periodic
    density grid.

    Parameters
    ----------
    rho : (n, n, n) non-negative density grid in fractional space
        (bin centers at ``(i + 0.5) / n``), e.g. from
        :func:`sitator_tpu.ops.density.smooth_density`.
    cell : (3, 3) cell matrix (rows are lattice vectors).
    paths : (E, P, 3) cartesian node positions per edge, endpoints at
        the site centers (the straight minimum-image discretization is
        the natural seed).  Nodes may lie outside the cell — the path
        stays continuous in cartesian space and only the interpolation
        wraps.
    iterations : string iterations (fixed count — compile-friendly).
    max_step : per-node displacement cap per iteration, in length
        units; default ``0.15 ×`` the smallest grid spacing.  Total
        travel capacity is ``iterations * max_step`` — the default pair
        allows ~45 grid spacings of lateral relaxation.
    smoothing : along-string Laplacian damping per iteration (0 turns
        it off) — keeps sampled-density noise from inflating the arc
        length in flat regions.
    rho_floor_rel : the density is floored at this fraction of its max
        before the log, bounding gradients where sampling is empty.

    Returns the relaxed ``(E, P, 3)`` float64 paths.  Barriers should
    then be read off the refined nodes with the same interpolation used
    for straight paths (``_trilinear_periodic`` on the *unfloored*
    density), so NaN semantics for genuinely unsampled transition
    regions are unchanged.
    """
    rho = np.asarray(rho, dtype=np.float64)
    if rho.ndim != 3:
        raise ValueError("rho must be a 3-D grid")
    paths = np.asarray(paths, dtype=np.float64)
    if paths.ndim != 3 or paths.shape[-1] != 3:
        raise ValueError("paths must have shape (E, P, 3)")
    if paths.shape[1] < 3:
        return paths.copy()                 # nothing interior to relax
    if rho.max() <= 0:
        raise ValueError("rho has no positive density")
    cell = np.asarray(cell, dtype=np.float64)
    if max_step is None:
        from sitator_tpu.ops.density import _cell_heights
        spacing = _cell_heights(cell) / np.asarray(rho.shape)
        max_step = 0.15 * float(spacing.min())
    log_rho = np.log(np.maximum(rho, rho_floor_rel * rho.max()))
    out = _refine(jnp.asarray(log_rho, jnp.float32),
                  jnp.asarray(np.linalg.inv(cell), jnp.float32),
                  jnp.asarray(paths, jnp.float32),
                  int(iterations), float(max_step), float(smoothing))
    return np.asarray(out, dtype=np.float64)
