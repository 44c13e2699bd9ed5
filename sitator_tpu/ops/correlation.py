"""On-device pair-correlation histograms: RDF and van Hove functions.

Beyond the reference surface (upstream ``sitator`` stops at jump
statistics, SURVEY.md §3.4) — the standard structural/kinetic
correlation functions of the superionic-conductor literature:

- :func:`rdf`: the radial distribution function g(r) between two atom
  selections, frame-averaged.
- :func:`van_hove_distinct`: G_d(r, t) — the probability (relative to
  ideal gas) of finding a *different* ion at distance r after lag t;
  its t→∞ limit is g(r), and filling of the r→0 hole is the classic
  signature of correlated site exchange.
- :func:`van_hove_self` (host): P(r, t) = 4πr²G_s — the distribution of
  single-ion displacement magnitudes after lag t; hop-length peaks make
  discrete jump diffusion visible.

TPU mapping: each (origin-frame, lag) pair needs an all-pairs
minimum-image distance block — O(N²) work that rides
:func:`~sitator_tpu.ops.pbc.pairwise_pbc_distances` (VPU, statically
shaped) — followed by a fixed-bin histogram
(``searchsorted`` + ``segment_sum``).  Frames are swept with
``lax.scan`` so one compiled program handles any number of origins; the
self part is a cheap O(N·F) host pass in float64 over the unwrapped
trajectory (same precision reasoning as :mod:`sitator_tpu.ops.msd`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sitator_tpu.ops import pbc
from sitator_tpu.ops.msd import unwrap_trajectory

__all__ = ["rdf", "van_hove_distinct", "van_hove_self"]


def _bin_counts(dists, valid, r_max, n_bins):
    """Histogram ``dists`` where ``valid`` into n_bins over [0, r_max)."""
    idx = jnp.floor(dists * (n_bins / r_max)).astype(jnp.int32)
    ok = valid & (idx >= 0) & (idx < n_bins)
    idx = jnp.where(ok, idx, n_bins)                  # overflow bucket
    counts = jax.ops.segment_sum(
        jnp.where(ok, 1.0, 0.0).ravel(), idx.ravel(),
        num_segments=n_bins + 1)
    return counts[:n_bins]


@partial(jax.jit, static_argnames=("n_bins", "exclude_self"))
def _pair_hist_scan(frames_a, frames_b, cell, r_max, n_bins,
                    exclude_self):
    """Sum of pair-distance histograms over paired frame stacks
    ``(F, Na, 3) × (F, Nb, 3)`` → (n_bins,)."""
    cell = jnp.asarray(cell, dtype=frames_a.dtype)
    cell_inv = pbc.cell_inverse(cell)
    eye = (jnp.eye(frames_a.shape[1], frames_b.shape[1], dtype=bool)
           if exclude_self else
           jnp.zeros((frames_a.shape[1], frames_b.shape[1]), dtype=bool))

    def step(acc, ab):
        a, b = ab
        d = pbc.pairwise_pbc_distances(a, b, cell, cell_inv)
        return acc + _bin_counts(d, ~eye, r_max, n_bins), None

    init = jnp.zeros((n_bins,), dtype=jnp.float32)
    out, _ = jax.lax.scan(step, init, (frames_a, frames_b))
    return out


def _shell_volumes(r_max, n_bins):
    edges = np.linspace(0.0, r_max, n_bins + 1)
    return 4.0 / 3.0 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3), edges


def rdf(traj, cell, mask_a, mask_b=None, r_max=None, n_bins=200):
    """Frame-averaged radial distribution function g(r).

    traj ``(F, N, 3)`` wrapped or not (minimum-image throughout);
    ``mask_a``/``mask_b`` boolean atom selections (b defaults to a; the
    i==j self-pair is excluded when the selections are identical).
    Returns ``(r_centers, g)`` as float64 NumPy arrays.  ``r_max``
    defaults to half the shortest cell height (the minimum-image validity
    radius).
    """
    traj = np.asarray(traj)
    cell = np.asarray(cell, dtype=np.float64)
    mask_a = np.asarray(mask_a, dtype=bool)
    mask_b = mask_a if mask_b is None else np.asarray(mask_b, dtype=bool)
    same = mask_a.shape == mask_b.shape and (mask_a == mask_b).all()
    if r_max is None:
        r_max = 0.5 * float(_min_cell_height(cell))
    A = traj[:, mask_a, :]
    B = traj[:, mask_b, :]
    counts = np.asarray(
        _pair_hist_scan(jnp.asarray(A), jnp.asarray(B), cell,
                        float(r_max), int(n_bins), bool(same)),
        dtype=np.float64)
    shells, edges = _shell_volumes(float(r_max), int(n_bins))
    vol = float(abs(np.linalg.det(cell)))
    n_a, n_b = int(mask_a.sum()), int(mask_b.sum())
    n_pairs = n_a * n_b - (n_a if same else 0)
    norm = traj.shape[0] * n_pairs * shells / vol
    g = np.divide(counts, norm, out=np.zeros_like(counts),
                  where=norm > 0)
    return 0.5 * (edges[1:] + edges[:-1]), g


def van_hove_distinct(traj, cell, mask, lags, r_max=None, n_bins=200,
                      origin_stride=1):
    """Distinct van Hove function G_d(r, t) for the selected ions.

    For each lag t in ``lags`` (frames), histogram the minimum-image
    distances between ion i at an origin frame and every *other* ion j
    at origin+t, averaged over origins (subsampled by
    ``origin_stride``), normalized like g(r) (ideal gas → 1).  Returns
    ``(r_centers, G)`` with ``G.shape == (len(lags), n_bins)``.
    """
    traj = np.asarray(traj)
    cell = np.asarray(cell, dtype=np.float64)
    mask = np.asarray(mask, dtype=bool)
    if r_max is None:
        r_max = 0.5 * float(_min_cell_height(cell))
    F = traj.shape[0]
    ions = traj[:, mask, :]
    n = int(mask.sum())
    shells, edges = _shell_volumes(float(r_max), int(n_bins))
    vol = float(abs(np.linalg.det(cell)))
    out = np.empty((len(lags), n_bins), dtype=np.float64)
    for k, lag in enumerate(lags):
        lag = int(lag)
        if not 0 <= lag < F:
            raise ValueError(f"lag {lag} outside 0..{F - 1}")
        origins = np.arange(0, F - lag, int(origin_stride))
        counts = np.asarray(
            _pair_hist_scan(jnp.asarray(ions[origins]),
                            jnp.asarray(ions[origins + lag]), cell,
                            float(r_max), int(n_bins), True),
            dtype=np.float64)
        norm = len(origins) * n * (n - 1) * shells / vol
        out[k] = np.divide(counts, norm, out=np.zeros_like(counts),
                           where=norm > 0)
    return 0.5 * (edges[1:] + edges[:-1]), out


def van_hove_self(traj, cell, mask, lags, r_max=None, n_bins=200,
                  origin_stride=1, exact=False):
    """Self part as the displacement-magnitude density P(r, t) = 4πr²G_s:
    for each lag, the probability density (per unit r, integrates to 1 up
    to ``r_max``) of an ion having moved distance r.  Host float64 over
    the unwrapped trajectory.  Returns ``(r_centers, P)`` with
    ``P.shape == (len(lags), n_bins)``.
    """
    traj = np.asarray(traj)
    cell = np.asarray(cell, dtype=np.float64)
    mask = np.asarray(mask, dtype=bool)
    un = unwrap_trajectory(traj[:, mask, :], cell, exact=exact)
    F = un.shape[0]
    if r_max is None:
        r_max = 0.5 * float(_min_cell_height(cell))
    edges = np.linspace(0.0, float(r_max), int(n_bins) + 1)
    dr = edges[1] - edges[0]
    out = np.empty((len(lags), int(n_bins)), dtype=np.float64)
    for k, lag in enumerate(lags):
        lag = int(lag)
        if not 0 <= lag < F:
            raise ValueError(f"lag {lag} outside 0..{F - 1}")
        origins = np.arange(0, F - lag, int(origin_stride))
        disp = un[origins + lag] - un[origins]
        r = np.sqrt((disp ** 2).sum(-1)).ravel()
        counts, _ = np.histogram(r, bins=edges)
        out[k] = counts / (len(r) * dr)
    return 0.5 * (edges[1:] + edges[:-1]), out


def _min_cell_height(cell):
    """Shortest perpendicular height of the (possibly triclinic) cell —
    the minimum-image validity radius is half of it."""
    inv = np.linalg.inv(np.asarray(cell, dtype=np.float64))
    # row i of inv^T is the reciprocal vector of face i; the height is
    # 1/|that row|
    return (1.0 / np.linalg.norm(inv, axis=0)).min()
