"""Pair-correlation engines: RDF and van Hove analyses.

Engine-convention wrappers (``Engine(params).run(st)``) over the
device histogram kernels in :mod:`sitator_tpu.ops.correlation` — see
there for the physics and the TPU mapping.  Selections are ``'mobile'``,
``'static'``, an integer species number, or a boolean atom mask.
"""
from __future__ import annotations

import logging

import numpy as np

from sitator_tpu.ops import correlation as corr_ops

__all__ = ["RDFAnalysis", "VanHoveAnalysis"]

logger = logging.getLogger(__name__)


def _resolve_mask(sel, sn):
    if isinstance(sel, str):
        if sel == "mobile":
            return np.asarray(sn.mobile_mask, dtype=bool)
        if sel == "static":
            return np.asarray(sn.static_mask, dtype=bool)
        raise ValueError(f"unknown selection {sel!r} "
                         "(use 'mobile', 'static', a species number, "
                         "or a boolean mask)")
    if np.isscalar(sel):
        mask = np.asarray(sn.structure.species) == sel
        if not mask.any():
            raise ValueError(f"no atoms of species {sel!r}")
        return mask
    mask = np.asarray(sel, dtype=bool)
    if mask.shape != (sn.structure.n_atoms,):
        raise ValueError("selection mask must be (n_atoms,)")
    return mask


def _real_traj_of(st):
    traj = st.real_trajectory
    if traj is None:
        raise ValueError(
            "SiteTrajectory has no real trajectory (set_real_traj)")
    return np.asarray(traj), st.site_network


class RDFAnalysis:
    """Radial distribution function g(r) between two selections
    (defaults: mobile–mobile).  After ``run(st)``: ``r_``, ``g_``;
    returns ``self``."""

    def __init__(self, select_a="mobile", select_b=None, r_max=None,
                 n_bins=200, exact=False, verbose=True):
        self.select_a = select_a
        self.select_b = select_b
        self.r_max = r_max
        self.n_bins = int(n_bins)
        self.exact = bool(exact)
        self.verbose = verbose

    def run(self, st):
        traj, sn = _real_traj_of(st)
        mask_a = _resolve_mask(self.select_a, sn)
        mask_b = (None if self.select_b is None
                  else _resolve_mask(self.select_b, sn))
        self.r_, self.g_ = corr_ops.rdf(
            traj, sn.structure.cell, mask_a, mask_b,
            r_max=self.r_max, n_bins=self.n_bins, exact=self.exact)
        if self.verbose:
            peak = self.r_[int(np.argmax(self.g_))]
            logger.info("g(r): first/highest peak at r = %.3f", peak)
        return self


class VanHoveAnalysis:
    """Self and distinct van Hove functions of the mobile ions at the
    given frame ``lags``.  After ``run(st)``: ``r_``, ``G_self_``
    (displacement-magnitude density, integrates to 1) and ``G_distinct_``
    (ideal gas → 1), each ``(len(lags), n_bins)``; returns ``self``."""

    def __init__(self, lags=(0, 10, 100), select="mobile", r_max=None,
                 n_bins=200, origin_stride=10, exact=False, verbose=True):
        self.lags = tuple(int(l) for l in lags)
        self.select = select
        self.r_max = r_max
        self.n_bins = int(n_bins)
        self.origin_stride = int(origin_stride)
        self.exact = bool(exact)
        self.verbose = verbose

    def run(self, st):
        traj, sn = _real_traj_of(st)
        mask = _resolve_mask(self.select, sn)
        cell = sn.structure.cell
        self.r_, self.G_self_ = corr_ops.van_hove_self(
            traj, cell, mask, self.lags, r_max=self.r_max,
            n_bins=self.n_bins, origin_stride=self.origin_stride,
            exact=self.exact)
        _, self.G_distinct_ = corr_ops.van_hove_distinct(
            traj, cell, mask, self.lags, r_max=self.r_max,
            n_bins=self.n_bins, origin_stride=self.origin_stride,
            exact=self.exact)
        if self.verbose:
            logger.info("van Hove over lags %s computed (%d bins)",
                        self.lags, self.n_bins)
        return self
