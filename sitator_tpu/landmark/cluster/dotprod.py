"""Default landmark clustering backend: on-device dot-product agglomeration.

Reference parity: ``sitator/landmark/cluster/dotprod.py`` (SURVEY.md §3.2) —
the module-level ``do_landmark_clustering`` entry point wrapping the cosine
classifier.  Fitting runs on a (strided) subsample capped at
``fit_max_samples``; prediction runs over the full sample set in device-sized
blocks so arbitrarily long trajectories stream through.
"""
from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from sitator_tpu.ops.cluster import dotprod_fit
from sitator_tpu.ops.landmark import assign_to_centers

logger = logging.getLogger(__name__)

DEFAULT_PARAMS = {
    # paper-calibrated cosine thresholds (arXiv:1902.02107; SURVEY.md §0
    # flags the exact reference defaults as calibration constants)
    "clustering_threshold": 0.45,
    "assignment_threshold": 0.35,
    "k_max": 512,
    "n_refine_iters": 10,
    "fit_max_samples": 131072,
    "predict_block": 65536,
}


def do_landmark_clustering(landmark_vectors, clustering_params, min_samples,
                           verbose=False):
    """Cluster row-normalized landmark vectors.

    Parameters mirror the reference backend interface: ``landmark_vectors``
    is ``(n_samples, n_landmarks)``; ``min_samples`` drops clusters smaller
    than that.  Returns ``(counts, assignments, confidences, centers)`` where
    ``assignments`` uses compacted labels ``0..K-1`` (``-1`` = unassigned)
    and ``centers (K, n_landmarks)`` are the unit cluster centers.
    """
    p = {**DEFAULT_PARAMS, **(clustering_params or {})}
    lv = np.asarray(landmark_vectors, dtype=np.float32)
    n = len(lv)

    # fit on an evenly-strided subsample (temporally uniform coverage)
    stride = max(1, int(np.ceil(n / p["fit_max_samples"])))
    fit_X = jnp.asarray(lv[::stride])
    # min_samples applies to the full set; scale to the subsample
    fit_min = max(1, int(min_samples / stride))
    res = dotprod_fit(fit_X, k_max=p["k_max"],
                      cluster_threshold=p["clustering_threshold"],
                      min_samples=fit_min, n_iters=p["n_refine_iters"])
    if verbose:
        logger.info("dotprod clustering: %d clusters from %d fit samples "
                    "(stride %d)", res.n_clusters, fit_X.shape[0], stride)
    if res.n_clusters >= p["k_max"]:
        logger.warning("dotprod clustering hit k_max=%d; raise k_max",
                       p["k_max"])

    centers = res["centers"]
    active = res["active"]

    # predict the full set blockwise
    labels = np.empty(n, dtype=np.int32)
    confs = np.empty(n, dtype=np.float32)
    B = p["predict_block"]
    for lo in range(0, n, B):
        blk = jnp.asarray(lv[lo:lo + B])
        lab, cf = assign_to_centers(blk, centers, active,
                                    p["assignment_threshold"])
        labels[lo:lo + B] = np.asarray(lab)
        confs[lo:lo + B] = np.asarray(cf)

    # enforce min_samples on full-set counts, then compact labels
    k_max = centers.shape[0]
    counts_full = np.bincount(labels[labels >= 0], minlength=k_max)
    active_np = np.asarray(active) & (counts_full >= min_samples)
    remap = np.full(k_max, -1, dtype=np.int32)
    kept = np.flatnonzero(active_np)
    remap[kept] = np.arange(len(kept))
    ok = labels >= 0
    labels[ok] = remap[labels[ok]]
    # convention: confidences stay the raw max cosine similarity for every
    # sample, assigned or not (unassigned is signalled by label -1 alone)

    counts = np.bincount(labels[labels >= 0], minlength=len(kept))
    return counts, labels, confs, np.asarray(centers)[kept]
