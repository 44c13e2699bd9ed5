"""Graph export: a :class:`SiteNetwork` as a ``networkx`` digraph.

Beyond-reference convenience (the reference keeps its jump graph as
bare ``n_ij`` arrays, SURVEY.md §3.5): hand the analyzed network to the
standard Python graph ecosystem — community detection, centrality,
shortest paths, drawing — without re-assembling attribute arrays by
hand.  Host-side and lazy (networkx imported on call).
"""
from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["to_networkx"]


def to_networkx(sn, edge_attr="n_ij", edge_threshold=0.0,
                include_site_attrs=True):
    """Build a ``networkx.DiGraph`` from a site network.

    Nodes are site indices carrying ``center`` (tuple), ``site_type``
    (when typed) and — with ``include_site_attrs`` — every scalar
    per-site attribute (vector-valued attributes are skipped).  A
    directed edge ``i -> j`` is added wherever
    ``edge_attr[i, j] > edge_threshold`` and finite, carrying
    ``weight`` (the attribute value), ``distance`` (minimum-image
    center separation) and every other finite scalar edge attribute at
    that pair.  ``edge_attr=None`` exports nodes only.
    """
    import networkx as nx

    from sitator_tpu.network.compare import min_image_distance_matrix

    g = nx.DiGraph()
    S = sn.n_sites
    centers = np.asarray(sn.centers, dtype=np.float64)
    scalar_site_attrs = {}
    if include_site_attrs:
        for name in sn.site_attributes:
            arr = np.asarray(sn.get_site_attribute(name))
            if arr.shape == (S,):
                scalar_site_attrs[name] = arr
    for i in range(S):
        attrs = {"center": tuple(centers[i])}
        if sn.site_types is not None:
            attrs["site_type"] = int(sn.site_types[i])
        for name, arr in scalar_site_attrs.items():
            attrs[name] = float(arr[i])
        g.add_node(i, **attrs)
    if edge_attr is None:
        return g
    if edge_attr not in sn.edge_attributes:
        raise ValueError(f"network has no edge attribute {edge_attr!r} "
                         f"(have: {sorted(sn.edge_attributes)})")
    w = np.asarray(sn.get_edge_attribute(edge_attr), dtype=np.float64)
    D = min_image_distance_matrix(centers, centers,
                                  sn.structure.cell)
    other = {name: np.asarray(sn.get_edge_attribute(name),
                              dtype=np.float64)
             for name in sn.edge_attributes
             if name != edge_attr
             and np.asarray(sn.get_edge_attribute(name)).shape == (S, S)}
    ii, jj = np.nonzero(np.isfinite(w) & (w > edge_threshold))
    for i, j in zip(ii.tolist(), jj.tolist()):
        if i == j:
            continue
        attrs = {"weight": float(w[i, j]), "distance": float(D[i, j])}
        for name, arr in other.items():
            if np.isfinite(arr[i, j]):
                attrs[name] = float(arr[i, j])
        g.add_edge(i, j, **attrs)
    logger.info("exported %d sites / %d edges (attr %r > %g)",
                S, g.number_of_edges(), edge_attr, edge_threshold)
    return g
