"""Reference-namespace compatibility shim.

:func:`install` registers a synthetic ``sitator`` package in
``sys.modules`` whose layout mirrors the reference
(``github.com/Linux-cpp-lisp/sitator``, SURVEY.md §2-§3), so unmodified
reference scripts run against this framework::

    import sitator_tpu.compat
    sitator_tpu.compat.install()

    from sitator import SiteNetwork, SiteTrajectory
    from sitator.landmark import LandmarkAnalysis
    from sitator.voronoi import VoronoiSiteGenerator
    from sitator.dynamics import JumpAnalysis, MergeSitesByDynamics
    from sitator.util import PBCCalculator

Both reference import styles are provided: package re-exports
(``from sitator.dynamics import JumpAnalysis``) and the reference's
one-class-per-CamelCase-file modules
(``from sitator.dynamics.JumpAnalysis import JumpAnalysis`` —
the reference keeps e.g. ``sitator/SiteNetwork.py :: SiteNetwork``,
SURVEY.md §3.1).

The shim is OPT-IN (nothing squats the ``sitator`` name at install time
of this package) and reversible via :func:`uninstall`.  It refuses to
overwrite a real ``sitator`` distribution if one is importable.

Intentional differences that cannot be papered over (SURVEY.md §3.9):
structures are :class:`sitator_tpu.Structure`, not ASE ``Atoms`` (use
``sitator_tpu.io.ase_adapter`` when ASE is available), and
``VoronoiSiteGenerator`` uses the built-in periodic Voronoi rather than
shelling out to Zeo++ (``sitator.util.zeo.Zeopy`` still wraps a real
binary if present).
"""
from __future__ import annotations

import importlib
import importlib.util
import sys
import types

__all__ = ["install", "uninstall", "REFERENCE_LAYOUT"]

# reference module path -> (sitator_tpu module, [exported symbols] | None
# for "alias the whole module").  Symbol lists follow SURVEY.md §3.
REFERENCE_LAYOUT = {
    "sitator": ("sitator_tpu",
                ["SiteNetwork", "SiteTrajectory", "Structure",
                 "__version__"]),
    # one-class-per-file modules at the top level (§3.1)
    "sitator.SiteNetwork": ("sitator_tpu.core.sitenet", ["SiteNetwork"]),
    "sitator.SiteTrajectory": ("sitator_tpu.core.sitetraj",
                               ["SiteTrajectory"]),
    "sitator.errors": ("sitator_tpu.util.errors", None),
    # landmark engine (§3.2)
    "sitator.landmark": ("sitator_tpu.landmark", None),
    "sitator.landmark.LandmarkAnalysis": ("sitator_tpu.landmark.analysis",
                                          ["LandmarkAnalysis"]),
    "sitator.landmark.errors": ("sitator_tpu.util.errors", None),
    "sitator.landmark.cluster": ("sitator_tpu.landmark.cluster", None),
    "sitator.landmark.cluster.dotprod": (
        "sitator_tpu.landmark.cluster.dotprod", None),
    "sitator.landmark.cluster.mcl": (
        "sitator_tpu.landmark.cluster.mcl", None),
    # voronoi seeding (§3.3)
    "sitator.voronoi": ("sitator_tpu.voronoi", None),
    "sitator.voronoi.VoronoiSiteGenerator": (
        "sitator_tpu.voronoi.generator", ["VoronoiSiteGenerator"]),
    # dynamics (§3.4)
    "sitator.dynamics": ("sitator_tpu.dynamics", None),
    "sitator.dynamics.JumpAnalysis": (
        "sitator_tpu.dynamics.jump_analysis", ["JumpAnalysis"]),
    "sitator.dynamics.MergeSitesByDynamics": (
        "sitator_tpu.dynamics.merge_dynamics", ["MergeSitesByDynamics"]),
    "sitator.dynamics.RemoveUnoccupiedSites": (
        "sitator_tpu.dynamics.filters", ["RemoveUnoccupiedSites"]),
    "sitator.dynamics.RemoveShortJumps": (
        "sitator_tpu.dynamics.filters", ["RemoveShortJumps"]),
    "sitator.dynamics.AverageVibrationalFrequency": (
        "sitator_tpu.dynamics.vibrational", ["AverageVibrationalFrequency"]),
    "sitator.dynamics.DiffusionAnalysis": (
        "sitator_tpu.dynamics.diffusion",
        ["DiffusionAnalysis", "SiteDiffusionAnalysis"]),
    # SURVEY §3.4 leaves the dynamics/network split of MergeSitesByDistance
    # unverified — expose the file-module under both parents.
    "sitator.dynamics.MergeSitesByDistance": (
        "sitator_tpu.network.merging", ["MergeSitesByDistance"]),
    # network (§3.5)
    "sitator.network": ("sitator_tpu.network", None),
    "sitator.network.DiffusionPathwayAnalysis": (
        "sitator_tpu.network.pathways", ["DiffusionPathwayAnalysis"]),
    "sitator.network.merging": ("sitator_tpu.network.merging", None),
    "sitator.network.MergeSitesByDistance": (
        "sitator_tpu.network.merging", ["MergeSitesByDistance"]),
    "sitator.network.SiteVolumes": (
        "sitator_tpu.network.site_volumes", ["SiteVolumes"]),
    # site descriptors (§3.6)
    "sitator.site_descriptors": ("sitator_tpu.site_descriptors", None),
    "sitator.site_descriptors.SOAP": (
        "sitator_tpu.site_descriptors.soap",
        ["SOAPDescriptorAverages", "SiteCentersDescriptor"]),
    "sitator.site_descriptors.SiteTypeAnalysis": (
        "sitator_tpu.site_descriptors.typing", ["SiteTypeAnalysis"]),
    "sitator.site_descriptors.MergeSitesByDescriptors": (
        "sitator_tpu.site_descriptors.merge_descriptors",
        ["MergeSitesByDescriptors"]),
    # util substrate (§3.7)
    "sitator.util": ("sitator_tpu.util", None),
    "sitator.util.PBCCalculator": ("sitator_tpu.ops.pbc",
                                   ["PBCCalculator"]),
    "sitator.util.DotProdClassifier": ("sitator_tpu.util.dotprod",
                                       ["DotProdClassifier"]),
    "sitator.util.mcl": ("sitator_tpu.ops.mcl", None),
    "sitator.util.zeo": ("sitator_tpu.util.zeo", None),
    "sitator.util.progress": ("sitator_tpu.util.progress", None),
    "sitator.util.elbow": ("sitator_tpu.util.elbow", None),
    # misc + visualization (§3.8)
    "sitator.misc": ("sitator_tpu.misc", None),
    "sitator.misc.NAvgsPerSite": ("sitator_tpu.misc.navgs",
                                  ["NAvgsPerSite"]),
    "sitator.misc.RecenterTrajectory": ("sitator_tpu.misc.recenter",
                                        ["RecenterTrajectory"]),
    "sitator.visualization": ("sitator_tpu.visualization", None),
    "sitator.visualization.common": ("sitator_tpu.visualization.common",
                                     None),
    "sitator.visualization.atoms": ("sitator_tpu.visualization.atoms",
                                    None),
    "sitator.visualization.SiteNetworkPlotter": (
        "sitator_tpu.visualization.network_plot", ["SiteNetworkPlotter"]),
}


def _alias_module(ref_name, target_name, symbols):
    """A fresh module object exporting ``symbols`` (or the target's whole
    public surface) — never the target module itself, so installing and
    linking the shim cannot mutate real ``sitator_tpu`` modules."""
    target = importlib.import_module(target_name)
    if symbols is None:
        symbols = getattr(
            target, "__all__",
            [s for s in vars(target) if not s.startswith("_")])
    mod = types.ModuleType(ref_name)
    mod.__doc__ = (f"compat alias of {target_name} "
                   f"(sitator_tpu.compat.install)")
    for s in symbols:
        setattr(mod, s, getattr(target, s))
    mod.__all__ = list(symbols)
    return mod


def install(force=False):
    """Register the reference ``sitator`` namespace in ``sys.modules``.

    Raises RuntimeError if a real ``sitator`` distribution is importable
    (pass ``force=True`` to shadow it for this process anyway).  Safe to
    call repeatedly.
    """
    already = sys.modules.get("sitator")
    if already is not None and getattr(already, "__sitator_tpu_compat__",
                                       False):
        return
    if not force:
        if already is not None:
            raise RuntimeError(
                "a real 'sitator' module is already imported; pass "
                "force=True to shadow it for this process")
        if importlib.util.find_spec("sitator") is not None:
            raise RuntimeError(
                "a real 'sitator' distribution is installed; pass "
                "force=True to shadow it for this process")

    mods = {}
    for ref_name, (target_name, symbols) in REFERENCE_LAYOUT.items():
        mods[ref_name] = _alias_module(ref_name, target_name, symbols)
    root = mods["sitator"]
    root.__sitator_tpu_compat__ = True
    # parent attribute linkage so `import sitator.landmark.cluster` and
    # `from sitator.dynamics import JumpAnalysis` both resolve.  When a
    # CamelCase file-module collides with a re-exported class of the same
    # name (`sitator.SiteNetwork`, `sitator.dynamics.JumpAnalysis`, ...),
    # the class wins on the parent — exactly the reference's own binding
    # order, where `from .X import X` in __init__ rebinds the attribute;
    # `import sitator.X` still resolves via sys.modules.
    for ref_name, mod in mods.items():
        if "." in ref_name:
            parent, leaf = ref_name.rsplit(".", 1)
            p = mods[parent]
            if leaf not in getattr(p, "__all__", ()):
                setattr(p, leaf, mod)
    sys.modules.update(mods)


def uninstall():
    """Remove the shim (no-op on modules the shim did not install)."""
    root = sys.modules.get("sitator")
    if root is None or not getattr(root, "__sitator_tpu_compat__", False):
        return
    for name in list(sys.modules):
        if name == "sitator" or name.startswith("sitator."):
            del sys.modules[name]
