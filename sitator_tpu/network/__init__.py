from sitator_tpu.network.merging import MergeSitesBase, MergeSitesByDistance
from sitator_tpu.network.pathways import DiffusionPathwayAnalysis

__all__ = ["MergeSitesBase", "MergeSitesByDistance",
           "DiffusionPathwayAnalysis"]
