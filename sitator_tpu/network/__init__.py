from sitator_tpu.network.merging import MergeSitesBase, MergeSitesByDistance
from sitator_tpu.network.pathways import DiffusionPathwayAnalysis
from sitator_tpu.network.site_volumes import SiteVolumes

__all__ = ["MergeSitesBase", "MergeSitesByDistance",
           "DiffusionPathwayAnalysis", "SiteVolumes"]
