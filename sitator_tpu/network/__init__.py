from sitator_tpu.network.merging import MergeSitesBase, MergeSitesByDistance
from sitator_tpu.network.pathways import DiffusionPathwayAnalysis
from sitator_tpu.network.site_volumes import SiteVolumes
from sitator_tpu.network.compare import (match_sites,
                                         compare_site_networks,
                                         min_image_distance_matrix)
from sitator_tpu.network.graph import (to_networkx,
    ConductionBottleneckAnalysis)
from sitator_tpu.network.density_sites import DensitySiteGenerator
from sitator_tpu.network.bond_valence import BondValenceSiteGenerator

__all__ = ["MergeSitesBase", "MergeSitesByDistance",
           "DiffusionPathwayAnalysis", "SiteVolumes",
           "match_sites", "compare_site_networks",
           "min_image_distance_matrix", "to_networkx",
           "DensitySiteGenerator", "BondValenceSiteGenerator",
           "ConductionBottleneckAnalysis"]
