from sitator_tpu.network.merging import MergeSitesBase, MergeSitesByDistance

__all__ = ["MergeSitesBase", "MergeSitesByDistance"]
