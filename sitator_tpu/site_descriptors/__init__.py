from sitator_tpu.site_descriptors.soap import (
    SOAPDescriptorAverages,
    SiteCentersDescriptor,
    soap_descriptors,
)
from sitator_tpu.site_descriptors.typing import SiteTypeAnalysis
from sitator_tpu.site_descriptors.merge_descriptors import (
    MergeSitesByDescriptors,
)

__all__ = [
    "soap_descriptors", "SOAPDescriptorAverages", "SiteCentersDescriptor",
    "SiteTypeAnalysis", "MergeSitesByDescriptors",
]
