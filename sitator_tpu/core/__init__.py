from sitator_tpu.core.structure import Structure
from sitator_tpu.core.sitenet import SiteNetwork
from sitator_tpu.core.sitetraj import SiteTrajectory

__all__ = ["Structure", "SiteNetwork", "SiteTrajectory"]
