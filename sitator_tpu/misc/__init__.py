from sitator_tpu.misc.navgs import NAvgsPerSite
from sitator_tpu.misc.recenter import RecenterTrajectory

__all__ = ["NAvgsPerSite", "RecenterTrajectory"]
