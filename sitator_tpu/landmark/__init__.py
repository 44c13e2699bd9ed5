from sitator_tpu.landmark.analysis import LandmarkAnalysis
from sitator_tpu.landmark.streaming import StreamingLandmarkAnalysis
from sitator_tpu.util.errors import (
    StaticLatticeError,
    ZeroLandmarkError,
    MultipleOccupancyError,
)

__all__ = ["LandmarkAnalysis", "StreamingLandmarkAnalysis",
           "StaticLatticeError", "ZeroLandmarkError",
           "MultipleOccupancyError"]
