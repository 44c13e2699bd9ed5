from sitator_tpu.landmark.analysis import LandmarkAnalysis
from sitator_tpu.landmark.streaming import StreamingLandmarkAnalysis
from sitator_tpu.landmark.calibrate import suggest_cutoff
from sitator_tpu.util.errors import (
    StaticLatticeError,
    ZeroLandmarkError,
    MultipleOccupancyError,
)

__all__ = ["LandmarkAnalysis", "StreamingLandmarkAnalysis",
           "suggest_cutoff",
           "StaticLatticeError", "ZeroLandmarkError",
           "MultipleOccupancyError"]
