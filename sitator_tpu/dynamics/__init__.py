from sitator_tpu.dynamics.jump_analysis import JumpAnalysis
from sitator_tpu.dynamics.merge_dynamics import MergeSitesByDynamics
from sitator_tpu.dynamics.metastable import MergeSitesByMetastability
from sitator_tpu.dynamics.markov import MarkovianityAnalysis
from sitator_tpu.dynamics.uncertainty import (ChainUncertaintyAnalysis,
                                              edge_probability_intervals)
from sitator_tpu.dynamics.filters import RemoveUnoccupiedSites, \
    RemoveShortJumps
from sitator_tpu.dynamics.vibrational import (
    AverageVibrationalFrequency, VibrationalSpectrumAnalysis,
    ConductivitySpectrumAnalysis)
from sitator_tpu.dynamics.diffusion import DiffusionAnalysis, \
    SiteDiffusionAnalysis, RelaxationAnalysis
from sitator_tpu.dynamics.correlation import (RDFAnalysis,
                                              VanHoveAnalysis,
                                              ScatteringAnalysis)
from sitator_tpu.dynamics.arrhenius import (ArrheniusAnalysis,
                                            EdgeArrheniusAnalysis)
from sitator_tpu.dynamics.energetics import (SiteFreeEnergyAnalysis,
                                             PathwayBarrierAnalysis)
from sitator_tpu.dynamics.onsager import OnsagerAnalysis
from sitator_tpu.dynamics.kmc import (KineticMonteCarlo,
                                      mean_first_passage_times)
from sitator_tpu.dynamics.tpt import TransitionPathAnalysis
from sitator_tpu.dynamics.residence import ResidenceTimeAnalysis
from sitator_tpu.dynamics.vacancy import VacancyAnalysis
from sitator_tpu.dynamics.concerted import ConcertedJumpAnalysis
from sitator_tpu.dynamics.balance import (
    DetailedBalanceAnalysis, OccupancyCorrelationAnalysis,
    MergeSitesByOccupancyCorrelation)
from sitator_tpu.network.merging import MergeSitesByDistance

__all__ = [
    "JumpAnalysis", "MergeSitesByDynamics",
    "MergeSitesByMetastability", "MarkovianityAnalysis",
    "ChainUncertaintyAnalysis", "edge_probability_intervals",
    "MergeSitesByDistance",
    "RemoveUnoccupiedSites", "RemoveShortJumps",
    "AverageVibrationalFrequency", "VibrationalSpectrumAnalysis",
    "ConductivitySpectrumAnalysis", "DiffusionAnalysis",
    "SiteDiffusionAnalysis", "RelaxationAnalysis", "RDFAnalysis",
    "VanHoveAnalysis", "ScatteringAnalysis", "ArrheniusAnalysis",
    "SiteFreeEnergyAnalysis", "PathwayBarrierAnalysis",
    "OnsagerAnalysis",
    "KineticMonteCarlo", "TransitionPathAnalysis",
    "ResidenceTimeAnalysis",
    "EdgeArrheniusAnalysis", "mean_first_passage_times",
    "VacancyAnalysis", "ConcertedJumpAnalysis",
    "DetailedBalanceAnalysis", "OccupancyCorrelationAnalysis",
    "MergeSitesByOccupancyCorrelation",
]
