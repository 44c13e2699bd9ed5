from sitator_tpu.visualization.common import (
    layers,
    plotter,
    species_color,
)
from sitator_tpu.visualization.atoms import plot_atoms, plot_points
from sitator_tpu.visualization.network_plot import (
    SiteNetworkPlotter,
    plot_frame,
    plot_particle_trajectory,
    plot_site,
)
from sitator_tpu.visualization.kinetics import (
    plot_arrhenius,
    plot_msd,
    plot_rdf,
    plot_residence_survival,
    plot_structure_factor,
    plot_van_hove,
    plot_vdos,
    plot_conductivity_spectrum,
    plot_barrier_profiles,
    plot_reactive_flux,
    plot_implied_timescales,
    plot_ck_test,
)

__all__ = [
    "plotter", "layers", "species_color", "plot_atoms", "plot_points",
    "SiteNetworkPlotter", "plot_frame", "plot_site",
    "plot_particle_trajectory", "plot_msd", "plot_arrhenius", "plot_rdf",
    "plot_van_hove", "plot_residence_survival",
    "plot_structure_factor", "plot_vdos",
    "plot_conductivity_spectrum", "plot_barrier_profiles",
    "plot_reactive_flux", "plot_implied_timescales", "plot_ck_test",
]
