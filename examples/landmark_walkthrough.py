"""End-to-end walkthrough — the sitator_tpu analogue of the reference's
example notebook (SURVEY.md §5: a Li-diffusion landmark-analysis
walkthrough).  Uses the synthetic hopping trajectory so it runs anywhere;
swap in `sitator_tpu.io.open_trajectory(...)` for real MD data.

Run:  python examples/landmark_walkthrough.py   (pins the CPU backend itself;
set SITATOR_EXAMPLES_PLATFORM to run on an accelerator)
"""
from _common import default_to_cpu

default_to_cpu()

import numpy as np

from sitator_tpu import SiteNetwork
from sitator_tpu.dynamics import (
    JumpAnalysis,
    MergeSitesByDynamics,
    RemoveShortJumps,
    RemoveUnoccupiedSites,
)
from sitator_tpu.io import make_hopping_trajectory
from sitator_tpu.landmark import LandmarkAnalysis
from sitator_tpu.network import DiffusionPathwayAnalysis
from sitator_tpu.util import StageTimer
from sitator_tpu.voronoi import VoronoiSiteGenerator

timer = StageTimer("landmark walkthrough")

# --- 1. load a trajectory (here: synthetic Li-hopping MD with known truth)
md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=4, n_frames=2000,
                             jump_rate=0.02, seed=0)
sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
print(f"system: {md.structure}, {md.n_frames} frames, {md.n_ions} mobile ions")

# --- 2. seed the landmark basis from the static lattice's Voronoi nodes
with timer.stage("voronoi seeding"):
    sn = VoronoiSiteGenerator().run(sn)
print(f"landmark basis: {sn.n_sites} Voronoi nodes")

# --- 3. landmark analysis: discover sites, assign every (frame, ion)
with timer.stage("landmark analysis"):
    la = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          minimum_site_occupancy=0.01)
    st = la.run(sn, md.traj)
print(f"raw result: {st}")

# --- 4. post-process: merge over-split sites, debounce flickers
with timer.stage("merging + filters"):
    st = MergeSitesByDynamics(distance_threshold=2.0).run(st)
    st = RemoveShortJumps(frame_threshold=2).run(st)
    st = RemoveUnoccupiedSites().run(st)
print(f"after post-processing: {st.site_network.n_sites} sites")

# --- 5. jump statistics + diffusion pathways
with timer.stage("jump analysis"):
    ja = JumpAnalysis()
    ja.run(st)
    dpa = DiffusionPathwayAnalysis()
    dpa.run(st)
out = st.site_network
print(f"jumps detected: {ja.n_jumps} (ground truth: {md.true_n_ij.sum()})")
print(f"occupancies: {np.sort(out.occupancies)[::-1][:5].round(3)} ...")
print(f"pathways: {dpa.n_pathways}, dimensionalities {dpa.pathway_dims}")

# --- 6. persist the annotated result
st.save("/tmp/walkthrough_result.npz")
print("saved to /tmp/walkthrough_result.npz")
print()
print(timer.report())
