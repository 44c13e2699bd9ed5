"""Second walkthrough: out-of-core streaming analysis + SOAP site typing.

Covers BASELINE configs 4 (descriptor merging / typing) and 5 (streaming):
the trajectory is consumed from a memmapped .npy through the prefetching
feeder, statistics accumulate on device with cross-block carry chaining,
and the discovered sites are typed by their SOAP environments.

Run:  python examples/streaming_and_typing.py   (pins the CPU backend itself;
set SITATOR_EXAMPLES_PLATFORM to run on an accelerator)
"""
from _common import default_to_cpu

default_to_cpu()

import os
import tempfile

import numpy as np

from sitator_tpu import SiteNetwork, SiteTrajectory
from sitator_tpu.io import NpyTrajectory, make_hopping_trajectory
from sitator_tpu.landmark import StreamingLandmarkAnalysis
from sitator_tpu.site_descriptors import (
    SiteTypeAnalysis,
    SOAPDescriptorAverages,
)
from sitator_tpu.voronoi import VoronoiSiteGenerator

tmp = tempfile.mkdtemp(prefix="sitator_stream_")

# --- a "large" trajectory living on disk, never fully in RAM
md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=4, n_frames=4000,
                             jump_rate=0.02, seed=5)
traj_path = os.path.join(tmp, "traj.npy")
np.save(traj_path, md.traj)
reader = NpyTrajectory(traj_path)
print(f"trajectory on disk: {len(reader)} frames, {reader.n_atoms} atoms")

# --- seed + stream
sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
seeds = VoronoiSiteGenerator().run(sn)
sla = StreamingLandmarkAnalysis(
    cutoff_midpoint=4.0, cutoff_steepness=3.0, block_frames=512,
    store_labels=os.path.join(tmp, "labels.npy"),
    checkpoint_path=os.path.join(tmp, "run.ckpt"), checkpoint_every=2)
out = sla.run(seeds, reader)
print(f"streamed (raw): {out.n_sites} sites, {int(out.n_ij.sum())} jumps")

# --- stats-level post-merge collapses the over-split landmark sites
out, remap = StreamingLandmarkAnalysis.merge_network(
    out, distance_threshold=2.0)
print(f"after merge: {out.n_sites} sites, {int(out.n_ij.sum())} jumps "
      f"(truth: {md.true_n_ij.sum()})")

# --- rebuild a SiteTrajectory from the spilled labels for typing
labels = np.load(os.path.join(tmp, "labels.npy"))
labels = np.where(labels >= 0, remap[labels], -1).astype(np.int32)
st = SiteTrajectory(out, labels)
st.set_real_traj(md.traj)

sta = SiteTypeAnalysis(SOAPDescriptorAverages(r_cut=4.5, averages_n=8),
                       max_types=4)
sta.run(st)
print(f"site types: {np.bincount(out.site_types)} (counts per type)")
print("occupancy by type:",
      [round(float(out.occupancies[out.site_types == t].mean()), 3)
       for t in np.unique(out.site_types)])
print(f"artifacts in {tmp}")
