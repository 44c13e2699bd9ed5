"""``RecenterTrajectory`` — remove host-lattice center-of-mass drift.

Reference parity: ``RecenterTrajectory`` (SURVEY.md §3.7 ⚠): subtract the
per-frame displacement of the static sublattice's center of mass so the
landmark basis stays registered to the host lattice.  Operates in place or
returns a copy.
"""
from __future__ import annotations

import numpy as np


class RecenterTrajectory:
    def __init__(self, masses=None, verbose=True):
        self.masses = masses
        self.verbose = verbose

    def run(self, static_mask, traj, in_place=False):
        """traj (n_frames, n_atoms, 3); static_mask (n_atoms,).  The COM
        displacement is computed over *unwrapped* static positions relative
        to frame 0 (per-frame minimum-image of the displacement, so thermal
        wrap-around does not corrupt the COM)."""
        traj = np.asarray(traj)
        out = traj if in_place else traj.copy()
        static = traj[:, static_mask, :]
        disp = static - static[0:1]
        if self.masses is not None:
            w = np.asarray(self.masses, dtype=np.float64)
            w = w / w.sum()
            com = np.einsum("fnc,n->fc", disp, w)
        else:
            com = disp.mean(axis=1)
        out -= com[:, None, :]
        return out
