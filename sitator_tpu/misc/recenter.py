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

    def run(self, static_mask, traj, cell=None, in_place=False):
        """traj (n_frames, n_atoms, 3); static_mask (n_atoms,).  The COM
        displacement of each static atom relative to frame 0 is reduced to
        its minimum image when ``cell`` (3, 3) is given, so wrapped
        trajectories (atoms oscillating across a cell face contribute ±L
        otherwise) do not corrupt the COM.  Pass ``cell=None`` only for
        unwrapped coordinates."""
        traj = np.asarray(traj)
        out = traj if in_place else traj.copy()
        static = traj[:, static_mask, :]
        disp = static - static[0:1]
        if cell is not None:
            cell = np.asarray(cell, dtype=np.float64)
            frac = disp @ np.linalg.inv(cell)
            disp = (frac - np.round(frac)) @ cell
        if self.masses is not None:
            w = np.asarray(self.masses, dtype=np.float64)
            w = w / w.sum()
            com = np.einsum("fnc,n->fc", disp, w)
        else:
            com = disp.mean(axis=1)
        out -= com[:, None, :]
        return out
