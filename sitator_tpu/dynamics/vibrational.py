"""``AverageVibrationalFrequency`` — attempt-frequency estimate.

Reference parity: ``sitator/dynamics/AverageVibrationalFrequency``
(SURVEY.md §3.4 ⚠ low-confidence component): the spectrally-averaged
vibrational frequency of the mobile ions, used to normalize jump rates into
attempt frequencies.  Computed as the power-spectrum-weighted mean frequency
of the mobile-ion velocity signal (FFT of minimum-image frame-difference
velocities).
"""
from __future__ import annotations

import numpy as np

from sitator_tpu.ops.pbc import PBCCalculator


class AverageVibrationalFrequency:
    """Parameters
    ----------
    timestep : MD timestep between stored frames (any time unit; the result
        is in cycles per that unit).
    freq_cut : optional (lo, hi) band (same units) to integrate over.
    """

    def __init__(self, timestep=1.0, freq_cut=None, verbose=True):
        self.timestep = float(timestep)
        self.freq_cut = freq_cut
        self.verbose = verbose

    def run(self, st_or_traj, mobile_mask=None, cell=None):
        """Accepts a SiteTrajectory with a real trajectory attached, or a raw
        ``(n_frames, n_atoms, 3)`` array plus ``mobile_mask``/``cell``.
        Returns the average vibrational frequency (float).  When given a
        SiteTrajectory, also writes site attribute-independent scalar onto
        ``site_network`` as ``avg_vibrational_freq`` metadata."""
        if hasattr(st_or_traj, "real_trajectory"):
            st = st_or_traj
            traj = st.real_trajectory
            if traj is None:
                raise ValueError("SiteTrajectory has no real trajectory")
            sn = st.site_network
            mobile_mask = sn.mobile_mask
            cell = sn.structure.cell
        else:
            st = None
            traj = np.asarray(st_or_traj)
            if mobile_mask is None or cell is None:
                raise ValueError("raw trajectory needs mobile_mask and cell")

        calc = PBCCalculator(cell)
        pos = traj[:, mobile_mask, :].astype(np.float64)
        disp = pos[1:] - pos[:-1]
        disp = disp.reshape(-1, 3)
        disp = calc._min_image_disp(disp).reshape(len(pos) - 1, -1, 3)
        v = disp / self.timestep                      # (F-1, M, 3)

        spec = np.abs(np.fft.rfft(v - v.mean(0), axis=0)) ** 2
        power = spec.sum(axis=(1, 2))                 # (F//2+1,)
        freqs = np.fft.rfftfreq(v.shape[0], d=self.timestep)
        sel = freqs > 0
        if self.freq_cut is not None:
            lo, hi = self.freq_cut
            sel &= (freqs >= lo) & (freqs <= hi)
        p = power[sel]
        f = freqs[sel]
        if p.sum() == 0:
            return 0.0
        nu = float((f * p).sum() / p.sum())
        if st is not None:
            # scalar metadata: store as a per-site constant attribute so it
            # survives subsetting/merging like any other result
            sn = st.site_network
            if "avg_vibrational_freq" in sn.site_attributes:
                sn.remove_attribute("avg_vibrational_freq")
            sn.add_site_attribute(
                "avg_vibrational_freq", np.full(sn.n_sites, nu))
        return nu
