"""Site energetics from occupation statistics — free energies and
transition-state barrier estimates.

Beyond the reference surface but squarely in its ecosystem's workflow
(the landmark-analysis paper's downstream use of site occupancies,
SURVEY.md §1): in equilibrium the relative free energy of site i is

    F_i = -kB T ln(<occ_i> / <occ_ref>)

and a transition-state-theory estimate of the i→j barrier follows from
the observed rate against an attempt frequency ν:

    rate_ij = n_ij / t_i           (jumps per unit time spent at i)
    E_ij    = -kB T ln(rate_ij / ν)

Consistency identity (holds exactly when occupation counts equal
residence time): ``E_ij − E_ji = F_j − F_i`` — the detailed-balance
check ``tests/test_energetics.py`` asserts on synthetic equilibrium
data.

Run :class:`~sitator_tpu.dynamics.jump_analysis.JumpAnalysis` first —
this engine consumes its ``occupancies``, ``total_corrected_residences``
and ``n_ij`` attributes.
"""
from __future__ import annotations

import logging

import numpy as np

__all__ = ["SiteFreeEnergyAnalysis"]

logger = logging.getLogger(__name__)

_K_B_EV = 8.617333262e-5        # eV/K


class SiteFreeEnergyAnalysis:
    """Occupancy-based site free energies (and optional TST barriers).

    Parameters
    ----------
    temperature : kelvin.
    timestep : time per frame — needed (with ``attempt_frequency``) for
        barriers; rates are formed in its inverse unit.
    attempt_frequency : ν in 1/time-unit (e.g. from
        :class:`~sitator_tpu.dynamics.vibrational.
        AverageVibrationalFrequency`); None skips barriers.
    reference : ``'min'`` (most occupied site is F=0, default) or
        ``'mean'``.
    min_jumps : edges with fewer observed jumps get NaN barriers
        (default 1 — a single observed hop is a rate, barely).

    ``run(st)`` adds the site attribute ``site_free_energies`` (eV; NaN
    for never-occupied sites) and, when barriers are enabled, the edge
    attribute ``barriers_ij`` (eV; NaN off the observed jump graph).
    Returns the :class:`SiteTrajectory`.
    """

    def __init__(self, temperature, timestep=1.0, attempt_frequency=None,
                 reference="min", min_jumps=1, verbose=True):
        self.temperature = float(temperature)
        if self.temperature <= 0:
            raise ValueError("temperature must be positive kelvin")
        if reference not in ("min", "mean"):
            raise ValueError("reference must be 'min' or 'mean'")
        self.timestep = float(timestep)
        self.attempt_frequency = (None if attempt_frequency is None
                                  else float(attempt_frequency))
        if self.attempt_frequency is not None and \
                self.attempt_frequency <= 0:
            raise ValueError("attempt_frequency must be positive")
        self.reference = reference
        self.min_jumps = int(min_jumps)
        self.verbose = verbose

    def run(self, st):
        sn = st.site_network
        needed = ["occupancies", "n_ij"]
        if self.attempt_frequency is not None:
            needed.append("total_corrected_residences")
        missing = [a for a in needed
                   if a not in sn.site_attributes
                   and a not in sn.edge_attributes]
        if missing:
            raise ValueError("run JumpAnalysis first (needs "
                             + ", ".join(missing) + ")")
        kT = _K_B_EV * self.temperature
        occ = np.asarray(sn.occupancies, dtype=np.float64)

        with np.errstate(divide="ignore", invalid="ignore"):
            ref = (occ.max() if self.reference == "min"
                   else occ[occ > 0].mean())
            F = np.where(occ > 0, -kT * np.log(occ / ref), np.nan)
        if "site_free_energies" in sn.site_attributes:
            sn.remove_attribute("site_free_energies")
        sn.add_site_attribute("site_free_energies", F)

        if self.attempt_frequency is not None:
            n_ij = np.asarray(sn.n_ij, dtype=np.float64)
            # time spent at i, in time units (occupation counts are
            # frame-counts summed over ions)
            t_i = (np.asarray(sn.total_corrected_residences,
                              dtype=np.float64) * self.timestep)
            with np.errstate(divide="ignore", invalid="ignore"):
                rate = n_ij / t_i[:, None]
                E = -kT * np.log(rate / self.attempt_frequency)
            off_graph = (n_ij < self.min_jumps) | ~(t_i[:, None] > 0)
            E = np.where(off_graph, np.nan, E)
            np.fill_diagonal(E, np.nan)
            if "barriers_ij" in sn.edge_attributes:
                sn.remove_attribute("barriers_ij")
            sn.add_edge_attribute("barriers_ij", E)
            if self.verbose:
                finite = E[np.isfinite(E)]
                if len(finite):
                    logger.info(
                        "barriers: %d edges, median %.3g eV "
                        "(nu = %.3g)", len(finite),
                        float(np.median(finite)), self.attempt_frequency)
        if self.verbose:
            good = F[np.isfinite(F)]
            logger.info("site free energies: spread %.3g eV over %d "
                        "occupied sites", float(np.ptp(good)) if
                        len(good) else float("nan"), len(good))
        return st
