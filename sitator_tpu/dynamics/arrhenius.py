"""Arrhenius analysis — activation energy from a temperature series.

Closes the kinetics loop opened by :mod:`sitator_tpu.dynamics.diffusion`
(beyond the reference surface, SURVEY.md §3.4): given diffusivities (or
jump rates, or conductivity·T products — anything Arrhenius-activated)
measured at several temperatures, fit ``ln y = ln y0 - Ea / (kB T)`` by
(optionally error-weighted) least squares and report the activation
energy with a covariance-derived uncertainty.
"""
from __future__ import annotations

import logging

import numpy as np

__all__ = ["ArrheniusAnalysis"]

logger = logging.getLogger(__name__)

_K_B_EV = 8.617333262e-5        # eV/K


class ArrheniusAnalysis:
    """Fit ``y(T) = y0 * exp(-Ea / kB T)``.

    ``run(temperatures, values, errors=None)`` with temperatures in
    kelvin; ``errors`` are 1-sigma uncertainties of ``values`` (used as
    weights and propagated into the parameter covariance).  After
    ``run``: ``Ea_ev_``, ``Ea_err_ev_``, ``prefactor_``,
    ``log_prefactor_err_``, ``residuals_`` (in ln-space); returns
    ``self``.  ``predict(T)`` evaluates the fit.
    """

    def __init__(self, verbose=True):
        self.verbose = verbose

    def run(self, temperatures, values, errors=None):
        T = np.asarray(temperatures, dtype=np.float64)
        y = np.asarray(values, dtype=np.float64)
        if T.shape != y.shape or T.ndim != 1:
            raise ValueError("temperatures and values must be equal-length "
                             "1-D arrays")
        if len(T) < 2:
            raise ValueError("need at least 2 temperatures")
        if (T <= 0).any():
            raise ValueError("temperatures must be positive kelvin")
        if (y <= 0).any():
            raise ValueError("values must be positive (Arrhenius is a fit "
                             "in ln space)")
        if np.unique(T).size < 2:
            raise ValueError("temperatures must contain at least 2 "
                             "distinct values")
        x = 1.0 / T
        ln_y = np.log(y)
        if errors is not None:
            errors = np.asarray(errors, dtype=np.float64)
            if (errors <= 0).any():
                raise ValueError("errors must be positive")
            w = y / errors                 # d(ln y) = dy / y
        else:
            w = np.ones_like(y)

        # weighted linear fit ln_y = b + m * x, m = -Ea/kB
        A = np.stack([x, np.ones_like(x)], axis=1) * w[:, None]
        coef, *_ = np.linalg.lstsq(A, ln_y * w, rcond=None)
        m, b = coef
        resid = ln_y - (b + m * x)
        # parameter covariance: sigma^2 * (A^T A)^-1 with sigma^2 from
        # residuals when unweighted / unit-weight chi^2 otherwise
        dof = max(1, len(T) - 2)
        cov = np.linalg.inv(A.T @ A)
        if errors is None:
            cov = cov * float((resid ** 2 * w ** 2).sum() / dof)
        self.Ea_ev_ = float(-m * _K_B_EV)
        self.Ea_err_ev_ = float(np.sqrt(cov[0, 0]) * _K_B_EV)
        self.prefactor_ = float(np.exp(b))
        self.log_prefactor_err_ = float(np.sqrt(cov[1, 1]))
        self.residuals_ = resid
        if self.verbose:
            logger.info("Ea = %.4g ± %.2g eV, prefactor = %.4g",
                        self.Ea_ev_, self.Ea_err_ev_, self.prefactor_)
        return self

    def predict(self, temperatures):
        T = np.asarray(temperatures, dtype=np.float64)
        return self.prefactor_ * np.exp(-self.Ea_ev_ / (_K_B_EV * T))
