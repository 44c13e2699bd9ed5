"""Validation-raise sweep across the dynamics engines (round-5 line
coverage audit): each engine's input-shape / row-stochasticity /
parameter-range guards, exercised directly."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory
from sitator_tpu.core.structure import Structure


@pytest.fixture()
def sn3():
    pos = np.array([[1.0, 1, 1], [3, 1, 1], [1, 3, 1], [2, 2, 2]])
    s = Structure(pos, [16, 16, 16, 3], np.eye(3) * 6.0)
    static = np.array([1, 1, 1, 0], bool)
    net = SiteNetwork(s, static, ~static)
    net.centers = np.array([[1.0, 1, 1], [3, 1, 1], [1, 3, 1.0]])
    return net


def _with_jump_stats(sn, n_ij, res):
    sn.add_edge_attribute("n_ij", np.asarray(n_ij, np.float64))
    sn.add_site_attribute("total_corrected_residences",
                          np.asarray(res, np.float64))
    return sn


def test_kmc_requires_jump_analysis_and_shapes(sn3):
    from sitator_tpu.dynamics import KineticMonteCarlo
    from sitator_tpu.dynamics.kmc import transition_matrix_from_network
    with pytest.raises(ValueError, match="run JumpAnalysis first"):
        KineticMonteCarlo(n_frames=8).run(sn3)
    # n_ij with wrong shape
    bad = sn3.copy()
    bad._edge_attrs["n_ij"] = np.zeros((2, 2))
    bad.add_site_attribute("total_corrected_residences", np.ones(3))
    with pytest.raises(ValueError, match="n_ij must be"):
        transition_matrix_from_network(bad)
    # over-unit row mass triggers the renormalization warning path
    noisy = _with_jump_stats(sn3.copy(),
                             [[0, 9, 9], [1, 0, 1], [1, 1, 0]],
                             [2.0, 100.0, 100.0])
    P = transition_matrix_from_network(noisy)
    np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-12)
    assert (P >= 0).all()


def test_kmc_transition_matrix_validation(sn3):
    from sitator_tpu.dynamics import KineticMonteCarlo
    _with_jump_stats(sn3, [[0, 5, 1], [5, 0, 1], [1, 1, 0]],
                     [50.0, 50.0, 50.0])
    with pytest.raises(ValueError, match=r"must be \(3, 3\)"):
        KineticMonteCarlo(n_frames=8,
                          transition_matrix=np.eye(2)).run(sn3)
    with pytest.raises(ValueError, match="row-stochastic"):
        KineticMonteCarlo(n_frames=8,
                          transition_matrix=np.full((3, 3), 0.5)).run(sn3)


def test_mfpt_validation():
    from sitator_tpu.dynamics.kmc import mean_first_passage_times as mfpt
    with pytest.raises(ValueError, match="P must be square"):
        mfpt(np.zeros((2, 3)))
    with pytest.raises(ValueError, match="row-stochastic"):
        mfpt(np.full((2, 2), 0.9))


def test_conductivity_spectrum_ctor_validation():
    from sitator_tpu.dynamics import ConductivitySpectrumAnalysis as CSA
    with pytest.raises(ValueError, match="one entry per group"):
        CSA(groups=["Li"], charges=[1.0, -1.0], timestep=1.0,
            temperature=600.0)
    with pytest.raises(ValueError, match="at least one species group"):
        CSA(groups=[], charges=[], timestep=1.0, temperature=600.0)
    with pytest.raises(ValueError, match="n_segments"):
        CSA(groups=["Li"], charges=[1.0], timestep=1.0,
            temperature=600.0, n_segments=0)
    with pytest.raises(ValueError, match="integral_window"):
        CSA(groups=["Li"], charges=[1.0], timestep=1.0,
            temperature=600.0, integral_window=(0.5, 0.2))


def test_vacf_requires_real_trajectory(sn3):
    from sitator_tpu.dynamics import VibrationalSpectrumAnalysis
    st = SiteTrajectory(sn3, np.zeros((8, 1), int))
    with pytest.raises(ValueError, match="no real trajectory"):
        VibrationalSpectrumAnalysis(timestep=1.0).run(st)


def test_diffusion_site_analysis_needs_centers(sn3):
    from sitator_tpu.dynamics import SiteDiffusionAnalysis
    bare = SiteNetwork(sn3.structure, sn3.static_mask, sn3.mobile_mask)
    st = SiteTrajectory(bare, np.zeros((8, 1), int))
    with pytest.raises(ValueError, match="no centers"):
        SiteDiffusionAnalysis(timestep=1.0).run(st)
