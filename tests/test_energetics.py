"""Site free energies and TST barriers from occupation statistics."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.core.sitetraj import SiteTrajectory
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import JumpAnalysis, SiteFreeEnergyAnalysis

KB = 8.617333262e-5


def _two_site_st(p_hi=0.8, F=20000, seed=5):
    """One ion equilibrated between two sites with occupancy p_hi/1-p_hi
    via a reversible Markov chain (detailed balance holds)."""
    rng = np.random.default_rng(seed)
    # transition probs chosen for stationary distribution (p_hi, 1-p_hi)
    a = 0.02                        # 0 -> 1 rate (from the deep site)
    b = a * p_hi / (1 - p_hi)       # 1 -> 0 rate
    labels = np.empty(F, np.int64)
    s = 0
    for t in range(F):
        labels[t] = s
        s = (1 - s) if rng.random() < (a if s == 0 else b) else s
    structure = Structure(np.zeros((3, 3)), [16, 16, 3], np.eye(3) * 8.0)
    sn = SiteNetwork(structure, np.array([1, 1, 0], bool),
                     np.array([0, 0, 1], bool))
    sn.centers = np.array([[2.0, 2, 2], [6.0, 6, 6]])
    st = SiteTrajectory(sn, labels[:, None])
    JumpAnalysis(verbose=False).run(st)
    return st, a, b


def test_free_energy_matches_occupancy_ratio():
    T = 600.0
    st, _, _ = _two_site_st(p_hi=0.8)
    SiteFreeEnergyAnalysis(temperature=T, verbose=False).run(st)
    F = st.site_network.site_free_energies
    occ = st.site_network.occupancies
    # reference site (most occupied) is 0; the other is kT ln(p0/p1)
    hi, lo = int(np.argmax(occ)), int(np.argmin(occ))
    assert F[hi] == 0.0
    expect = KB * T * np.log(occ[hi] / occ[lo])
    assert F[lo] == pytest.approx(expect, rel=1e-12)
    # ~kT ln 4 for p=0.8 (statistics within a few percent of 0.8)
    assert F[lo] == pytest.approx(KB * T * np.log(4.0), rel=0.15)


def test_barriers_detailed_balance_identity():
    """E_ij - E_ji == F_j - F_i when occupation equals residence —
    exactly the construction of this estimator."""
    T = 500.0
    st, a, b = _two_site_st(p_hi=0.7, F=40000, seed=9)
    SiteFreeEnergyAnalysis(temperature=T, timestep=1.0,
                           attempt_frequency=1.0, verbose=False).run(st)
    sn = st.site_network
    E = sn.barriers_ij
    F = sn.site_free_energies
    assert np.isfinite(E[0, 1]) and np.isfinite(E[1, 0])
    # exact up to the ±1 jump-count parity of a finite chain:
    # E_ij - E_ji - (F_j - F_i) = kT ln(n_ji/n_ij), |n_ij - n_ji| <= 1
    n01 = int(sn.n_ij[0, 1])
    tol = KB * T * 3.0 / n01
    np.testing.assert_allclose(E[0, 1] - E[1, 0], F[1] - F[0], atol=tol)
    # the barrier out of the deep site reflects the 0->1 rate ~ a
    rate_01 = sn.n_ij[0, 1] / sn.total_corrected_residences[0]
    assert E[0, 1] == pytest.approx(-KB * T * np.log(rate_01), rel=1e-9)
    assert rate_01 == pytest.approx(a, rel=0.2)


def test_unvisited_and_off_graph_are_nan():
    st, _, _ = _two_site_st()
    sn = st.site_network
    # add a third, never-visited site by rebuilding with 3 centers
    structure = sn.structure
    sn3 = SiteNetwork(structure, sn.static_mask, sn.mobile_mask)
    sn3.centers = np.vstack([sn.centers, [[4.0, 4, 4]]])
    st3 = SiteTrajectory(sn3, st.traj.copy())
    JumpAnalysis(verbose=False).run(st3)
    SiteFreeEnergyAnalysis(temperature=300.0, attempt_frequency=1.0,
                           verbose=False).run(st3)
    F = sn3.site_free_energies
    E = sn3.barriers_ij
    assert np.isnan(F[2])
    assert np.isnan(E[2, :]).all() and np.isnan(E[:, 2]).all()
    assert np.isnan(np.diag(E)).all()


def test_validation():
    with pytest.raises(ValueError, match="positive kelvin"):
        SiteFreeEnergyAnalysis(temperature=-5)
    with pytest.raises(ValueError, match="reference"):
        SiteFreeEnergyAnalysis(temperature=300, reference="bogus")
    with pytest.raises(ValueError, match="attempt_frequency"):
        SiteFreeEnergyAnalysis(temperature=300, attempt_frequency=0.0)
    st, _, _ = _two_site_st(F=2000)
    st2 = SiteTrajectory(SiteNetwork(st.site_network.structure,
                                     st.site_network.static_mask,
                                     st.site_network.mobile_mask),
                         st.traj.copy())
    with pytest.raises(ValueError, match="JumpAnalysis first"):
        SiteFreeEnergyAnalysis(temperature=300, verbose=False).run(st2)
    # occupancies + n_ij present but total_corrected_residences absent:
    # the barriers route must raise the instructive error, not
    # AttributeError (needs it for the residence times)
    sn3 = SiteNetwork(st.site_network.structure,
                      st.site_network.static_mask,
                      st.site_network.mobile_mask)
    sn3.centers = st.site_network.centers.copy()
    sn3.add_site_attribute("occupancies",
                           np.full(sn3.n_sites, 0.5))
    sn3.add_edge_attribute("n_ij", np.ones((sn3.n_sites, sn3.n_sites)))
    st3 = SiteTrajectory(sn3, st.traj.copy())
    with pytest.raises(ValueError,
                       match="total_corrected_residences"):
        SiteFreeEnergyAnalysis(temperature=300, attempt_frequency=1.0,
                               verbose=False).run(st3)


def test_mean_reference_rerun_and_verbose():
    """reference='mean' pins F to -kT ln(occ/mean-occ); re-running the
    analysis replaces (never duplicates) both attributes; verbose logging
    paths execute (coverage audit)."""
    T = 500.0
    st, _, _ = _two_site_st(p_hi=0.7, F=8000, seed=3)
    an = SiteFreeEnergyAnalysis(temperature=T, attempt_frequency=1.0,
                                reference="mean", verbose=True)
    an.run(st)
    sn = st.site_network
    F1 = sn.site_free_energies.copy()
    E1 = sn.barriers_ij.copy()
    occ = sn.occupancies
    ref = occ[occ > 0].mean()
    np.testing.assert_allclose(F1, -KB * T * np.log(occ / ref),
                               rtol=1e-12)
    an.run(st)     # second run exercises the remove_attribute branches
    np.testing.assert_allclose(sn.site_free_energies, F1, rtol=0)
    np.testing.assert_allclose(sn.barriers_ij, E1, rtol=0)
