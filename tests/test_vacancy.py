"""VacancyAnalysis: unoccupied sites tracked as labeled quasi-particles,
exactly recovering an exchange-dynamics ground truth."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.core.sitetraj import SiteTrajectory
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import (JumpAnalysis, SiteDiffusionAnalysis,
                                  VacancyAnalysis)


def _lattice_network(n=4, a=3.0):
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
    centers = (grid + 0.5) * a
    S = len(centers)
    structure = Structure(np.zeros((2, 3)), [16, 3], np.eye(3) * n * a)
    sn = SiteNetwork(structure, np.array([1, 0], bool),
                     np.array([0, 1], bool))
    sn.centers = centers
    neigh = []
    idx = {tuple(g): i for i, g in enumerate(grid)}
    for g in grid:
        row = []
        for d in range(3):
            for sgn in (-1, 1):
                h = g.copy()
                h[d] = (h[d] + sgn) % n
                row.append(idx[tuple(h)])
        neigh.append(row)
    return sn, np.asarray(neigh)


def _exchange_dynamics(S, neigh, F, q, seed, start=0):
    """Single-vacancy exchange MD on the site graph: ion labels (F, S-1)
    plus the ground-truth vacancy path (F,)."""
    rng = np.random.default_rng(seed)
    site_of_ion = np.array([s for s in range(S) if s != start],
                           dtype=np.int64)
    ion_at = {s: i for i, s in enumerate(site_of_ion)}
    vac = start
    labels = np.empty((F, S - 1), np.int64)
    path = np.empty(F, np.int64)
    for f in range(F):
        labels[f] = site_of_ion
        path[f] = vac
        if rng.random() < q:
            nxt = neigh[vac][rng.integers(0, len(neigh[vac]))]
            i = ion_at.pop(nxt)           # ion at the target site...
            site_of_ion[i] = vac          # ...hops into the vacancy
            ion_at[vac] = i
            vac = nxt
    return labels, path


def test_single_vacancy_recovered_exactly():
    sn, neigh = _lattice_network(n=3)
    S = sn.n_sites
    labels, path = _exchange_dynamics(S, neigh, F=800, q=0.4, seed=1)
    # mobile count must match labels width: rebuild masks accordingly
    structure = Structure(np.zeros((S, 3)), [16] + [3] * (S - 1),
                          sn.structure.cell)
    mask = np.zeros(S, bool)
    mask[0] = True
    sn2 = SiteNetwork(structure, mask, ~mask)
    sn2.centers = sn.centers
    st = SiteTrajectory(sn2, labels)
    va = VacancyAnalysis(verbose=False)
    vt = va.run(st)
    assert va.n_identities_ == 1
    np.testing.assert_array_equal(vt.traj[:, 0], path)
    # the vacancy toolchain: JumpAnalysis counts exactly the moves
    ja = JumpAnalysis(verbose=False)
    ja.run(vt)
    assert ja.n_jumps == int((np.diff(path) != 0).sum())


def test_vacancy_diffusivity_matches_theory():
    """Single vacancy on a 4^3 lattice with total move prob q: the
    vacancy is a random walker with D = q a^2 / 6."""
    sn, neigh = _lattice_network(n=4, a=3.0)
    S = sn.n_sites
    labels, path = _exchange_dynamics(S, neigh, F=40000, q=0.3, seed=2)
    structure = Structure(np.zeros((S, 3)), [16] + [3] * (S - 1),
                          sn.structure.cell)
    mask = np.zeros(S, bool)
    mask[0] = True
    sn2 = SiteNetwork(structure, mask, ~mask)
    sn2.centers = sn.centers
    vt = VacancyAnalysis(verbose=False).run(SiteTrajectory(sn2, labels))
    da = SiteDiffusionAnalysis(timestep=1.0, fit_range=(0.002, 0.02),
                               verbose=False).run(vt)
    D_theory = 0.3 * 3.0 ** 2 / 6.0
    assert da.D_site_ == pytest.approx(D_theory, rel=0.15)


def test_two_vacancies_keep_identities():
    """Two far-apart vacancies doing small independent moves keep their
    identities under the frame-to-frame assignment."""
    sn, neigh = _lattice_network(n=4)
    S = sn.n_sites
    # hand-build occupations: vacancies walk on opposite corners
    pa = [0, 1, 1, 0, 0]
    pb = [63, 63, 62, 62, 63]
    F = len(pa)
    labels = np.empty((F, S - 2), np.int64)
    for f in range(F):
        occ = [s for s in range(S) if s not in (pa[f], pb[f])]
        labels[f] = occ
    structure = Structure(np.zeros((S, 3)), [16, 16] + [3] * (S - 2),
                          sn.structure.cell)
    mask = np.zeros(S, bool)
    mask[:2] = True
    sn2 = SiteNetwork(structure, mask, ~mask)
    sn2.centers = sn.centers
    vt = VacancyAnalysis(verbose=False).run(SiteTrajectory(sn2, labels))
    assert vt.n_mobile == 2
    got = {tuple(vt.traj[:, 0]), tuple(vt.traj[:, 1])}
    assert got == {tuple(pa), tuple(pb)}


def test_unknown_policies_and_validation():
    sn, _ = _lattice_network(n=3)
    S = sn.n_sites
    structure = Structure(np.zeros((S, 3)), [16] + [3] * (S - 1),
                          sn.structure.cell)
    mask = np.zeros(S, bool)
    mask[0] = True
    sn2 = SiteNetwork(structure, mask, ~mask)
    sn2.centers = sn.centers
    # ion 0 unassigned in frame 1: 'persist' keeps its site occupied
    # (one vacancy), 'strict' opens a second vacancy that frame
    labels = np.tile(np.arange(1, S, dtype=np.int64), (3, 1))
    labels[1, 0] = -1
    st = SiteTrajectory(sn2, labels)
    va_p = VacancyAnalysis(unknown_policy="persist", verbose=False)
    vt = va_p.run(st)
    np.testing.assert_array_equal(va_p.n_vacancies_, [1, 1, 1])
    np.testing.assert_array_equal(vt.traj[:, 0], [0, 0, 0])
    va_s = VacancyAnalysis(unknown_policy="strict", verbose=False)
    vt2 = va_s.run(st)
    np.testing.assert_array_equal(va_s.n_vacancies_, [1, 2, 1])
    assert va_s.n_identities_ == 2
    assert vt2.traj[1, 1] == 1          # ion 0's site opens briefly
    assert vt2.traj[0, 1] == SiteTrajectory.SITE_UNKNOWN
    with pytest.raises(ValueError, match="unknown_policy"):
        VacancyAnalysis(unknown_policy="bogus")
    # fully occupied lattice -> no vacancies
    full = np.tile(np.arange(S, dtype=np.int64), (2, 1))
    structure3 = Structure(np.zeros((S + 1, 3)), [16] + [3] * S,
                           sn.structure.cell)
    mask3 = np.zeros(S + 1, bool)
    mask3[0] = True
    sn3 = SiteNetwork(structure3, mask3, ~mask3)
    sn3.centers = sn.centers
    with pytest.raises(ValueError, match="no vacancies"):
        VacancyAnalysis(verbose=False).run(SiteTrajectory(sn3, full))


def test_max_step_rebirth():
    """A vacancy teleporting farther than max_step starts a new
    identity instead of pretending to hop across the cell."""
    sn, _ = _lattice_network(n=4, a=3.0)
    S = sn.n_sites
    structure = Structure(np.zeros((S, 3)), [16] + [3] * (S - 1),
                          sn.structure.cell)
    mask = np.zeros(S, bool)
    mask[0] = True
    sn2 = SiteNetwork(structure, mask, ~mask)
    sn2.centers = sn.centers
    # vacancy at site 0, then suddenly at the far corner (site 63 is
    # ~7.8 A away min-image), then stays
    F = 4
    labels = np.empty((F, S - 1), np.int64)
    for f, v in enumerate([0, 0, 63, 63]):
        labels[f] = [s for s in range(S) if s != v]
    va = VacancyAnalysis(max_step=4.0, verbose=False)
    vt = va.run(SiteTrajectory(sn2, labels))
    assert va.n_rebirths_ == 1
    assert va.n_identities_ == 2
    np.testing.assert_array_equal(vt.traj[:, 0], [0, 0, -1, -1])
    np.testing.assert_array_equal(vt.traj[:, 1], [-1, -1, 63, 63])


def test_identity_continuity_and_death_without_teleport():
    """Identity continuity across moves, and death-without-teleport when
    a vacancy annihilates: a short-lived second vacancy is born and
    dies in place rather than resurrecting elsewhere (review finding
    r4: deaths must also happen when the match set is empty)."""
    structure = Structure(np.zeros((3, 3)), [16, 3, 3], np.eye(3) * 12.0)
    mask = np.array([1, 0, 0], bool)
    sn = SiteNetwork(structure, mask, ~mask)
    sn.centers = np.array([[1.0, 1, 1], [2.0, 1, 1], [9.0, 9, 9]])
    # 2 ions over 3 sites: one identity walks 2 -> 1 -> 0
    lab = np.array([[0, 1], [0, 2], [1, 2]], np.int64)
    va = VacancyAnalysis(verbose=False)
    vt = va.run(SiteTrajectory(sn, lab))
    assert va.n_identities_ == 1
    np.testing.assert_array_equal(vt.traj[:, 0], [2, 1, 0])
    # multiple occupancy opens a second vacancy for one frame: it must
    # be born at site 1 and die there, never teleporting onward
    lab2 = np.array([[0, 1], [0, 0], [0, 1]], np.int64)
    va2 = VacancyAnalysis(max_step=4.0, verbose=False)
    vt2 = va2.run(SiteTrajectory(sn, lab2))
    cols = [tuple(vt2.traj[:, k]) for k in range(va2.n_identities_)]
    assert (2, 2, 2) in cols
    assert (-1, 1, -1) in cols
