"""Onsager matrix: cross-MSD FFT vs brute force, independence limits,
single-species reduction to DiffusionAnalysis conductivity, and the
ion-pairing zero-conductivity limit."""
import numpy as np
import pytest

from sitator_tpu.ops import msd as msd_ops
from sitator_tpu.dynamics import DiffusionAnalysis, OnsagerAnalysis


def brute_cross_msd(xa, xb):
    F = len(xa)
    out = np.zeros(F)
    for m in range(1, F):
        da = xa[m:] - xa[:-m]
        db = xb[m:] - xb[:-m]
        out[m] = (da * db).sum(-1).mean()
    return out


def test_cross_msd_fft_matches_brute_force():
    rng = np.random.default_rng(3)
    xa = np.cumsum(rng.normal(size=(71, 3)), axis=0)
    xb = np.cumsum(rng.normal(size=(71, 3)), axis=0) + 0.4 * xa
    got = msd_ops.cross_msd_fft(xa, xb)
    np.testing.assert_allclose(got, brute_cross_msd(xa, xb),
                               rtol=1e-8, atol=1e-8)
    # symmetric in its arguments, and self-cross == collective MSD
    np.testing.assert_allclose(got, msd_ops.cross_msd_fft(xb, xa),
                               rtol=1e-12)
    coll = np.asarray(msd_ops.collective_msd_fft(xa[:, None, :]))
    np.testing.assert_allclose(msd_ops.cross_msd_fft(xa, xa), coll,
                               rtol=1e-9, atol=1e-9)


def _walk(rng, F, M, D, dt=1.0):
    steps = rng.normal(scale=np.sqrt(2 * D * dt), size=(F - 1, M, 3))
    return np.concatenate([np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)


def test_independent_groups_diagonal_dominant():
    rng = np.random.default_rng(7)
    F, Ma, Mb = 3000, 20, 15
    traj = np.concatenate([_walk(rng, F, Ma, 0.3),
                           _walk(rng, F, Mb, 0.1)], axis=1)
    mask_a = np.zeros(Ma + Mb, bool); mask_a[:Ma] = True
    mask_b = ~mask_a
    # collective statistics are those of ONE effective walker per
    # group: use an early fit window and loose factor-level tolerances
    oa = OnsagerAnalysis([mask_a, mask_b], fit_range=(0.02, 0.1),
                         verbose=False).run(traj, cell=np.eye(3) * 1e4)
    np.testing.assert_array_equal(oa.n_atoms_, [Ma, Mb])
    # diagonal: Lambda_aa ~ M_a * D_a (independent walkers)
    assert 0.4 < oa.L_[0, 0] / (Ma * 0.3) < 2.5
    assert 0.4 < oa.L_[1, 1] / (Mb * 0.1) < 2.5
    # off-diagonal ~ 0 relative to the diagonals
    assert abs(oa.L_[0, 1]) < 0.6 * np.sqrt(oa.L_[0, 0] * oa.L_[1, 1])
    np.testing.assert_allclose(oa.L_, oa.L_.T, rtol=0)


def test_single_species_reduces_to_diffusion_analysis():
    rng = np.random.default_rng(11)
    F, M, T = 2000, 25, 600.0
    traj = _walk(rng, F, M, 0.2)
    cell = np.eye(3) * 30.0
    mask = np.ones(M, bool)
    da = DiffusionAnalysis(temperature=T, charge=1.0,
                           verbose=False).run(traj, mobile_mask=mask,
                                              cell=cell)
    oa = OnsagerAnalysis([mask], temperature=T, charges=[1.0],
                         verbose=False).run(traj, cell=cell)
    # Lambda_aa = M * D_collective and the SAME conductivity formula
    assert oa.L_[0, 0] == pytest.approx(M * da.D_collective_, rel=1e-9)
    assert oa.conductivity_ == pytest.approx(da.conductivity_, rel=1e-9)
    np.testing.assert_allclose(oa.transference_, [1.0], rtol=1e-12)


def test_ion_pairing_kills_conductivity():
    """Perfectly paired +/- ions (identical displacements): every self
    term is large but z.L.z == 0 -> sigma NaN, transference NaN."""
    rng = np.random.default_rng(13)
    F, M = 1500, 12
    cation = _walk(rng, F, M, 0.25)
    traj = np.concatenate([cation, cation + 1.5], axis=1)  # bound pairs
    mask_c = np.zeros(2 * M, bool); mask_c[:M] = True
    oa = OnsagerAnalysis([mask_c, ~mask_c], temperature=500.0,
                         charges=[1.0, -1.0], verbose=False).run(
        traj, cell=np.eye(3) * 1e4)
    assert oa.L_[0, 0] > 0 and oa.L_[1, 1] > 0
    # identical walks: Lambda_ab == Lambda_aa exactly
    assert oa.L_[0, 1] == pytest.approx(oa.L_[0, 0], rel=1e-9)
    assert np.isnan(oa.conductivity_)
    assert np.isnan(oa.transference_).all()


def test_onsager_validation():
    with pytest.raises(ValueError, match="at least one"):
        OnsagerAnalysis([])
    with pytest.raises(ValueError, match="one entry per group"):
        OnsagerAnalysis([np.ones(3, bool)], charges=[1.0, -1.0])
    traj = np.zeros((20, 4, 3))
    m = np.ones(4, bool)
    with pytest.raises(ValueError, match="overlap"):
        OnsagerAnalysis([m, m], verbose=False).run(traj,
                                                   cell=np.eye(3) * 5)
    with pytest.raises(ValueError, match="no atoms"):
        OnsagerAnalysis([np.zeros(4, bool)], verbose=False).run(
            traj, cell=np.eye(3) * 5)
    with pytest.raises(ValueError, match="needs cell"):
        OnsagerAnalysis([m], verbose=False).run(traj)
    with pytest.raises(ValueError, match="boolean"):
        OnsagerAnalysis(["mobile"], verbose=False).run(
            traj, cell=np.eye(3) * 5)
    with pytest.raises(ValueError, match="at least 8"):
        OnsagerAnalysis([m], verbose=False).run(traj[:4],
                                                cell=np.eye(3) * 5)


def test_onsager_sitetrajectory_route_with_species_numbers():
    from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
    rng = np.random.default_rng(17)
    F, M = 600, 10
    traj = _walk(rng, F, M, 0.2) + 25.0
    pos = np.concatenate([np.zeros((2, 3)), traj[0]])
    species = np.array([16] * 2 + [3] * 5 + [11] * 5)
    s = Structure(pos, species, np.eye(3) * 50.0)
    sn = SiteNetwork(s, s.species == 16, s.species != 16)
    sn.centers = np.zeros((1, 3))
    st = SiteTrajectory(sn, np.zeros((F, M), dtype=int))
    st.set_real_traj(np.concatenate([np.zeros((F, 2, 3)), traj], axis=1))
    oa = OnsagerAnalysis([3, 11], charges=[1.0, 1.0],
                         temperature=300.0, verbose=False).run(st)
    np.testing.assert_array_equal(oa.n_atoms_, [5, 5])
    assert np.isfinite(oa.conductivity_)
    assert oa.transference_.sum() == pytest.approx(1.0, rel=1e-9)


def _walk_in_cell(rng, F, M, scale, size=50.0):
    steps = rng.normal(scale=scale, size=(F - 1, M, 3))
    traj = size / 2 + np.concatenate(
        [np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)
    frac = traj / size
    return (frac - np.floor(frac)) * size


def test_onsager_all_frame_row_sums_vanish():
    """When the groups partition every atom and the matrix is taken in
    the 'all' mean frame, the total displacement is identically zero —
    every row of the cross-MSD curves (hence of Λ) vanishes."""
    rng = np.random.default_rng(41)
    F, M = 400, 12
    traj = _walk_in_cell(rng, F, M, 0.3)
    ga = np.zeros(M, bool); ga[:5] = True
    gb = np.zeros(M, bool); gb[5:9] = True
    gc = ~(ga | gb)
    oa = OnsagerAnalysis([ga, gb, gc], drift_correction="all",
                         verbose=False).run(traj, cell=np.eye(3) * 50.0)
    assert oa.drift_ is not None
    np.testing.assert_allclose(oa.msd_cross_.sum(axis=1), 0.0,
                               atol=1e-8)
    np.testing.assert_allclose(oa.L_.sum(axis=1), 0.0, atol=1e-10)


def test_onsager_host_frame_removes_injected_drift():
    """A rigid drift applied to all atoms changes the lab-frame matrix;
    pinning to the frozen host atoms restores the undrifted Λ exactly."""
    rng = np.random.default_rng(43)
    F, M, S = 500, 8, 6
    size = 50.0
    mobile = size / 2 + np.concatenate(
        [np.zeros((1, M, 3)),
         np.cumsum(rng.normal(scale=0.3, size=(F - 1, M, 3)), 0)], 0)
    host = np.broadcast_to(rng.uniform(5, 45, (1, S, 3)), (F, S, 3))
    traj = np.concatenate([mobile, host], axis=1)
    drift = np.arange(F)[:, None] * np.array([0.05, -0.03, 0.04])
    drifted = traj + drift[:, None, :]
    wrap = lambda t: (t / size - np.floor(t / size)) * size
    g = np.zeros(M + S, bool); g[:M] = True
    host_mask = ~g
    cell = np.eye(3) * size
    base = OnsagerAnalysis([g], verbose=False).run(wrap(traj), cell=cell)
    raw = OnsagerAnalysis([g], verbose=False).run(wrap(drifted),
                                                  cell=cell)
    fixed = OnsagerAnalysis([g], drift_correction=host_mask,
                            verbose=False).run(wrap(drifted), cell=cell)
    assert raw.L_[0, 0] > 2 * base.L_[0, 0]        # frame-dependent
    np.testing.assert_allclose(fixed.drift_, drift, atol=1e-9)
    np.testing.assert_allclose(fixed.L_, base.L_, rtol=1e-9)


def test_onsager_drift_correction_validation():
    rng = np.random.default_rng(47)
    traj = _walk_in_cell(rng, 50, 4, 0.2)
    m = np.ones(4, bool)
    cell = np.eye(3) * 50.0
    with pytest.raises(ValueError, match="needs a SiteTrajectory"):
        OnsagerAnalysis([m], drift_correction="static",
                        verbose=False).run(traj, cell=cell)
    with pytest.raises(ValueError, match="must be"):
        OnsagerAnalysis([m], drift_correction=np.ones(7, bool),
                        verbose=False).run(traj, cell=cell)
