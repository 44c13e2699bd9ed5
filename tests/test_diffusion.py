"""MSD / diffusivity engines: the FFT estimator against the brute-force
time-origin average, unwrapping against ground truth, and D recovery from
random walks with known diffusivity."""
import numpy as np
import pytest

from sitator_tpu.ops import msd as msd_ops
from sitator_tpu.dynamics import DiffusionAnalysis, SiteDiffusionAnalysis


def brute_msd(pos):
    """O(F^2) time-origin-averaged MSD oracle, (F,) mean over atoms."""
    F = pos.shape[0]
    out = np.zeros(F)
    for m in range(1, F):
        d = pos[m:] - pos[:-m]
        out[m] = (d ** 2).sum(axis=-1).mean()
    return out


def test_msd_fft_matches_brute_force():
    rng = np.random.default_rng(7)
    pos = np.cumsum(rng.normal(size=(65, 4, 3)), axis=0)  # odd F on purpose
    mean_msd, per_atom = msd_ops.msd_fft(pos.astype(np.float64))
    ref = brute_msd(pos)
    np.testing.assert_allclose(np.asarray(mean_msd), ref, rtol=1e-8,
                               atol=1e-8)
    # per-atom curves average to the mean curve
    np.testing.assert_allclose(np.asarray(per_atom).mean(0),
                               np.asarray(mean_msd), rtol=1e-10)
    assert float(mean_msd[0]) == 0.0


def test_collective_msd_matches_brute_force():
    rng = np.random.default_rng(8)
    pos = np.cumsum(rng.normal(size=(48, 3, 3)), axis=0)
    coll = np.asarray(msd_ops.collective_msd_fft(pos.astype(np.float64)))
    R = (pos - pos[:1]).sum(axis=1, keepdims=True)
    np.testing.assert_allclose(coll, brute_msd(R), rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("triclinic", [False, True])
def test_unwrap_recovers_continuous_path(triclinic):
    rng = np.random.default_rng(11)
    cell = np.diag([6.0, 7.0, 8.0])
    if triclinic:
        cell = cell + np.array([[0, 1.1, 0.4], [0, 0, 0.9], [0, 0, 0]])
    # continuous walk with steps well under half a cell vector
    truth = np.cumsum(rng.normal(scale=0.4, size=(200, 5, 3)), axis=0)
    frac = truth @ np.linalg.inv(cell)
    wrapped = (frac - np.floor(frac)) @ cell
    unwrapped = np.asarray(msd_ops.unwrap_trajectory(
        wrapped.astype(np.float64), cell))
    # continuous up to the (constant) image offset of frame 0
    shift = truth[0] - unwrapped[0]
    np.testing.assert_allclose(unwrapped + shift, truth, atol=1e-8)


def test_diffusion_analysis_recovers_known_D():
    """Gaussian walk with per-component step variance 2*D*dt → fitted
    tracer D within a few percent; H_R ≈ 1 for independent walkers."""
    rng = np.random.default_rng(13)
    D_true, dt = 0.35, 2.0
    F, M = 3000, 40
    steps = rng.normal(scale=np.sqrt(2 * D_true * dt), size=(F - 1, M, 3))
    traj = np.concatenate([np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)
    cell = np.eye(3) * 50.0
    frac = traj @ np.linalg.inv(cell)
    wrapped = (frac - np.floor(frac)) @ cell

    da = DiffusionAnalysis(timestep=dt, fit_range=(0.05, 0.25),
                           verbose=False).run(
        wrapped, mobile_mask=np.ones(M, bool), cell=cell)
    # within 15% and within 3 of its own jackknife error bars
    assert da.D_tracer_ == pytest.approx(D_true, rel=0.15)
    assert abs(da.D_tracer_ - D_true) < 3 * da.D_tracer_err_
    assert da.D_tracer_err_ < 0.15 * D_true
    # independent walkers: collective D is noisier, but H_R ~ 1
    assert 0.4 < da.haven_ratio_ < 2.5
    assert da.conductivity_ is None
    # MSD curve itself is ~ 6 D t in the fit window
    mid = F // 3
    assert da.msd_[mid] == pytest.approx(6 * D_true * da.times_[mid],
                                         rel=0.1)


def test_conductivity_nernst_einstein_closed_form():
    """conductivity_ reproduces sigma = N q^2 e^2 D_coll / (V kB T) with
    the documented Å/ps/e/K unit convention."""
    rng = np.random.default_rng(17)
    F, M = 1200, 16
    steps = rng.normal(scale=0.3, size=(F - 1, M, 3))
    traj = np.concatenate([np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)
    cell = np.eye(3) * 40.0
    da = DiffusionAnalysis(timestep=1.0, temperature=600.0, charge=1.0,
                           verbose=False).run(
        traj, mobile_mask=np.ones(M, bool), cell=cell)
    e, kb = 1.602176634e-19, 1.380649e-23
    expect = (M * e ** 2 * (da.D_collective_ * 1e-8)
              / (40.0 ** 3 * 1e-30 * kb * 600.0)) / 100.0
    assert da.conductivity_ == pytest.approx(expect, rel=1e-12)


def test_site_diffusion_tracks_hopping_pipeline():
    """End-to-end: hopping MD → landmark sites → SiteDiffusionAnalysis
    vs DiffusionAnalysis on the real trajectory agree on the order of the
    diffusivity (site discretization drops only intra-site motion)."""
    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu import SiteNetwork
    from sitator_tpu.voronoi import VoronoiSiteGenerator
    from sitator_tpu.landmark import LandmarkAnalysis

    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=6, n_frames=800,
                                 jump_rate=0.05, seed=21)
    sn = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    sn = VoronoiSiteGenerator(merge_tol=0.05).run(sn)
    st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                         verbose=False).run(sn, md.traj)
    st.set_real_traj(md.traj)

    da = DiffusionAnalysis(timestep=1.0, verbose=False).run(st)
    sd = SiteDiffusionAnalysis(timestep=1.0, verbose=False).run(st)
    assert da.D_tracer_ > 0 and sd.D_site_ > 0
    # same kinetics to within a factor ~2 (vibration vs discretization)
    ratio = sd.D_site_ / da.D_tracer_
    assert 0.4 < ratio < 2.5, ratio


def test_filled_labels_forward_and_back_fill():
    labels = np.array([[-1, 2], [3, -1], [-1, -1], [4, 5]])
    out = SiteDiffusionAnalysis._filled_labels(labels)
    np.testing.assert_array_equal(out, [[3, 2], [3, 2], [3, 2], [4, 5]])
    with pytest.raises(ValueError, match="no assigned site"):
        SiteDiffusionAnalysis._filled_labels(np.array([[-1], [-1]]))


def test_diffusion_input_validation():
    with pytest.raises(ValueError, match="fit_range"):
        DiffusionAnalysis(fit_range=(0.5, 0.2))
    with pytest.raises(ValueError, match="needs mobile_mask"):
        DiffusionAnalysis(verbose=False).run(np.zeros((10, 2, 3)))
    with pytest.raises(ValueError, match="at least 8"):
        DiffusionAnalysis(verbose=False).run(
            np.zeros((4, 2, 3)), mobile_mask=np.ones(2, bool),
            cell=np.eye(3))


def test_arrhenius_recovers_known_activation_energy():
    from sitator_tpu.dynamics import ArrheniusAnalysis
    kb = 8.617333262e-5
    Ea, D0 = 0.30, 1.7e-3
    T = np.array([500.0, 600.0, 700.0, 800.0, 900.0])
    rng = np.random.default_rng(23)
    noise = rng.normal(scale=0.02, size=len(T))      # 2% ln-space noise
    D = D0 * np.exp(-Ea / (kb * T)) * np.exp(noise)
    aa = ArrheniusAnalysis(verbose=False).run(T, D, errors=0.02 * D)
    assert aa.Ea_ev_ == pytest.approx(Ea, abs=0.02)
    assert abs(aa.Ea_ev_ - Ea) < 3 * aa.Ea_err_ev_
    assert aa.prefactor_ == pytest.approx(D0, rel=0.3)
    # predict() round-trips the fit
    np.testing.assert_allclose(
        np.log(aa.predict(T)),
        np.log(aa.prefactor_) - aa.Ea_ev_ / (kb * T), rtol=1e-12)
    # exact (noise-free) data: tiny residuals and near-zero error bars
    aa2 = ArrheniusAnalysis(verbose=False).run(T, D0 * np.exp(-Ea / (kb * T)))
    assert aa2.Ea_ev_ == pytest.approx(Ea, abs=1e-10)
    assert np.abs(aa2.residuals_).max() < 1e-12


def test_arrhenius_input_validation():
    from sitator_tpu.dynamics import ArrheniusAnalysis
    aa = ArrheniusAnalysis(verbose=False)
    with pytest.raises(ValueError, match="equal-length"):
        aa.run([500.0], [[1.0]])
    with pytest.raises(ValueError, match="at least 2"):
        aa.run([500.0], [1.0])
    with pytest.raises(ValueError, match="positive kelvin"):
        aa.run([500.0, -600.0], [1.0, 1.0])
    with pytest.raises(ValueError, match="positive"):
        aa.run([500.0, 600.0], [1.0, -1.0])
    with pytest.raises(ValueError, match="errors"):
        aa.run([500.0, 600.0], [1.0, 1.0], errors=[0.1, 0.0])


def test_conductivity_nan_on_nonpositive_collective_slope():
    """In-phase oscillating ions give a negative collective MSD slope:
    conductivity_ must come out NaN (with a warning), not negative."""
    F, M = 200, 2
    t = np.arange(F)
    pos = np.zeros((F, M, 3))
    pos[:, :, 0] = 3.0 * np.sin(2 * np.pi * t / 100)[:, None]
    pos += np.random.default_rng(3).normal(scale=1e-3, size=pos.shape)
    da = DiffusionAnalysis(temperature=600.0, verbose=False).run(
        pos, mobile_mask=np.ones(M, bool), cell=np.eye(3) * 100.0)
    assert da.D_collective_ < 0
    assert np.isnan(da.conductivity_)
    assert np.isnan(da.haven_ratio_)


def test_site_diffusion_validates_fit_range():
    with pytest.raises(ValueError, match="fit_range"):
        SiteDiffusionAnalysis(fit_range=(0.5, 0.2))


def test_arrhenius_duplicate_temperatures_rejected():
    from sitator_tpu.dynamics import ArrheniusAnalysis
    with pytest.raises(ValueError, match="distinct"):
        ArrheniusAnalysis(verbose=False).run([600.0, 600.0], [1e-3, 2e-3])


def test_alpha2_zero_for_gaussian_walk():
    """Gaussian displacements: alpha2(t) ~ 0 at every lag; F_s(q,t)
    matches the exact Gaussian form exp(-q^2 MSD / 6)."""
    from sitator_tpu.ops.msd import (displacement_moments,
                                     self_intermediate_scattering)
    rng = np.random.default_rng(37)
    F, N, D = 2000, 200, 0.1
    pos = np.concatenate(
        [np.zeros((1, N, 3)),
         np.cumsum(rng.normal(scale=np.sqrt(2 * D),
                              size=(F - 1, N, 3)), 0)], 0)
    lags = [0, 5, 20, 80, 300]
    m2, m4, a2 = displacement_moments(pos, lags, origin_stride=7)
    assert a2[0] == 0.0
    assert np.abs(a2[1:]).max() < 0.05
    # m2 tracks 6 D t
    t = np.array(lags, dtype=float)
    np.testing.assert_allclose(m2[1:], 6 * D * t[1:], rtol=0.1)
    q = 1.3
    fs = self_intermediate_scattering(pos, q, lags, origin_stride=7)
    assert fs[0] == pytest.approx(1.0)
    np.testing.assert_allclose(fs, np.exp(-q ** 2 * m2 / 6), atol=0.01)


def test_alpha2_positive_for_heterogeneous_dynamics():
    """Half frozen + half diffusing ions: strongly non-Gaussian."""
    from sitator_tpu.ops.msd import displacement_moments
    rng = np.random.default_rng(41)
    F, N = 500, 60
    mobile = np.cumsum(rng.normal(scale=0.5, size=(F, N // 2, 3)), 0)
    frozen = np.zeros((F, N // 2, 3))
    pos = np.concatenate([mobile, frozen], axis=1)
    _, _, a2 = displacement_moments(pos, [50], origin_stride=10)
    # two-population limit: alpha2 -> 3*2/(5*1) * ... > 0 strongly
    assert a2[0] > 0.5


def test_relaxation_analysis_engine():
    from sitator_tpu.dynamics import RelaxationAnalysis
    rng = np.random.default_rng(43)
    F, M, D, dt = 1500, 60, 0.08, 1.0
    steps = rng.normal(scale=np.sqrt(2 * D * dt), size=(F - 1, M, 3))
    traj = np.concatenate([np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)
    cell = np.eye(3) * 500.0
    q = 1.0
    ra = RelaxationAnalysis(q=q, timestep=dt, origin_stride=11,
                            verbose=False).run(
        traj, mobile_mask=np.ones(M, bool), cell=cell)
    assert ra.fs_[0] == pytest.approx(1.0)
    # monotone decay down to the statistical noise floor
    sig = ra.fs_ > 0.05
    assert (np.diff(ra.fs_[sig]) < 1e-6).all()
    # Gaussian prediction: F_s = 1/e at t = 6/(q^2 6 D) = 1/(q^2 D)
    tau_theory = 1.0 / (q ** 2 * D)
    assert ra.tau_alpha_ == pytest.approx(tau_theory, rel=0.25)
    assert np.abs(ra.alpha2_).max() < 0.1
    # explicit lags pass through; q validation
    ra2 = RelaxationAnalysis(q=q, lags=[0, 10], verbose=False).run(
        traj, mobile_mask=np.ones(M, bool), cell=cell)
    np.testing.assert_array_equal(ra2.lags_, [0, 10])
    with pytest.raises(ValueError, match="q must be positive"):
        RelaxationAnalysis(q=0.0)


def test_relaxation_tiny_trajectories():
    """Default lags never exceed F-1: a 2-frame trajectory computes its
    one valid lag instead of crashing (review finding r4); F=1 raises
    the informative error."""
    from sitator_tpu.dynamics import RelaxationAnalysis
    cell = np.eye(3) * 100.0
    mask = np.ones(3, bool)
    traj2 = np.random.default_rng(1).normal(size=(2, 3, 3))
    ra = RelaxationAnalysis(q=1.0, verbose=False).run(
        traj2, mobile_mask=mask, cell=cell)
    np.testing.assert_array_equal(ra.lags_, [0, 1])
    assert np.isfinite(ra.fs_).all()
    with pytest.raises(ValueError, match="at least 2 frames"):
        RelaxationAnalysis(q=1.0, verbose=False).run(
            traj2[:1], mobile_mask=mask, cell=cell)


def test_crossing_time_interpolation():
    from sitator_tpu.dynamics import RelaxationAnalysis
    t = np.array([0.0, 1.0, 2.0])
    assert RelaxationAnalysis._crossing_time(
        t, np.array([1.0, 0.5, 0.1]), 0.25) == pytest.approx(1.625)
    assert np.isnan(RelaxationAnalysis._crossing_time(
        t, np.array([1.0, 0.9, 0.8]), 0.25))
    assert RelaxationAnalysis._crossing_time(
        t, np.array([0.1, 0.05, 0.01]), 0.25) == 0.0


def _site_st(centers, labels, a=50.0):
    """Minimal SiteNetwork+SiteTrajectory on an a-cubed cell."""
    from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
    centers = np.asarray(centers, dtype=np.float64)
    M = labels.shape[1]
    pos = np.concatenate([np.full((2, 3), a / 2), centers[labels[0]]])
    species = np.array([16] * 2 + [3] * M)
    s = Structure(pos, species, np.eye(3) * a)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = centers
    return SiteTrajectory(sn, labels)


def test_jump_vector_correlation_flicker_and_square():
    # flicker between 2 sites: antiparallel jumps -> cos=-1, f_angular=0
    centers = np.array([[10.0, 10, 10], [13.0, 10, 10]])
    labels = np.tile([0, 1], 20)[:, None]
    sd = SiteDiffusionAnalysis(verbose=False).run(_site_st(centers, labels))
    assert sd.cos_theta_ == pytest.approx(-1.0)
    assert sd.f_angular_ == pytest.approx(0.0)
    assert sd.n_jump_vector_pairs_ == 38
    # square circuit: consecutive jumps at 90 deg -> cos=0, f_angular=1
    sq = np.array([[10.0, 10, 10], [13.0, 10, 10],
                   [13.0, 13, 10], [10.0, 13, 10]])
    labels = np.tile([0, 1, 2, 3], 10)[:, None]
    sd = SiteDiffusionAnalysis(verbose=False).run(_site_st(sq, labels))
    assert sd.cos_theta_ == pytest.approx(0.0, abs=1e-12)
    assert sd.f_angular_ == pytest.approx(1.0)


def test_jump_vector_correlation_uses_minimum_image():
    """Collinear +x marching through the periodic boundary: every jump
    vector is +x under minimum image (cos=+1) even though the raw
    center difference of the wrap jump points -x."""
    a = 10.0
    centers = np.array([[1.0, 5, 5], [4.0, 5, 5], [7.0, 5, 5]])
    labels = np.tile([0, 1, 2], 12)[:, None]
    sd = SiteDiffusionAnalysis(verbose=False).run(
        _site_st(centers, labels, a=a))
    assert sd.cos_theta_ == pytest.approx(1.0)
    assert sd.f_angular_ == float("inf")


def test_jump_vector_correlation_nan_without_pairs():
    centers = np.array([[10.0, 10, 10], [13.0, 10, 10]])
    labels = np.array([[0]] * 10 + [[1]] * 10)   # a single jump
    sd = SiteDiffusionAnalysis(verbose=False).run(_site_st(centers, labels))
    assert np.isnan(sd.cos_theta_) and np.isnan(sd.f_angular_)
    assert sd.n_jump_vector_pairs_ == 0


def brute_msd_tensor(pos):
    """O(F^2) time-origin-averaged displacement-covariance oracle,
    (F, 3, 3) mean over atoms."""
    F = pos.shape[0]
    out = np.zeros((F, 3, 3))
    for m in range(1, F):
        d = pos[m:] - pos[:-m]                      # (F-m, N, 3)
        out[m] = np.einsum('tna,tnb->ab', d, d) / (d.shape[0] * d.shape[1])
    return out


def test_msd_tensor_matches_brute_force_and_trace():
    rng = np.random.default_rng(29)
    pos = np.cumsum(rng.normal(size=(57, 5, 3)), axis=0)   # odd F
    pos[..., 1] *= 2.3                                     # anisotropic
    pos[..., 2] += 0.7 * pos[..., 0]                       # correlated xz
    T = msd_ops.msd_tensor_fft(pos)
    ref = brute_msd_tensor(pos)
    np.testing.assert_allclose(T, ref, rtol=1e-8, atol=1e-8)
    # symmetric, zero at lag 0, trace == scalar MSD
    np.testing.assert_allclose(T, np.swapaxes(T, 1, 2), rtol=0, atol=0)
    assert np.all(T[0] == 0.0)
    mean_msd, _ = msd_ops.msd_fft(pos)
    np.testing.assert_allclose(np.trace(T, axis1=1, axis2=2),
                               np.asarray(mean_msd), rtol=1e-8, atol=1e-8)


def test_diffusion_anisotropy_recovers_principal_axes():
    """Walk with diagonal D = (0.6, 0.15, 0.05) rotated into a skew
    frame: eigvals of D_tensor_ recover the inputs, eigvecs recover the
    rotated axes, trace/3 == D_tracer_ (same estimator), and
    anisotropy_ ~ 12."""
    rng = np.random.default_rng(31)
    D_diag = np.array([0.05, 0.15, 0.6])                   # ascending
    dt, F, M = 1.0, 4000, 60
    steps = rng.normal(size=(F - 1, M, 3)) * np.sqrt(2 * D_diag * dt)
    # rotate by a fixed non-trivial rotation
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0],
                  [0, 0, 1.0]])
    traj = np.concatenate(
        [np.zeros((1, M, 3)), np.cumsum(steps @ R.T, 0)], 0)
    da = DiffusionAnalysis(timestep=dt, fit_range=(0.05, 0.25),
                           verbose=False).run(
        traj, mobile_mask=np.ones(M, bool), cell=np.eye(3) * 1e4)
    # trace identity is exact: same window, same least-squares fit
    assert np.trace(da.D_tensor_) / 3 == pytest.approx(da.D_tracer_,
                                                       rel=1e-9)
    np.testing.assert_allclose(da.D_eigvals_, D_diag, rtol=0.2)
    assert da.anisotropy_ == pytest.approx(D_diag[-1] / D_diag[0],
                                           rel=0.35)
    # principal axes: |cos| of each eigvec with the true rotated axis
    true_axes = R  # column a of R is the lab direction of walk axis a
    for a in range(3):
        align = abs(float(da.D_eigvecs_[:, a] @ true_axes[:, a]))
        assert align > 0.97, (a, align)
    # isotropic control: anisotropy_ ~ 1
    iso = np.concatenate([np.zeros((1, M, 3)), np.cumsum(
        rng.normal(scale=np.sqrt(2 * 0.3 * dt), size=(F - 1, M, 3)), 0)], 0)
    da2 = DiffusionAnalysis(timestep=dt, fit_range=(0.05, 0.25),
                            verbose=False).run(
        iso, mobile_mask=np.ones(M, bool), cell=np.eye(3) * 1e4)
    assert 1.0 <= da2.anisotropy_ < 1.5


def test_anisotropy_nan_when_direction_not_diffusive():
    """Ions confined to the xy plane: lambda_min ~ 0 (can be slightly
    negative from fit noise) -> anisotropy_ is NaN, not a huge/negative
    ratio."""
    rng = np.random.default_rng(37)
    F, M = 1500, 20
    steps = rng.normal(scale=0.5, size=(F - 1, M, 3))
    steps[..., 2] = 0.0
    traj = np.concatenate([np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)
    da = DiffusionAnalysis(timestep=1.0, verbose=False).run(
        traj, mobile_mask=np.ones(M, bool), cell=np.eye(3) * 1e4)
    assert abs(da.D_eigvals_[0]) < 1e-6
    assert np.isnan(da.anisotropy_)
    assert da.D_eigvals_[-1] == pytest.approx(0.125, rel=0.2)


def _drift_system(rng, F=800, M=6, S=10, v=(0.05, -0.03, 0.04),
                  cell_size=40.0):
    """Mobile Gaussian walkers + frozen host atoms, and the same system
    with a uniform drift v·t applied to EVERY atom (then wrapped).
    Returns (wrapped_still, wrapped_drifted, mobile_mask, cell, drift)."""
    cell = np.eye(3) * cell_size
    steps = rng.normal(scale=0.3, size=(F - 1, M, 3))
    mobile = np.concatenate([np.full((1, M, 3), cell_size / 2),
                             cell_size / 2 + np.cumsum(steps, 0)], 0)
    static = np.broadcast_to(
        rng.uniform(5, cell_size - 5, (1, S, 3)), (F, S, 3))
    traj = np.concatenate([mobile, static], axis=1)
    drift = np.arange(F)[:, None] * np.asarray(v)[None, :]     # (F, 3)
    drifted = traj + drift[:, None, :]
    inv = np.linalg.inv(cell)

    def wrap(t):
        frac = t @ inv
        return (frac - np.floor(frac)) @ cell

    mask = np.zeros(M + S, bool)
    mask[:M] = True
    return wrap(traj), wrap(drifted), mask, cell, drift


def test_drift_correction_restores_undrifted_msd():
    """A uniform drift inflates the MSD; pinning to the (frozen) host
    frame removes it EXACTLY — the corrected curve matches the
    undrifted run to float precision, and drift_ is the injected v·t."""
    rng = np.random.default_rng(23)
    still, drifted, mask, cell, drift = _drift_system(rng)
    base = DiffusionAnalysis(verbose=False).run(still, mobile_mask=mask,
                                                cell=cell)
    raw = DiffusionAnalysis(verbose=False).run(drifted, mobile_mask=mask,
                                               cell=cell)
    fixed = DiffusionAnalysis(drift_correction="static",
                              verbose=False).run(drifted,
                                                 mobile_mask=mask,
                                                 cell=cell)
    assert base.drift_ is None
    # the (v t)^2 term dominates the long-lag MSD
    assert raw.D_tracer_ > 3 * base.D_tracer_
    np.testing.assert_allclose(fixed.drift_, drift, atol=1e-9)
    np.testing.assert_allclose(fixed.msd_, base.msd_, atol=1e-8)
    assert fixed.D_tracer_ == pytest.approx(base.D_tracer_, rel=1e-9)
    # an explicit host mask is the same reference frame
    fixed2 = DiffusionAnalysis(drift_correction=~mask,
                               verbose=False).run(drifted,
                                                  mobile_mask=mask,
                                                  cell=cell)
    np.testing.assert_array_equal(fixed2.msd_, fixed.msd_)


def test_drift_correction_all_frame_and_validation():
    rng = np.random.default_rng(29)
    still, drifted, mask, cell, _ = _drift_system(rng, F=200)
    # 'all' mixes the walkers' own wander into the reference, but still
    # removes the rigid drift: the corrected D is near the base value,
    # far from the drift-inflated one
    base = DiffusionAnalysis(verbose=False).run(still, mobile_mask=mask,
                                                cell=cell)
    fixed = DiffusionAnalysis(drift_correction="all", verbose=False).run(
        drifted, mobile_mask=mask, cell=cell)
    assert fixed.D_tracer_ == pytest.approx(base.D_tracer_, rel=0.3)
    with pytest.raises(ValueError, match="unknown drift_correction"):
        DiffusionAnalysis(drift_correction="host", verbose=False).run(
            drifted, mobile_mask=mask, cell=cell)
    with pytest.raises(ValueError, match="no host frame"):
        DiffusionAnalysis(drift_correction="static", verbose=False).run(
            drifted[:, mask], mobile_mask=np.ones(mask.sum(), bool),
            cell=cell)
    with pytest.raises(ValueError, match="must be"):
        DiffusionAnalysis(drift_correction=np.ones(3, bool),
                          verbose=False).run(drifted, mobile_mask=mask,
                                             cell=cell)
    with pytest.raises(ValueError, match="selects no atoms"):
        DiffusionAnalysis(drift_correction=np.zeros(mask.shape, bool),
                          verbose=False).run(drifted, mobile_mask=mask,
                                             cell=cell)


def test_relaxation_drift_correction():
    """F_s(q, t) decays spuriously under drift; the host-frame pin
    restores the undrifted curve exactly."""
    from sitator_tpu.dynamics import RelaxationAnalysis
    rng = np.random.default_rng(31)
    still, drifted, mask, cell, _ = _drift_system(rng, F=400)
    base = RelaxationAnalysis(q=2.0, verbose=False).run(
        still, mobile_mask=mask, cell=cell)
    fixed = RelaxationAnalysis(q=2.0, drift_correction="static",
                               verbose=False).run(
        drifted, mobile_mask=mask, cell=cell)
    np.testing.assert_allclose(fixed.fs_, base.fs_, atol=1e-8)
    np.testing.assert_allclose(fixed.alpha2_, base.alpha2_, atol=1e-6)


def test_msd_exponent_and_stationarity_diagnostics():
    """Gaussian walk → exponent ≈ 1, split-half ratio ≈ 1; a strongly
    drifted run → exponent well above 1; an 'aging' run whose step size
    halves at the midpoint → ratio ≈ 1/4 (D ∝ step variance)."""
    rng = np.random.default_rng(53)
    F, M, size = 2000, 20, 60.0
    cell = np.eye(3) * size

    def wrap(t):
        frac = t @ np.linalg.inv(cell)
        return (frac - np.floor(frac)) @ cell

    steps = rng.normal(scale=0.3, size=(F - 1, M, 3))
    walk = size / 2 + np.concatenate(
        [np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)
    da = DiffusionAnalysis(verbose=False).run(
        wrap(walk), mobile_mask=np.ones(M, bool), cell=cell)
    assert da.msd_exponent_ == pytest.approx(1.0, abs=0.15)
    assert da.stationarity_ratio_ == pytest.approx(1.0, abs=0.35)

    drift = np.arange(F)[:, None] * np.array([0.08, 0.0, 0.06])
    da_d = DiffusionAnalysis(verbose=False).run(
        wrap(walk + drift[:, None, :]), mobile_mask=np.ones(M, bool),
        cell=cell)
    assert da_d.msd_exponent_ > 1.5

    aging_steps = steps.copy()
    aging_steps[(F - 1) // 2:] *= 0.5
    aging = size / 2 + np.concatenate(
        [np.zeros((1, M, 3)), np.cumsum(aging_steps, 0)], 0)
    da_a = DiffusionAnalysis(verbose=False).run(
        wrap(aging), mobile_mask=np.ones(M, bool), cell=cell)
    assert da_a.stationarity_ratio_ == pytest.approx(0.25, abs=0.15)


def test_stationarity_nan_on_tiny_trajectories():
    rng = np.random.default_rng(59)
    cell = np.eye(3) * 30.0
    walk = 15.0 + np.cumsum(rng.normal(scale=0.2, size=(12, 3, 3)), 0)
    da = DiffusionAnalysis(verbose=False).run(
        walk, mobile_mask=np.ones(3, bool), cell=cell)
    assert np.isnan(da.stationarity_ratio_)      # halves < 8 frames
    assert np.isfinite(da.msd_exponent_)
