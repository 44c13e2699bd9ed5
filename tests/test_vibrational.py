"""VACF / VDOS / Green-Kubo: FFT estimator vs brute force, harmonic
oscillator spectral recovery, and GK-vs-MSD diffusivity agreement."""
import numpy as np
import pytest

from sitator_tpu.ops import msd as msd_ops
from sitator_tpu.dynamics import (AverageVibrationalFrequency,
                                  DiffusionAnalysis,
                                  VibrationalSpectrumAnalysis)


def test_vacf_fft_matches_brute_force():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(41, 5, 3))
    Z, per_atom = msd_ops.vacf_fft(v)
    F = len(v)
    ref = np.empty(F)
    for m in range(F):
        ref[m] = np.einsum("tnc,tnc->", v[m:], v[:F - m]) / (
            (F - m) * v.shape[1])
    np.testing.assert_allclose(Z, ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(per_atom.mean(0), Z, rtol=1e-12)


def _run_raw(traj, dt=1.0, **kw):
    M = traj.shape[1]
    return VibrationalSpectrumAnalysis(timestep=dt, verbose=False,
                                       **kw).run(
        traj, mobile_mask=np.ones(M, bool), cell=np.eye(3) * 1e6)


def test_harmonic_oscillator_spectrum():
    """Pure f0 oscillation: VDOS peaks exactly at f0 (on-grid), the
    normalized VACF is cos(2 pi f0 t), and D_GK ~ 0."""
    rng = np.random.default_rng(7)
    F, M, dt = 1025, 12, 1.0
    k = 96                                  # on-grid: f0 = k / (F-1)
    f0 = k / ((F - 1) * dt)
    t = np.arange(F) * dt
    phase = rng.uniform(0, 2 * np.pi, size=(M, 3))
    A = 0.3
    traj = A * np.cos(2 * np.pi * f0 * t[:, None, None] + phase)
    vs = _run_raw(traj, dt)
    assert vs.freqs_[np.argmax(vs.vdos_)] == pytest.approx(f0)
    # normalized VACF is a cosine at f0 (frame-diff velocities keep
    # the frequency; check the first quarter period)
    lags = np.arange(1, int(0.25 / f0))
    np.testing.assert_allclose(vs.psi_[lags],
                               np.cos(2 * np.pi * f0 * lags * dt),
                               atol=0.02)
    # bound motion: GK integral oscillates around ~0
    v_amp2 = vs.vacf_[0]
    assert abs(vs.D_gk_) < 0.05 * v_amp2 / (2 * np.pi * f0)
    # VDOS integrates to 1
    df = vs.freqs_[1]
    assert vs.vdos_.sum() * df == pytest.approx(1.0)
    # consistency: AverageVibrationalFrequency sees the same peak
    nu = AverageVibrationalFrequency(timestep=dt, verbose=False).run(
        traj, mobile_mask=np.ones(M, bool), cell=np.eye(3) * 1e6)
    assert nu == pytest.approx(f0, rel=0.02)


def test_green_kubo_matches_msd_diffusivity():
    """Uncorrelated Gaussian steps: D_GK == D_true exactly in
    expectation (Z(0)=6D/dt, Z(m>0)=0) and agrees with the MSD route."""
    rng = np.random.default_rng(11)
    D_true, dt, F, M = 0.25, 2.0, 4000, 30
    steps = rng.normal(scale=np.sqrt(2 * D_true * dt), size=(F - 1, M, 3))
    traj = np.concatenate([np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)
    # memoryless VACF decays in one step: read the plateau early (the
    # running integral accumulates noise ~ sqrt(lag) beyond it)
    vs = _run_raw(traj, dt, integral_window=(0.002, 0.02))
    assert vs.D_gk_ == pytest.approx(D_true, rel=0.05)
    da = DiffusionAnalysis(timestep=dt, fit_range=(0.05, 0.25),
                           verbose=False).run(
        traj, mobile_mask=np.ones(M, bool), cell=np.eye(3) * 1e6)
    assert vs.D_gk_ == pytest.approx(da.D_tracer_, rel=0.1)
    # the running integral stays near D after the first step — unbiased
    # plateau, with noise growing ~ sqrt(lag) but bounded here
    tail = vs.D_gk_running_[10:F // 2]
    assert np.abs(tail - D_true).max() < 0.5 * D_true


def test_oscillation_plus_walk_separates_scales():
    """Walk + fast oscillation: VDOS peak at the oscillation frequency,
    D_GK still recovers the walk's diffusivity (the oscillatory part
    integrates to ~0)."""
    rng = np.random.default_rng(13)
    D_true, dt, F, M = 0.1, 1.0, 4097, 24
    k = 1024
    f0 = k / ((F - 1) * dt)
    t = np.arange(F) * dt
    phase = rng.uniform(0, 2 * np.pi, size=(M, 3))
    steps = rng.normal(scale=np.sqrt(2 * D_true * dt), size=(F - 1, M, 3))
    traj = (np.concatenate([np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)
            + 0.2 * np.cos(2 * np.pi * f0 * t[:, None, None] + phase))
    vs = _run_raw(traj, dt)
    assert vs.freqs_[np.argmax(vs.vdos_)] == pytest.approx(f0, rel=0.01)
    assert vs.D_gk_ == pytest.approx(D_true, rel=0.15)


def test_plot_vdos_draws():
    import matplotlib
    matplotlib.use("Agg")
    rng = np.random.default_rng(23)
    traj = np.cumsum(rng.normal(scale=0.2, size=(200, 6, 3)), axis=0)
    vs = _run_raw(traj)
    from sitator_tpu.visualization import plot_vdos
    fig = plot_vdos(vs)
    fig.canvas.draw()
    # main VDOS line plus the GK inset curve (inset registers as a
    # child axes of the parent, not on fig.axes)
    assert len(fig.axes[0].get_lines()) >= 1
    insets = fig.axes[0].child_axes
    assert insets and len(insets[0].get_lines()) >= 1


def test_vibrational_spectrum_validation_and_st_route():
    with pytest.raises(ValueError, match="integral_window"):
        VibrationalSpectrumAnalysis(integral_window=(0.5, 0.2))
    with pytest.raises(ValueError, match="at least 3"):
        _run_raw(np.zeros((2, 2, 3)))
    with pytest.raises(ValueError, match="mobile_mask"):
        VibrationalSpectrumAnalysis(verbose=False).run(np.zeros((9, 2, 3)))
    # SiteTrajectory route + max_lag truncation
    from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
    rng = np.random.default_rng(17)
    traj = rng.normal(size=(50, 5, 3)) + 25.0
    pos = np.concatenate([np.zeros((2, 3)), traj[0]])
    species = np.array([16] * 2 + [3] * 5)
    s = Structure(pos, species, np.eye(3) * 50.0)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = np.zeros((1, 3))
    st = SiteTrajectory(sn, np.zeros((50, 5), dtype=int))
    st.set_real_traj(np.concatenate([np.zeros((50, 2, 3)), traj], axis=1))
    vs = VibrationalSpectrumAnalysis(max_lag=10, verbose=False).run(st)
    assert len(vs.vacf_) == 11 and len(vs.times_) == 11
    assert len(vs.D_gk_running_) == 11
    assert np.isfinite(vs.D_gk_)


def _white_noise_system(rng, F=4096, M=16, step=0.3, size=50.0):
    steps = rng.normal(scale=step, size=(F - 1, M, 3))
    traj = size / 2 + np.concatenate(
        [np.zeros((1, M, 3)), np.cumsum(steps, 0)], 0)
    frac = traj / size
    return (frac - np.floor(frac)) * size, np.eye(3) * size


def test_conductivity_spectrum_white_noise_closed_form():
    """Independent random walkers: J is white noise, so σ(ω) is flat
    and both the GK plateau and the spectrum equal the Nernst–Einstein
    closed form σ = M e² D / (V k_B T) with D = step²/(2 dt)."""
    from sitator_tpu.dynamics import ConductivitySpectrumAnalysis
    rng = np.random.default_rng(61)
    F, M, step, size, T = 4096, 16, 0.3, 50.0, 600.0
    traj, cell = _white_noise_system(rng, F, M, step, size)
    mask = np.ones(M, bool)
    ca = ConductivitySpectrumAnalysis(
        [mask], charges=[1.0], timestep=1.0, temperature=T,
        verbose=False).run(traj, cell=cell)
    e, kb = 1.602176634e-19, 1.380649e-23
    D = step ** 2 / 2.0                     # Å²/ps per component pair
    sigma_ne = (M * e ** 2 * (D * 1e-8)
                / (size ** 3 * 1e-30 * kb * T)) / 100.0
    assert ca.sigma_dc_ == pytest.approx(sigma_ne, rel=0.15)
    # flat spectrum: the mean over all frequencies is the same number,
    # and no broad trend (low-f vs high-f halves agree)
    body = ca.sigma_[1:]
    assert body.mean() == pytest.approx(sigma_ne, rel=0.1)
    lo, hi = body[: len(body) // 2].mean(), body[len(body) // 2:].mean()
    assert lo == pytest.approx(hi, rel=0.15)
    assert (ca.sigma_ >= 0).all()            # periodogram positivity


def test_conductivity_spectrum_oscillator_peak():
    """Bound oscillating charges: σ peaks at the oscillation frequency
    and the DC plateau is ~0 (no net transport)."""
    from sitator_tpu.dynamics import ConductivitySpectrumAnalysis
    rng = np.random.default_rng(67)
    F, M, size, f0 = 2048, 8, 30.0, 0.125   # cycles per frame
    t = np.arange(F)[:, None, None]
    phase = rng.uniform(0, 2 * np.pi, (1, M, 3))
    base = rng.uniform(5, 25, (1, M, 3))
    traj = base + 0.3 * np.cos(2 * np.pi * f0 * t + phase)
    ca = ConductivitySpectrumAnalysis(
        [np.ones(M, bool)], charges=[1.0], timestep=1.0,
        temperature=300.0, n_segments=4, verbose=False).run(
        traj, cell=np.eye(3) * size)
    peak_f = ca.freqs_[int(np.argmax(ca.sigma_))]
    assert peak_f == pytest.approx(f0, abs=2 * (ca.freqs_[1]))
    assert abs(ca.sigma_dc_) < 0.05 * ca.sigma_.max()


def test_conductivity_spectrum_two_species_and_validation():
    from sitator_tpu.dynamics import ConductivitySpectrumAnalysis
    rng = np.random.default_rng(71)
    traj, cell = _white_noise_system(rng, F=512, M=8)
    ga = np.zeros(8, bool); ga[:4] = True
    # a perfectly paired +/- system: J == 0 identically -> sigma == 0
    paired = traj.copy()
    paired[:, 4:, :] = traj[:, :4, :]       # anion rides on its cation
    ca = ConductivitySpectrumAnalysis(
        [ga, ~ga], charges=[1.0, -1.0], timestep=1.0,
        temperature=300.0, verbose=False).run(paired, cell=cell)
    assert abs(ca.sigma_dc_) < 1e-12
    np.testing.assert_allclose(ca.sigma_, 0.0, atol=1e-15)
    with pytest.raises(ValueError, match="overlap"):
        ConductivitySpectrumAnalysis(
            [ga, ga], charges=[1.0, -1.0], verbose=False).run(
            traj, cell=cell)
    with pytest.raises(ValueError, match="one entry per group"):
        ConductivitySpectrumAnalysis([ga], charges=[1.0, 2.0])
    with pytest.raises(ValueError, match="needs cell"):
        ConductivitySpectrumAnalysis([ga], charges=[1.0],
                                     verbose=False).run(traj)
    with pytest.raises(ValueError, match="Welch segments"):
        ConductivitySpectrumAnalysis(
            [ga], charges=[1.0], n_segments=8, verbose=False).run(
            traj[:10], cell=cell)


def test_conductivity_dc_estimators_agree_on_hopping_md():
    """On real hopping MD the GK-plateau and lowest-Welch-bin DC
    readouts agree (seed-averaged) with the tracer Nernst–Einstein
    anchor — the per-ion-averaged estimator with tight error bars
    (near-independent walkers, Haven ratio ≈ 1).  The collective
    single-signal estimators cannot be pinned tighter than this; the
    exact normalization is pinned by the white-noise closed form."""
    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu.dynamics import (ConductivitySpectrumAnalysis,
                                      DiffusionAnalysis)
    e, kb = 1.602176634e-19, 1.380649e-23
    gk, sp, ne = [], [], []
    for seed in (5, 6, 7, 8):
        md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=8,
                                     n_frames=6000, jump_rate=0.05,
                                     seed=seed)
        cell = md.structure.cell
        ca = ConductivitySpectrumAnalysis(
            [md.mobile_mask], charges=[1.0], timestep=1.0,
            temperature=600.0, verbose=False).run(md.traj, cell=cell)
        da = DiffusionAnalysis(timestep=1.0, verbose=False).run(
            md.traj, mobile_mask=md.mobile_mask, cell=cell)
        vol = abs(np.linalg.det(cell)) * 1e-30
        ne.append((8 * e ** 2 * da.D_tracer_ * 1e-8
                   / (vol * kb * 600.0)) / 100.0)
        gk.append(ca.sigma_dc_)
        sp.append(ca.sigma_dc_spectral_)
    gk, sp, ne = (float(np.mean(v)) for v in (gk, sp, ne))
    assert gk == pytest.approx(ne, rel=0.5)
    assert sp == pytest.approx(ne, rel=0.5)
    assert gk == pytest.approx(sp, rel=0.5)


def test_plot_conductivity_spectrum_draws():
    import matplotlib
    matplotlib.use("Agg")
    from sitator_tpu.dynamics import ConductivitySpectrumAnalysis
    from sitator_tpu.visualization import plot_conductivity_spectrum
    rng = np.random.default_rng(73)
    traj, cell = _white_noise_system(rng, F=512, M=6)
    ca = ConductivitySpectrumAnalysis(
        [np.ones(6, bool)], charges=[1.0], timestep=1.0,
        temperature=300.0, n_segments=4, verbose=False).run(
        traj, cell=cell)
    fig = plot_conductivity_spectrum(ca)
    fig.canvas.draw()
    lines = fig.axes[0].get_lines()
    assert len(lines) >= 2                 # sigma(w) + at least one DC line
    assert fig.axes[0].get_legend() is not None


def test_conductivity_spectrum_parseval_identity():
    """Exact Parseval closure: mean_k |FFT(J_c)_k|² = N·Σ_t J_c(t)², so
    the average of σ over the rfft grid (with the two-sided bins double
    counted) must equal pref/2 · dt · mean|J|² to float precision —
    pinning the spectrum normalization independently of any physics."""
    from sitator_tpu.dynamics import ConductivitySpectrumAnalysis
    rng = np.random.default_rng(79)
    F, M = 257, 5                           # odd segment length on purpose
    traj, cell = _white_noise_system(rng, F=F, M=M, size=20.0)
    ca = ConductivitySpectrumAnalysis(
        [np.ones(M, bool)], charges=[1.0], timestep=1.0,
        temperature=300.0, n_segments=1, verbose=False).run(
        traj, cell=cell)
    seg = F - 1                              # velocity frames, one segment
    # reconstruct J exactly as the engine does
    J, _ = ca._charge_current(traj, cell)
    # two-sided sum over the full FFT grid via rfft weights
    w = np.full(len(ca.freqs_), 2.0)
    w[0] = 1.0
    if seg % 2 == 0:
        w[-1] = 1.0                          # Nyquist bin is unique
    e, kb = 1.602176634e-19, 1.380649e-23
    vol = abs(np.linalg.det(cell)) * 1e-30
    pref = (e ** 2 * 1e-8 / (3.0 * vol * kb * 300.0)) / 100.0
    lhs = (w * ca.sigma_).sum() / seg
    rhs = 0.5 * pref * (J ** 2).sum() / seg
    assert lhs == pytest.approx(rhs, rel=1e-9)


def test_avf_freq_cut_zero_power_and_attr_rerun():
    """freq_cut windows the spectrum, a motionless trajectory returns 0,
    and running on a SiteTrajectory twice replaces the stored attribute
    (coverage audit)."""
    from sitator_tpu import SiteNetwork
    from sitator_tpu.core.sitetraj import SiteTrajectory
    from sitator_tpu.core.structure import Structure

    rng = np.random.default_rng(3)
    F, M, dt = 257, 4, 1.0
    k = 32
    f0 = k / ((F - 1) * dt)
    t = np.arange(F) * dt
    phase = rng.uniform(0, 2 * np.pi, size=(M, 3))
    traj = 0.3 * np.cos(2 * np.pi * f0 * t[:, None, None] + phase)
    mask = np.ones(M, bool)
    cell = np.eye(3) * 1e6

    # a cut window that BRACKETS f0 keeps the estimate; one ABOVE it
    # leaves zero in-window power -> 0.0
    nu = AverageVibrationalFrequency(timestep=dt, freq_cut=(0.5 * f0,
                                                            2 * f0),
                                     verbose=False).run(
        traj, mobile_mask=mask, cell=cell)
    assert nu == pytest.approx(f0, rel=0.05)
    nu0 = AverageVibrationalFrequency(timestep=dt, freq_cut=(0.4, 0.5),
                                      verbose=False).run(
        np.zeros((16, M, 3)), mobile_mask=mask, cell=cell)
    assert nu0 == 0.0

    # SiteTrajectory route stores (and on re-run REPLACES) the attribute
    s = Structure(traj[0], [3] * M, cell)
    sn = SiteNetwork(s, np.zeros(M, bool), mask)
    sn.centers = np.zeros((1, 3))
    st = SiteTrajectory(sn, np.zeros((F, M), np.int64))
    st.set_real_traj(traj)
    an = AverageVibrationalFrequency(timestep=dt, verbose=True)
    v1 = an.run(st)
    assert sn.avg_vibrational_freq[0] == pytest.approx(v1)
    v2 = an.run(st)
    assert v2 == pytest.approx(v1)


def test_vacf_max_lag_zero_velocity_and_verbose():
    """max_lag truncates the VACF grid; an all-zero velocity signal
    yields NaN psi_ without warnings; verbose paths log (coverage
    audit)."""
    rng = np.random.default_rng(4)
    traj = rng.normal(size=(300, 5, 3)).cumsum(axis=0)
    vs = VibrationalSpectrumAnalysis(timestep=1.0, max_lag=40,
                                     verbose=True).run(
        traj, mobile_mask=np.ones(5, bool), cell=np.eye(3) * 1e6)
    assert vs.vacf_.shape == (41,) and vs.times_[-1] == 40.0
    still = VibrationalSpectrumAnalysis(timestep=1.0, verbose=False).run(
        np.zeros((32, 2, 3)), mobile_mask=np.ones(2, bool),
        cell=np.eye(3) * 1e6)
    assert np.isnan(still.psi_).all()


def test_conductivity_spectrum_verbose():
    from sitator_tpu.dynamics import ConductivitySpectrumAnalysis
    rng = np.random.default_rng(6)
    traj, cell = _white_noise_system(rng, 512, 4, 0.3, 30.0)
    ca = ConductivitySpectrumAnalysis(
        [np.ones(4, bool)], charges=[1.0], timestep=1.0,
        temperature=500.0, verbose=True).run(traj, cell=cell)
    assert np.isfinite(ca.sigma_dc_)
