"""Reciprocal-space scattering: allowed q-grid, device density modes vs
a float64 host oracle, FFT autocorrelation vs brute force, Bragg peaks,
ideal-gas S(q)=1, and free-diffusion F(q,t) = S(q)·exp(-Dq²t)."""
import numpy as np
import pytest

from sitator_tpu.ops import scattering as scat
from sitator_tpu.dynamics import ScatteringAnalysis


def test_allowed_wavevectors_basic():
    L = 10.0
    n, q, mag = scat.allowed_wavevectors(np.eye(3) * L, q_max=2.0)
    base = 2 * np.pi / L
    assert mag.min() == pytest.approx(base)
    assert mag.max() <= 2.0 * (1 + 1e-9)
    assert np.all(np.diff(mag) >= 0)
    np.testing.assert_allclose(q, 2 * np.pi * n / L, atol=1e-12)
    # one per +/- pair: no mode appears together with its negation
    keys = {tuple(v) for v in n.tolist()}
    assert all(tuple(-c for c in k) not in keys for k in keys)
    # count matches a brute-force full-space enumeration / 2
    r = np.arange(-4, 5)
    full = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    full = full[np.any(full != 0, axis=1)]
    n_full = (np.linalg.norm(full * base, axis=1) <= 2.0 + 1e-12).sum()
    assert len(n) == n_full // 2
    with pytest.raises(ValueError, match="positive"):
        scat.allowed_wavevectors(np.eye(3) * L, q_max=-1.0)


def test_allowed_wavevectors_triclinic():
    cell = np.array([[8.0, 0, 0], [2.0, 7.0, 0], [1.0, 0.8, 9.0]])
    n, q, mag = scat.allowed_wavevectors(cell, q_max=3.0)
    # q . a_i = 2 pi n_i exactly (lattice commensurability)
    np.testing.assert_allclose(q @ cell.T, 2 * np.pi * n, atol=1e-9)
    assert (mag > 0).all() and (mag <= 3.0 + 1e-9).all()


def test_density_modes_match_host_float64():
    rng = np.random.default_rng(3)
    cell = np.array([[9.0, 0, 0], [1.0, 8.0, 0], [0.5, 0.3, 7.0]])
    F, M = 6, 50
    traj = rng.uniform(-20, 20, size=(F, M, 3))    # deliberately unwrapped
    mask = np.ones(M, bool)
    n, q, _ = scat.allowed_wavevectors(cell, q_max=4.0)
    rho = scat.collective_density_modes(traj, cell, mask, n)
    ref = np.exp(1j * np.einsum("fmx,kx->fmk", traj, q)).sum(axis=1)
    # f32 phases via the mod-1 trick: ~1e-5 rad/ion
    assert np.abs(rho - ref).max() < 5e-4 * M


def test_autocorr_all_origins_matches_brute():
    rng = np.random.default_rng(5)
    rho = (rng.normal(size=(33, 4)) + 1j * rng.normal(size=(33, 4)))
    got = scat._autocorr_all_origins(rho)
    F = len(rho)
    ref = np.empty((F, 4))
    for m in range(F):
        ref[m] = (rho[m:] * np.conj(rho[:F - m])).real.mean(axis=0)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)


def test_bragg_peaks_of_static_lattice():
    """Perfect SC lattice (spacing a, cell 3a): |rho|^2/N = N exactly at
    Bragg modes (n = 0 mod 3) and 0 at every other allowed mode."""
    a, rep = 2.0, 3
    cell = np.eye(3) * (a * rep)
    g = np.arange(rep) * a
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    traj = np.repeat(pos[None], 4, axis=0)         # static over 4 frames
    N = len(pos)
    n, _, _ = scat.allowed_wavevectors(cell, q_max=2 * np.pi / a * 1.8)
    rho = scat.collective_density_modes(traj, cell, np.ones(N, bool), n)
    s_mode = (np.abs(rho) ** 2).mean(axis=0) / N
    bragg = np.all(n % rep == 0, axis=1)
    assert bragg.any() and (~bragg).any()
    np.testing.assert_allclose(s_mode[bragg], N, rtol=1e-4)
    assert s_mode[~bragg].max() < 1e-4 * N


def test_ideal_gas_structure_factor_near_one():
    rng = np.random.default_rng(7)
    cell = np.eye(3) * 11.0
    traj = rng.uniform(0, 11.0, size=(60, 64, 3))  # fresh gas every frame
    q_c, S, counts = scat.static_structure_factor(
        traj, cell, np.ones(64, bool), q_max=3.5, n_shells=6)
    ok = counts > 0
    assert ok.sum() >= 4
    np.testing.assert_allclose(S[ok], 1.0, atol=0.15)


def test_coherent_decay_matches_free_diffusion():
    """Independent Brownian walkers: F(q,t)/S(q) = exp(-D q^2 t)."""
    rng = np.random.default_rng(11)
    D, dt, F, M = 0.15, 1.0, 1200, 48
    cell = np.eye(3) * 12.0
    steps = rng.normal(scale=np.sqrt(2 * D * dt), size=(F - 1, M, 3))
    traj = np.concatenate([rng.uniform(0, 12, size=(1, M, 3)),
                           np.zeros((F - 1, M, 3))], 0)
    traj[1:] = traj[:1] + np.cumsum(steps, 0)
    q_c, Fqt, counts = scat.coherent_scattering(
        traj, cell, np.ones(M, bool), q_max=2.0, n_shells=3)
    assert (counts > 0).all()
    for s in range(3):
        phi = Fqt[s] / Fqt[s, 0]
        for lag in (2, 5, 10):
            expect = np.exp(-D * q_c[s] ** 2 * lag * dt)
            if expect > 0.05:
                assert phi[lag] == pytest.approx(expect, abs=0.12), (
                    s, lag, phi[lag], expect)


def _gas_st(traj, cell):
    from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
    F, M = traj.shape[:2]
    pos = np.concatenate([np.zeros((2, 3)), traj[0]])
    species = np.array([16] * 2 + [3] * M)
    s = Structure(pos, species, cell)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = np.zeros((1, 3))
    st = SiteTrajectory(sn, np.zeros((F, M), dtype=int))
    full = np.concatenate(
        [np.zeros((F, 2, 3)), traj], axis=1)
    st.set_real_traj(full)
    return st


def test_scattering_analysis_engine_and_tau():
    rng = np.random.default_rng(13)
    D, F, M = 0.2, 1500, 40
    cell = np.eye(3) * 10.0
    steps = rng.normal(scale=np.sqrt(2 * D), size=(F - 1, M, 3))
    traj = np.concatenate([rng.uniform(0, 10, size=(1, M, 3)),
                           np.zeros((F - 1, M, 3))], 0)
    traj[1:] = traj[:1] + np.cumsum(steps, 0)
    sa = ScatteringAnalysis(q_max=2.5, n_shells=3, timestep=1.0,
                            verbose=False).run(_gas_st(traj, cell))
    assert sa.F_.shape == (3, F)
    np.testing.assert_allclose(sa.F_[:, 0], sa.S_q_, rtol=0)
    np.testing.assert_allclose(sa.phi_[:, 0], 1.0, rtol=1e-12)
    ok = sa.n_q_ > 0
    for s in np.where(ok)[0]:
        expect_tau = 1.0 / (D * sa.q_[s] ** 2)
        assert sa.tau_q_[s] == pytest.approx(expect_tau, rel=0.35), (
            s, sa.tau_q_[s], expect_tau)


def test_frozen_structure_never_relaxes():
    rng = np.random.default_rng(17)
    pos = rng.uniform(0, 8, size=(30, 3))
    traj = np.repeat(pos[None], 50, axis=0)
    sa = ScatteringAnalysis(q_max=2.5, n_shells=2, verbose=False).run(
        _gas_st(traj, np.eye(3) * 8.0))
    ok = sa.n_q_ > 0
    np.testing.assert_allclose(sa.phi_[ok], 1.0, atol=1e-6)
    assert np.isnan(sa.tau_q_[ok]).all()


def test_plot_structure_factor_draws():
    import matplotlib
    matplotlib.use("Agg")
    rng = np.random.default_rng(19)
    D, F, M = 0.3, 300, 24
    steps = rng.normal(scale=np.sqrt(2 * D), size=(F - 1, M, 3))
    traj = np.concatenate([rng.uniform(0, 9, size=(1, M, 3)),
                           np.zeros((F - 1, M, 3))], 0)
    traj[1:] = traj[:1] + np.cumsum(steps, 0)
    sa = ScatteringAnalysis(q_max=2.5, n_shells=3, verbose=False).run(
        _gas_st(traj, np.eye(3) * 9.0))
    from sitator_tpu.visualization import plot_structure_factor
    fig = plot_structure_factor(sa)
    fig.canvas.draw()
    assert any(len(a.get_lines()) for a in fig.axes)


def test_scattering_validation():
    with pytest.raises(ValueError, match="q_max"):
        ScatteringAnalysis(q_max=0.0)
    with pytest.raises(ValueError, match="n_shells"):
        ScatteringAnalysis(q_max=1.0, n_shells=0)
    with pytest.raises(ValueError, match="no allowed wavevectors"):
        scat.static_structure_factor(
            np.zeros((2, 3, 3)), np.eye(3) * 5.0, np.ones(3, bool),
            q_max=0.5)
