"""String-method MEP refinement (ops/mep.py + PathwayBarrierAnalysis
path='string'): a curved-channel landscape whose straight site-site
segment crosses a high ridge while a lateral gap holds a much lower
saddle — the string must leave the straight line and read the gap's
saddle height, on both an analytic grid and a Boltzmann-sampled
trajectory, including across the periodic seam."""
import numpy as np
import pytest

from sitator_tpu.dynamics.energetics import _trilinear_periodic
from sitator_tpu.ops.mep import refine_string_paths

_K_B_EV = 8.617333262e-5

L = 12.0
N_BINS = 48
H, GAP, SX, SG = 6.0, 0.7, 0.8, 1.2


def _channel_v(pts, x_ridge):
    """Dimensionless V (units of kT): a Gaussian ridge in the plane
    x = x_ridge with a circular gap at (y, z) = (8, 6).  Saddle height
    through the gap: H * (1 - GAP).  All coordinates periodic in L."""
    pts = np.asarray(pts, dtype=np.float64)
    dx = pts[..., 0] - x_ridge
    dx -= L * np.round(dx / L)
    dy = pts[..., 1] - 8.0
    dy -= L * np.round(dy / L)
    dz = pts[..., 2] - 6.0
    dz -= L * np.round(dz / L)
    ridge = np.exp(-dx ** 2 / (2 * SX ** 2))
    gap = GAP * np.exp(-(dy ** 2 + dz ** 2) / (2 * SG ** 2))
    return H * ridge * (1.0 - gap)


def _grid_rho(x_ridge):
    i = (np.arange(N_BINS) + 0.5) / N_BINS * L
    X, Y, Z = np.meshgrid(i, i, i, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1)
    return np.exp(-_channel_v(pts, x_ridge))


def _profile(rho, pts):
    frac = pts @ np.linalg.inv(np.eye(3) * L)
    frac -= np.floor(frac)
    return _trilinear_periodic(rho, frac)


def _barriers(rho, pts):
    prof = -np.log(_profile(rho, pts))
    return prof.max() - prof[0]


SADDLE = H * (1 - GAP)                                   # 1.8 kT
# the straight segment crosses the ridge at (x_ridge, 6, 6), two
# Angstroms from the gap center
STRAIGHT = H * (1 - GAP * np.exp(-4.0 / (2 * SG ** 2)))  # ~4.96 kT


@pytest.mark.parametrize("x_ridge,a,b", [
    (6.0, np.array([3.0, 6.0, 6.0]), np.array([9.0, 6.0, 6.0])),
    # same channel on the periodic seam: the minimum-image path
    # A -> B crosses x = 0 == L
    (0.0, np.array([9.0, 6.0, 6.0]), np.array([15.0, 6.0, 6.0])),
])
def test_string_finds_curved_channel_saddle(x_ridge, a, b):
    rho = _grid_rho(x_ridge)
    P = 41
    seed = a[None] + np.linspace(0, 1, P)[:, None] * (b - a)[None]
    straight_barrier = _barriers(rho, seed)
    assert straight_barrier == pytest.approx(STRAIGHT, rel=0.10)

    out = refine_string_paths(rho, np.eye(3) * L, seed[None])[0]
    # endpoints pinned exactly
    np.testing.assert_allclose(out[0], a, atol=1e-5)
    np.testing.assert_allclose(out[-1], b, atol=1e-5)
    refined_barrier = _barriers(rho, out)
    assert refined_barrier == pytest.approx(SADDLE, rel=0.15)
    assert refined_barrier < 0.5 * straight_barrier
    # the path actually moved to the gap: its ridge crossing sits near
    # y = 8 (minimum-image), z = 6
    dxr = out[:, 0] - x_ridge
    dxr -= L * np.round(dxr / L)
    k = np.argmin(np.abs(dxr))
    dy = out[k, 1] - 8.0
    dy -= L * np.round(dy / L)
    assert abs(dy) < 0.6
    assert abs(out[k, 2] - 6.0) < 0.6


def test_flat_landscape_leaves_straight_path_fixed():
    rho = np.ones((8, 8, 8))
    a, b = np.array([1.0, 1.0, 1.0]), np.array([5.0, 3.0, 2.0])
    seed = a[None] + np.linspace(0, 1, 17)[:, None] * (b - a)[None]
    out = refine_string_paths(rho, np.eye(3) * L, seed[None],
                              iterations=50)[0]
    np.testing.assert_allclose(out, seed, atol=1e-4)


def test_refine_validation_and_degenerate_paths():
    rho = np.ones((4, 4, 4))
    with pytest.raises(ValueError, match="3-D grid"):
        refine_string_paths(np.ones((4, 4)), np.eye(3), np.zeros((1, 5, 3)))
    with pytest.raises(ValueError, match=r"\(E, P, 3\)"):
        refine_string_paths(rho, np.eye(3), np.zeros((5, 3)))
    with pytest.raises(ValueError, match="positive density"):
        refine_string_paths(np.zeros((4, 4, 4)), np.eye(3),
                            np.zeros((1, 5, 3)))
    # P == 2: no interior nodes, returned unchanged
    two = np.array([[[0.0, 0, 0], [1.0, 1, 1]]])
    np.testing.assert_array_equal(
        refine_string_paths(rho, np.eye(3) * 4, two), two[0][None])


def test_pathway_analysis_string_mode_recovers_gap_saddle():
    """End-to-end through PathwayBarrierAnalysis: Boltzmann-rejection
    samples of the curved channel; path='string' reads the gap saddle,
    path='straight' reads the (much higher) ridge crossing."""
    from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
    from sitator_tpu.dynamics import PathwayBarrierAnalysis

    rng = np.random.default_rng(23)
    T = 600.0
    kT = _K_B_EV * T
    n_pts = 500_000
    pts = np.empty((0, 3))
    while len(pts) < n_pts:
        prop = rng.uniform(0, L, (n_pts, 3))
        keep = rng.uniform(0, 1, n_pts) < np.exp(-_channel_v(prop, 6.0))
        pts = np.concatenate([pts, prop[keep]])
    pts = pts[:n_pts]
    F = 2500
    M = n_pts // F
    traj = pts[: F * M].reshape(F, M, 3)

    centers = np.array([[3.0, 6.0, 6.0], [9.0, 6.0, 6.0]])
    s = Structure(traj[0], np.full(M, 3), np.eye(3) * L)
    sn = SiteNetwork(s, np.zeros(M, bool), np.ones(M, bool))
    sn.centers = centers
    st = SiteTrajectory(sn, np.zeros((F, M), dtype=int))
    st.set_real_traj(traj)

    kwargs = dict(temperature=T, n_bins=N_BINS, sigma=0.25,
                  n_samples=41, verbose=False)
    pa_straight = PathwayBarrierAnalysis(**kwargs).run(st)
    e_straight = sn.density_barrier_ij[0, 1]
    pa_string = PathwayBarrierAnalysis(path="string", **kwargs).run(st)
    e_string = sn.density_barrier_ij[0, 1]

    assert e_string == pytest.approx(SADDLE * kT, rel=0.25)
    assert e_string < 0.6 * e_straight
    # refined nodes are exposed and the profile's s is the true arc
    # length of the (curved) path — longer than the straight segment
    path = pa_string.paths_[(0, 1)]
    assert path.shape == (41, 3)
    s_str, _ = pa_string.profiles_[(0, 1)]
    s_dir, _ = pa_straight.profiles_[(0, 1)]
    assert s_str[-1] > s_dir[-1] + 0.5
    assert pa_straight.paths_[(0, 1)].shape == (41, 3)
    with pytest.raises(ValueError, match="path"):
        PathwayBarrierAnalysis(temperature=T, path="banana")
