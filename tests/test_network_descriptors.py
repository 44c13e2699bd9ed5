"""Pathways, SOAP descriptors, site typing, descriptor merging, misc."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
from sitator_tpu.misc import NAvgsPerSite, RecenterTrajectory
from sitator_tpu.network import DiffusionPathwayAnalysis
from sitator_tpu.site_descriptors import (
    MergeSitesByDescriptors,
    SiteCentersDescriptor,
    SiteTypeAnalysis,
    SOAPDescriptorAverages,
    soap_descriptors,
)
from sitator_tpu.util.dotprod import DotProdClassifier


def make_network(centers, n_mobile=2, a=12.0, seed=0, n_static=8):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, a, size=(n_static + n_mobile, 3))
    species = np.array([16] * n_static + [3] * n_mobile)
    s = Structure(pos, species, np.eye(3) * a)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = np.asarray(centers, dtype=float)
    return sn


# ------------------------------------------------------------- pathways ---
def test_pathway_percolating_1d():
    """Chain of sites across the cell with a wrap-around edge percolates 1-D;
    an isolated pair does not."""
    a = 12.0
    centers = [[1, 1, 1], [5, 1, 1], [9, 1, 1],       # chain along x
               [1, 6, 6], [5, 6, 6]]                  # isolated pair
    sn = make_network(centers, a=a)
    n_ij = np.zeros((5, 5), int)
    n_ij[0, 1] = n_ij[1, 2] = 3
    n_ij[2, 0] = 3   # 9 -> 1 crosses the boundary: wrap!
    n_ij[3, 4] = 5
    sn.add_edge_attribute("n_ij", n_ij)
    dpa = DiffusionPathwayAnalysis(verbose=False)
    dpa.run(sn)
    assert dpa.n_pathways == 2
    pw = sn.diffusion_pathway
    assert pw[0] == pw[1] == pw[2]
    assert pw[3] == pw[4] != pw[0]
    chain_id = pw[0]
    assert dpa.pathway_dims[chain_id] == 1
    assert dpa.pathway_percolating[chain_id]
    assert dpa.pathway_dims[pw[3]] == 0


def test_pathway_3d_grid():
    """Full periodic cubic grid of connected sites percolates in 3-D.
    (n=3 per axis: with n=2 the ±half-cell neighbor displacement is
    geometrically ambiguous and wraps are undetectable from n_ij alone.)"""
    n, a = 3, 12.0
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    centers = (grid + 0.5) * (a / n)
    sn = make_network(centers, a=a)
    S = len(centers)
    n_ij = np.zeros((S, S), int)
    idx3 = {tuple(g): i for i, g in enumerate(grid)}
    for i, g in enumerate(grid):
        for d in range(3):
            gg = list(g)
            gg[d] = (gg[d] + 1) % n
            n_ij[i, idx3[tuple(gg)]] = 2
    sn.add_edge_attribute("n_ij", n_ij)
    dpa = DiffusionPathwayAnalysis(verbose=False)
    dpa.run(sn)
    assert dpa.n_pathways == 1
    assert dpa.pathway_dims[0] == 3


def test_pathway_threshold():
    sn = make_network([[1, 1, 1], [5, 5, 5]])
    n_ij = np.zeros((2, 2), int)
    n_ij[0, 1] = 1
    sn.add_edge_attribute("n_ij", n_ij)
    dpa = DiffusionPathwayAnalysis(connectivity_threshold=3, verbose=False)
    dpa.run(sn)
    assert dpa.n_pathways == 0
    assert np.all(sn.diffusion_pathway == -1)


# ----------------------------------------------------------------- SOAP ---
def _env(a=14.0):
    """Two distinct probe environments: octahedral and tetrahedral cages."""
    center_o = np.array([3.5, 3.5, 3.5])
    oct_pts = center_o + 2.0 * np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
         [0, 0, -1]])
    center_t = np.array([10.0, 10.0, 10.0])
    tet_pts = center_t + 2.0 / np.sqrt(3) * np.array(
        [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]])
    pos = np.concatenate([oct_pts, tet_pts])
    species = np.array([16] * len(pos))
    return pos, species, np.eye(3) * a, center_o, center_t


def test_soap_rotation_invariance(rng):
    pos, species, cell, c_o, _ = _env()
    d0 = soap_descriptors(c_o[None], pos, species, cell, r_cut=4.0)
    # rotate the octahedron about its center by a random rotation
    from scipy.spatial.transform import Rotation
    R = Rotation.random(random_state=3).as_matrix()
    pos_rot = pos.copy()
    pos_rot[:6] = (pos[:6] - c_o) @ R.T + c_o
    d1 = soap_descriptors(c_o[None], pos_rot, species, cell, r_cut=4.0)
    np.testing.assert_allclose(d0, d1, atol=2e-4)


def test_soap_distinguishes_environments():
    pos, species, cell, c_o, c_t = _env()
    d = soap_descriptors(np.stack([c_o, c_t]), pos, species, cell, r_cut=4.0)
    sim = float(d[0] @ d[1])
    assert sim < 0.95          # oct vs tet clearly distinct
    # same environment at both probes -> identical descriptors
    d2 = soap_descriptors(np.stack([c_o, c_o]), pos, species, cell,
                          r_cut=4.0)
    np.testing.assert_allclose(d2[0], d2[1], atol=1e-6)


def test_soap_translation_and_pbc(rng):
    """Descriptor is invariant under rigid translation, even across the
    periodic boundary."""
    pos, species, cell, c_o, _ = _env()
    d0 = soap_descriptors(c_o[None], pos, species, cell, r_cut=4.0)
    t = np.array([12.0, 13.0, 11.5])   # pushes atoms out of the cell
    d1 = soap_descriptors((c_o + t)[None], pos + t, species, cell, r_cut=4.0)
    np.testing.assert_allclose(d0, d1, atol=1e-5)


# ----------------------------------------------- typing over descriptors --
def _typed_system(n_oct=3, n_tet=3, a=30.0, jitter=0.05, seed=0):
    """Several oct/tet cages scattered in a big cell + assigned ions."""
    rng = np.random.default_rng(seed)
    host = []
    centers = []
    kinds = []
    spots = rng.choice(len(np.arange(8)), size=n_oct + n_tet, replace=False)
    anchors = (np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing="ij"),
                        axis=-1).reshape(-1, 3) * (a / 2) + 4.0)[spots]
    for i, anchor in enumerate(anchors):
        if i < n_oct:
            pts = anchor + 2.0 * np.array(
                [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
                 [0, 0, -1]])
            kinds.append(0)
        else:
            pts = anchor + 2.0 / np.sqrt(3) * np.array(
                [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]])
            kinds.append(1)
        pts = pts + rng.normal(scale=jitter, size=pts.shape)
        host.append(pts)
        centers.append(anchor)
    host = np.concatenate(host)
    centers = np.asarray(centers, dtype=float)
    S = len(centers)
    n_mobile = 2
    pos = np.concatenate([host, centers[:n_mobile] + 0.1])
    species = np.array([16] * len(host) + [3] * n_mobile)
    s = Structure(pos, species, np.eye(3) * a)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = centers
    # trajectory: ions sit at sites (cycling), real traj = probe at center
    F = 12
    traj = np.stack([np.arange(F) % S, (np.arange(F) + 1) % S], axis=1)
    st = SiteTrajectory(sn, traj.astype(np.int32))
    real = np.zeros((F, s.n_atoms, 3), dtype=np.float32)
    real[:, s.species == 16] = host
    mobile_idx = np.flatnonzero(s.species == 3)
    for f in range(F):
        for k, ion in enumerate(mobile_idx):
            real[f, ion] = centers[traj[f, k]] + rng.normal(scale=0.05,
                                                            size=3)
    st.set_real_traj(real)
    return st, np.array(kinds)


def test_site_type_analysis_recovers_oct_tet():
    st, kinds = _typed_system()
    sta = SiteTypeAnalysis(
        SOAPDescriptorAverages(r_cut=4.0, averages_n=4), n_types=2,
        verbose=False)
    sta.run(st)
    types = st.site_network.site_types
    # perfect partition (up to label swap)
    assert len(np.unique(types)) == 2
    for k in (0, 1):
        assert len(np.unique(types[kinds == k])) == 1
    assert types[kinds == 0][0] != types[kinds == 1][0]


def test_site_type_analysis_elbow_mode():
    st, kinds = _typed_system()
    sta = SiteTypeAnalysis(
        SOAPDescriptorAverages(r_cut=4.0, averages_n=4), max_types=5,
        verbose=False)
    sta.run(st)
    assert st.site_network.site_types is not None
    assert 1 <= st.site_network.n_types <= 5


def test_merge_sites_by_descriptors():
    """Two sites sharing an identical environment merge; a distinct one
    survives — using the per-center descriptor."""
    st, kinds = _typed_system(n_oct=2, n_tet=1)
    merged = MergeSitesByDescriptors(
        SiteCentersDescriptor(r_cut=4.0), similarity_threshold=0.98,
        distance_threshold=100.0, verbose=False).run(st)
    assert merged.site_network.n_sites == 2


# ------------------------------------------------------------------ misc --
def test_navgs_per_site():
    st, kinds = _typed_system()
    S = st.site_network.n_sites
    out = NAvgsPerSite(n=3, verbose=False).run(st)
    assert out.n_sites == 3 * S
    src = out.source_site
    assert np.all(np.bincount(src, minlength=S) == 3)
    # averages sit near their source site centers
    d = np.linalg.norm(out.centers - st.site_network.centers[src], axis=1)
    assert d.max() < 0.5


def test_recenter_trajectory():
    rng = np.random.default_rng(0)
    F, N = 20, 6
    base = rng.uniform(0, 10, size=(N, 3))
    drift = np.cumsum(rng.normal(scale=0.1, size=(F, 1, 3)), axis=0)
    traj = base[None] + drift
    static_mask = np.ones(N, dtype=bool)
    out = RecenterTrajectory().run(static_mask, traj)
    # after recentering, the static COM is constant
    com = out.mean(axis=1)
    np.testing.assert_allclose(com - com[0], 0, atol=1e-10)


def test_recenter_trajectory_wrapped():
    # a static atom oscillating across a cell face contributes spurious ±L
    # to the naive COM; with cell passed, min-image displacements fix it
    rng = np.random.default_rng(1)
    L = 10.0
    cell = np.eye(3) * L
    F, N = 30, 5
    base = rng.uniform(1, 9, size=(N, 3))
    base[0] = [0.02, 5.0, 5.0]  # sits on the x face
    drift = np.cumsum(rng.normal(scale=0.05, size=(F, 1, 3)), axis=0)
    jitter = rng.normal(scale=0.05, size=(F, N, 3))
    traj_unwrapped = base[None] + drift + jitter
    traj = traj_unwrapped % L  # wrapped coordinates, as MD dumps them
    out = RecenterTrajectory().run(np.ones(N, bool), traj, cell=cell)
    ref = RecenterTrajectory().run(np.ones(N, bool), traj_unwrapped)
    # recentred wrapped traj matches recentred unwrapped traj mod L
    d = (out - ref) @ np.linalg.inv(cell)
    d -= np.round(d)
    np.testing.assert_allclose(d @ cell, 0, atol=1e-8)


def test_dotprod_classifier_api(rng):
    base = np.zeros((3, 16))
    base[0, 0] = base[1, 5] = base[2, 11] = 1.0
    X = np.repeat(base, 50, axis=0) + rng.normal(scale=0.05, size=(150, 16))
    clf = DotProdClassifier(threshold=0.8, min_samples=10)
    labels, confs = clf.fit_predict(X, return_confidences=True)
    assert clf.n_clusters == 3
    assert clf.cluster_centers.shape == (3, 16)
    assert len(np.unique(labels[labels >= 0])) == 3
    # predict on held-out data
    lab2 = clf.predict(base + 0.01)
    assert len(np.unique(lab2)) == 3


def test_site_volumes():
    from sitator_tpu.network import SiteVolumes
    rng = np.random.default_rng(4)
    sn = make_network([[3.0, 3, 3], [9.0, 9, 9]], n_mobile=1)
    F = 60
    traj = (np.arange(F) % 2).astype(np.int32)[:, None]
    st = SiteTrajectory(sn, traj)
    real = np.zeros((F, sn.structure.n_atoms, 3))
    mobile_idx = np.flatnonzero(sn.mobile_mask)
    # site 0: points in a ~1 A ball; site 1: ~2 A ball -> ~8x volume
    for f in range(F):
        c = sn.centers[traj[f, 0]]
        r = 0.5 if traj[f, 0] == 0 else 1.0
        real[f, mobile_idx[0]] = c + rng.uniform(-r, r, 3)
    st.set_real_traj(real)
    SiteVolumes(verbose=False).run(st)
    v = sn.site_volumes
    assert np.all(np.isfinite(v))
    assert 3 < v[1] / v[0] < 20
    assert np.all(np.isfinite(sn.site_surface_areas))


def test_site_volumes_insufficient_points():
    from sitator_tpu.network import SiteVolumes
    sn = make_network([[3.0, 3, 3], [9.0, 9, 9]], n_mobile=1)
    traj = np.zeros((3, 1), np.int32)  # site 1 never visited
    st = SiteTrajectory(sn, traj)
    st.set_real_traj(np.random.default_rng(0).uniform(
        0, 12, (3, sn.structure.n_atoms, 3)))
    SiteVolumes(verbose=False).run(st)
    assert np.isnan(sn.site_volumes[1])
    import pytest as _p
    with _p.raises(ValueError):
        SiteVolumes(error_on_insufficient=True, verbose=False).run(st)


def test_radial_orthonormalizer_orthonormality():
    """u = phi @ W must satisfy ∫ u_n u_n' r² dr = δ_nn' on the kept
    channels (canonical orthogonalization zeroes near-null directions of
    ill-conditioned bases — identically-zero u columns are allowed)."""
    from sitator_tpu.site_descriptors.soap import (_radial_raw_np,
                                                   radial_orthonormalizer)
    r_cut, sigma, n_max = 5.0, 0.5, 8
    r = np.linspace(0.0, r_cut, 4096)
    for basis, min_rank in (("gauss", 8), ("poly", 5)):
        W = radial_orthonormalizer(r_cut, sigma, n_max, basis)
        u = _radial_raw_np(r, r_cut, sigma, n_max, basis) @ W
        S = np.trapezoid(u[:, :, None] * u[:, None, :]
                         * (r ** 2)[:, None, None], r, axis=0)
        kept = np.flatnonzero(np.abs(W).sum(axis=0) > 0)
        assert len(kept) >= min_rank, (basis, len(kept))
        np.testing.assert_allclose(S[np.ix_(kept, kept)],
                                   np.eye(len(kept)), atol=5e-3)
        dropped = np.setdiff1d(np.arange(n_max), kept)
        assert np.abs(S[dropped]).max(initial=0.0) < 1e-12


def test_soap_poly_basis_invariances(rng):
    """The polynomial radial basis keeps rotation + species invariances."""
    from scipy.spatial.transform import Rotation
    cell = np.eye(3) * 12.0
    r = np.random.default_rng(7)
    pos = r.random((20, 3)) * 6.0 + 3.0
    species = np.array([16] * 14 + [3] * 6)
    probe = np.array([[6.0, 6.0, 6.0]])
    d0 = soap_descriptors(probe, pos, species, cell, r_cut=4.0,
                          radial_basis="poly")
    R = Rotation.from_euler("zyx", [0.4, -0.9, 1.3]).as_matrix()
    ctr = probe[0]
    d1 = soap_descriptors(probe, (pos - ctr) @ R.T + ctr, species, cell,
                          r_cut=4.0, radial_basis="poly")
    np.testing.assert_allclose(d0, d1, atol=2e-4)
    # distinguishes species layouts
    d2 = soap_descriptors(probe, pos, species[::-1], cell, r_cut=4.0,
                          radial_basis="poly")
    assert np.abs(d0 - d2).max() > 1e-3


def test_soap_gauss_orthonormalized_differs_from_raw():
    """The Löwdin transform is not a no-op: descriptors change vs the raw
    overlapping-Gaussian projection (pre-0.3 behavior) but stay unit-norm."""
    from functools import partial as _p
    import jax
    import jax.numpy as jnp
    from sitator_tpu.site_descriptors.soap import _soap_one
    cell = np.eye(3, dtype=np.float32) * 12.0
    r = np.random.default_rng(8)
    pos = (r.random((15, 3)) * 6.0 + 3.0).astype(np.float32)
    onehot = np.ones((15, 1), np.float32)
    probe = jnp.asarray(np.array([6.0, 6.0, 6.0], np.float32))
    args = (probe, jnp.asarray(pos), jnp.asarray(onehot),
            jnp.asarray(cell), jnp.asarray(np.linalg.inv(cell),
                                           np.float32),
            4.0, 0.5, 8, 4, 1)
    d_raw = np.asarray(_soap_one(*args, W=None))
    from sitator_tpu.site_descriptors.soap import radial_orthonormalizer
    W = jnp.asarray(radial_orthonormalizer(4.0, 0.5, 8))
    d_ortho = np.asarray(_soap_one(*args, W=W))
    assert np.abs(d_raw - d_ortho).max() > 1e-3
    np.testing.assert_allclose(np.linalg.norm(d_ortho), 1.0, atol=1e-5)


# ------------------------------------------- Gaussian-smeared density ---
def _oracle_smeared_soap(probe, neigh, species, r_cut, sigma, n_max, l_max):
    """Direct 3D quadrature of the Gaussian-smeared density expansion —
    the from-first-principles oracle for ``density='gauss'``."""
    import math
    from numpy.polynomial.legendre import leggauss
    from scipy.special import sph_harm_y
    from sitator_tpu.site_descriptors.soap import (_radial_raw_np,
                                                   radial_orthonormalizer)

    species_list = np.unique(species)
    W = radial_orthonormalizer(r_cut, sigma, n_max, "gauss")
    nr, nt, npn = 320, 48, 96
    r = np.linspace(0, r_cut, nr)
    ct, wt = leggauss(nt)
    phi = np.linspace(0, 2 * np.pi, npn, endpoint=False)
    dphi = 2 * np.pi / npn
    st = np.sqrt(1 - ct ** 2)
    x = r[:, None, None] * st[None, :, None] * np.cos(phi)[None, None, :]
    y = r[:, None, None] * st[None, :, None] * np.sin(phi)[None, None, :]
    z = r[:, None, None] * ct[None, :, None] * np.ones_like(phi)[None, None]
    pts = np.stack([x, y, z], -1)
    u = _radial_raw_np(r, r_cut, sigma, n_max, "gauss") @ W

    th = np.arccos(ct)[:, None] * np.ones_like(phi)[None, :]
    ph = np.ones_like(ct)[:, None] * phi[None, :]
    Y = {}
    for l in range(l_max + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            ylm = sph_harm_y(l, am, th, ph)
            if m == 0:
                Y[(l, m)] = ylm.real
            elif m > 0:
                Y[(l, m)] = np.sqrt(2) * (-1) ** am * ylm.real
            else:
                Y[(l, m)] = np.sqrt(2) * (-1) ** am * ylm.imag

    c = {}
    for si, sp in enumerate(species_list):
        rho = np.zeros((nr, nt, npn))
        for j in np.flatnonzero(species == sp):
            d = neigh[j] - probe
            R = np.linalg.norm(d)
            fc = 0.5 * (np.cos(np.pi * R / r_cut) + 1) if R < r_cut else 0.0
            diff = pts - d
            rho += fc * np.exp(-np.sum(diff ** 2, -1) / (2 * sigma ** 2))
        for n in range(n_max):
            for l in range(l_max + 1):
                for m in range(-l, l + 1):
                    integrand = (rho * Y[(l, m)][None]
                                 * u[:, n, None, None]
                                 * (r ** 2)[:, None, None])
                    c[(si, n, l, m)] = np.trapezoid(
                        (integrand * wt[None, :, None]).sum(1).sum(-1)
                        * dphi, r)
    S = len(species_list)
    out = []
    for l in range(l_max + 1):
        pl = np.zeros((S, S, n_max, n_max))
        for s in range(S):
            for t in range(S):
                for n in range(n_max):
                    for p2 in range(n_max):
                        pl[s, t, n, p2] = sum(
                            c[(s, n, l, m)] * c[(t, p2, l, m)]
                            for m in range(-l, l + 1))
        out.append((pl / math.sqrt(2 * l + 1)).ravel())
    p = np.concatenate(out)
    return p / np.linalg.norm(p)


def test_soap_gauss_density_matches_3d_quadrature():
    """density='gauss' (analytic Bessel-integral table) reproduces direct
    3D numerical quadrature of the smeared density — the GAP-fidelity
    accuracy claim (VERDICT r2 item 5)."""
    r_cut, sigma, n_max, l_max = 4.0, 0.5, 4, 3
    cell = np.eye(3) * 40.0
    probe = np.array([20.0, 20.0, 20.0])
    neigh = probe + np.array([[1.2, 0.3, -0.4],
                              [-0.9, 1.7, 0.8],
                              [0.1, -1.1, 2.2]])
    species = np.array([16, 16, 3])
    want = _oracle_smeared_soap(probe, neigh, species, r_cut, sigma,
                                n_max, l_max)
    got = soap_descriptors(probe[None], neigh, species, cell, r_cut=r_cut,
                           sigma=sigma, n_max=n_max, l_max=l_max,
                           density="gauss")[0]
    assert float(got @ want) > 0.999999
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_soap_gauss_density_rotation_invariance(rng):
    pos, species, cell, c_o, _ = _env()
    d0 = soap_descriptors(c_o[None], pos, species, cell, r_cut=4.0,
                          density="gauss")
    from scipy.spatial.transform import Rotation
    R = Rotation.random(random_state=3).as_matrix()
    pos_rot = pos.copy()
    pos_rot[:6] = (pos[:6] - c_o) @ R.T + c_o
    d1 = soap_descriptors(c_o[None], pos_rot, species, cell, r_cut=4.0,
                          density="gauss")
    np.testing.assert_allclose(d0, d1, atol=2e-4)


def test_soap_gauss_small_sigma_approaches_delta():
    """As the smearing width shrinks (poly basis, so sigma ONLY controls
    the smearing), the smeared descriptor converges to the delta-density
    descriptor — the two density models are consistent limits."""
    pos, species, cell, c_o, _ = _env()
    d_delta = soap_descriptors(c_o[None], pos, species, cell, r_cut=4.0,
                               sigma=0.06, n_max=4, l_max=3,
                               radial_basis="poly", density="delta")[0]
    d_gauss = soap_descriptors(c_o[None], pos, species, cell, r_cut=4.0,
                               sigma=0.06, n_max=4, l_max=3,
                               radial_basis="poly", density="gauss")[0]
    assert float(d_delta @ d_gauss) > 0.999


def test_recenter_trajectory_large_total_drift():
    """Accumulated drift far beyond half a cell vector: the chained
    minimum-image unwrap keeps the correction exact where a frame-0
    minimum image would wrap (review finding r4-late)."""
    rng = np.random.default_rng(2)
    L = 8.0
    cell = np.eye(3) * L
    F, N = 200, 5
    base = rng.uniform(1, 7, size=(N, 3))
    # total drift ~ 0.15 * 200 = 30 Å ≈ 3.75 cells along x
    drift = np.cumsum(np.full((F, 1, 3), [0.15, 0.0, 0.05]), axis=0)
    jitter = rng.normal(scale=0.03, size=(F, N, 3))
    traj_unwrapped = base[None] + drift + jitter
    out = RecenterTrajectory().run(np.ones(N, bool),
                                   traj_unwrapped % L, cell=cell)
    ref = RecenterTrajectory().run(np.ones(N, bool), traj_unwrapped)
    d = (out - ref) @ np.linalg.inv(cell)
    d -= np.round(d)
    np.testing.assert_allclose(d @ cell, 0, atol=1e-8)


def test_navgs_insufficient_and_type_carry():
    """error_on_insufficient raises the per-site error; with it off, an
    underfilled site contributes a single pooled average; site_types are
    remapped onto the expanded network (coverage audit)."""
    st, kinds = _typed_system()
    sn = st.site_network
    if sn.site_types is None:
        sn.site_types = np.arange(sn.n_sites) % 2
    F = st.n_frames
    # starve site 0: unassign it everywhere but 2 frames
    labels = st.traj.copy()
    hit = np.flatnonzero(labels == 0)
    keep = hit[:2]
    flat = labels.ravel()
    drop = np.setdiff1d(hit, keep)
    flat[drop] = -1
    st2 = type(st)(sn, flat.reshape(labels.shape))
    st2.set_real_traj(st.real_trajectory)
    with pytest.raises(ValueError, match="< n="):
        NAvgsPerSite(n=3, error_on_insufficient=True,
                     verbose=False).run(st2)
    out = NAvgsPerSite(n=3, verbose=False).run(st2)
    src = out.source_site
    assert (src == 0).sum() == 1            # pooled single average
    assert out.site_types is not None
    np.testing.assert_array_equal(out.site_types, sn.site_types[src])


def test_pathway_trajectory_input_validation_and_minsize():
    """SiteTrajectory input auto-runs JumpAnalysis; a bare SiteNetwork
    without n_ij raises; minimum_n_sites drops small components;
    re-running replaces the attribute; verbose logs (coverage audit)."""
    from sitator_tpu.core.sitetraj import SiteTrajectory

    a = 12.0
    centers = [[1, 1, 1], [5, 1, 1], [9, 1, 1], [1, 6, 6], [5, 6, 6]]
    sn = make_network(centers, a=a)
    with pytest.raises(ValueError, match="no n_ij"):
        DiffusionPathwayAnalysis(verbose=False).run(sn)

    # labels walking the x-chain + an isolated pair exchange
    chain = np.tile([0, 1, 2], 60)
    pair = np.tile([3, 4], 90)
    labels = np.stack([chain, pair], axis=1)
    st = SiteTrajectory(sn, labels)
    dpa = DiffusionPathwayAnalysis(minimum_n_sites=3, verbose=True)
    dpa.run(st)                      # SiteTrajectory route, auto-jump
    assert dpa.n_pathways == 1       # pair dropped by minimum_n_sites
    pw1 = sn.diffusion_pathway.copy()
    assert (pw1[:3] == 0).all() and (pw1[3:] == dpa.NO_PATHWAY).all()
    dpa.run(st)                      # rerun replaces the attribute
    np.testing.assert_array_equal(sn.diffusion_pathway, pw1)
