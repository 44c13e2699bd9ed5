"""Direct tests for user-facing API pieces that were previously only
exercised indirectly (round-4 coverage sweep): core-object conveniences,
PBC functional helpers, IO format utilities, and small analysis helpers.
Reference parity citations: SURVEY.md §3.1 (SiteNetwork/SiteTrajectory
surface), §3.7 (PBCCalculator, elbow)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
from sitator_tpu.core.structure import number_to_symbol, symbol_to_number


@pytest.fixture()
def tiny_sn():
    pos = np.array([[0.0, 0, 0], [2, 0, 0], [0, 2, 0], [1, 1, 1.0]])
    species = np.array([16, 16, 16, 3])
    s = Structure(pos, species, np.eye(3) * 4.0)
    sn = SiteNetwork(s, species == 16, species == 3)
    sn.centers = np.array([[1.0, 0, 0], [0, 1, 0.0]])
    return sn


def test_structure_symbols_and_dict_roundtrip():
    assert symbol_to_number("Li") == 3
    assert number_to_symbol(3) == "Li"
    s = Structure(np.zeros((2, 3)), np.array([3, 16]), np.eye(3) * 5.0)
    s2 = Structure.from_dict(s.to_dict(prefix="x/"), prefix="x/")
    assert s2 == s
    moved = s.with_positions(s.positions + 1.0)
    assert moved != s and np.allclose(moved.positions, 1.0)
    assert "Li" in repr(s) and "S" in repr(s)


def test_sitenetwork_conveniences(tiny_sn):
    sn = tiny_sn
    assert not sn.has_vertices
    sn.vertices = [np.array([0, 1]), np.array([0, 2])]
    assert sn.has_vertices
    np.testing.assert_array_equal(sn.site_ids, [0, 1])
    assert sn.static_structure.n_atoms == 3
    assert sn.mobile_structure.n_atoms == 1
    assert (sn.static_structure.species == 16).all()

    sn.add_site_attribute("occupancies", np.array([0.5, 0.25]))
    sn.add_edge_attribute("n_ij", np.zeros((2, 2)))
    assert sn.has_attribute("occupancies") and sn.has_attribute("n_ij")
    np.testing.assert_array_equal(sn.get_site_attribute("occupancies"),
                                  [0.5, 0.25])
    assert sn.get_edge_attribute("n_ij").shape == (2, 2)
    sn.remove_attribute("n_ij")
    assert not sn.has_attribute("n_ij")
    with pytest.raises(KeyError):
        sn.remove_attribute("n_ij")
    sn.clear_attributes()
    assert not sn.has_attribute("occupancies")


def test_sitetraj_real_traj_lifecycle(tiny_sn):
    st = SiteTrajectory(tiny_sn, np.zeros((3, 1), np.int32))
    assert st.real_trajectory is None
    traj = np.zeros((3, 4, 3), np.float32)
    st.set_real_traj(traj)
    assert st.real_trajectory is traj
    st.remove_real_traj()
    assert st.real_trajectory is None
    with pytest.raises(ValueError):
        st.set_real_traj(np.zeros((2, 4, 3)))  # frame-count mismatch


def test_pbc_functional_helpers():
    from sitator_tpu.ops import pbc
    cell = jnp.asarray(np.diag([4.0, 5.0, 6.0]).astype(np.float32))
    cinv = pbc.cell_inverse(cell)
    x = jnp.asarray([[4.5, -1.0, 11.5]])
    f = pbc.to_frac(x, cinv)
    np.testing.assert_allclose(pbc.to_cart(f, cell), x, atol=1e-5)
    w = pbc.to_cart(pbc.wrap_frac(f), cell)
    np.testing.assert_allclose(np.asarray(w), [[0.5, 4.0, 5.5]], atol=1e-5)

    a = jnp.asarray([[0.1, 0.0, 0.0]])
    b = jnp.asarray([[3.9, 0.0, 0.0]])  # min image across the boundary
    np.testing.assert_allclose(
        np.asarray(pbc.pbc_distance(a, b, cell, cinv)), [0.2], atol=1e-5)
    d = pbc.pairwise_pbc_distances(jnp.concatenate([a, b]), b, cell, cinv)
    np.testing.assert_allclose(np.asarray(d), [[0.2], [0.0]], atol=1e-5)

    # pbc_average across the boundary lands at the wrap point, not 2.0
    pts = jnp.asarray([[0.2, 0, 0], [3.8, 0, 0.0]])
    avg = np.asarray(pbc.pbc_average(pts, cell, cinv))
    assert min(abs(avg[0] - 0.0), abs(avg[0] - 4.0)) < 1e-5
    mavg = np.asarray(pbc.masked_pbc_average(
        jnp.concatenate([pts, jnp.ones((1, 3)) * 2.0]),
        jnp.asarray([True, True, False]), cell, cinv))
    np.testing.assert_allclose(mavg, avg, atol=1e-5)


def test_pbc_calculator_paired_distances():
    from sitator_tpu.ops.pbc import PBCCalculator
    calc = PBCCalculator(np.eye(3) * 4.0)
    a = np.array([[0.1, 0, 0], [1.0, 1, 1]])
    b = np.array([[3.9, 0, 0], [1.0, 1, 1]])
    np.testing.assert_allclose(calc.paired_distances(a, b), [0.2, 0.0],
                               atol=1e-6)


def test_jump_lag_by_type(tiny_sn):
    from sitator_tpu.dynamics import JumpAnalysis
    labels = np.array([[0], [0], [1], [1], [0]], np.int32)
    st = SiteTrajectory(tiny_sn, labels)
    ja = JumpAnalysis(verbose=False)
    ja.run(st)
    tiny_sn.site_types = np.array([0, 1], np.int32)
    types, lag = ja.jump_lag_by_type(tiny_sn)
    np.testing.assert_array_equal(types, [0, 1])
    assert lag.shape == (2, 2)
    # the 0->1 jump closed a 2-frame residence; 1->0 closed 2 frames
    assert lag[0, 1] == 2.0 and lag[1, 0] == 2.0
    tiny_sn.site_types = None
    with pytest.raises(ValueError):
        ja.jump_lag_by_type(tiny_sn)


def test_elbow_index():
    from sitator_tpu.util.elbow import elbow_index
    y = np.array([10.0, 4.0, 2.0, 1.8, 1.7, 1.6])
    assert elbow_index(y) in (1, 2)
    assert elbow_index([1.0, 1.0]) == 0        # too short
    assert elbow_index([2.0, 2.0, 2.0]) == 0   # degenerate chord


def test_dotprod_refine_recenters():
    from sitator_tpu.ops.cluster import dotprod_refine
    rng = np.random.default_rng(0)
    c_true = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]], np.float32)
    X = np.repeat(c_true, 30, axis=0) + 0.05 * rng.standard_normal(
        (60, 4)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    c0 = np.zeros((4, 4), np.float32)
    c0[:2] = X[[0, 30]]
    centers, counts = dotprod_refine(jnp.asarray(X), jnp.asarray(c0), 2,
                                     k_max=4, cluster_threshold=0.5)
    centers = np.asarray(centers)
    sims = np.abs(centers[:2] @ c_true.T)
    assert (sims.max(axis=1) > 0.99).all()
    assert int(np.asarray(counts)[:2].sum()) == 60


def test_io_format_utilities(tmp_path):
    from sitator_tpu.io.formats import (NpzTrajectory, iread_xdatcar,
                                        sniff_format, write_xdatcar)
    md_pos = np.linspace(0, 1, 2 * 3 * 3).reshape(2, 3, 3).astype(np.float32)
    s = Structure(md_pos[0], np.array([3, 16, 16]), np.eye(3) * 4.0)
    x = tmp_path / "XDATCAR"
    write_xdatcar(str(x), s, md_pos)
    assert sniff_format(str(x)) == "xdatcar"
    frames = [(st, p) for st, p in iread_xdatcar(str(x))]
    assert len(frames) == 2
    np.testing.assert_allclose(frames[1][1], md_pos[1], atol=1e-4)

    npz = tmp_path / "t.npz"
    np.savez(npz, positions=md_pos, **s.to_dict(prefix="structure/"))
    r = NpzTrajectory(str(npz))
    assert len(r) == 2 and r.n_atoms == 3
    np.testing.assert_allclose(r[0:2], md_pos, atol=1e-6)


def test_is_zarr_store(tmp_path):
    from sitator_tpu.io.tensorstore_io import convert_to_zarr, is_zarr_store
    assert not is_zarr_store(str(tmp_path))
    np.save(tmp_path / "t.npy", np.zeros((2, 2, 3), np.float32))
    convert_to_zarr(str(tmp_path / "t.npy"), str(tmp_path / "o.zarr"))
    assert is_zarr_store(str(tmp_path / "o.zarr"))


def test_ase_adapter_without_ase():
    ase_installed = True
    try:
        import ase  # noqa: F401
    except ImportError:
        ase_installed = False
    from sitator_tpu.io.ase_adapter import trajectory_from_ase
    if not ase_installed:  # this rig: a clean error, not a crash
        with pytest.raises(ImportError):
            trajectory_from_ase([])


# ---------------------------------------------------------------------------
# second coverage wave: registry, mesh helpers, IO utilities, viz core
# ---------------------------------------------------------------------------

def test_cluster_backend_registry():
    """SURVEY §3.2 component 5: the backend protocol is pluggable by name
    or module, with typed errors for bad values."""
    import types

    from sitator_tpu.io import make_hopping_trajectory
    from sitator_tpu.landmark import LandmarkAnalysis
    from sitator_tpu.landmark.cluster import (get_backend, register_backend,
                                              dotprod)
    from sitator_tpu.voronoi import VoronoiSiteGenerator

    assert get_backend("dotprod") is dotprod
    with pytest.raises(ValueError, match="unknown clustering backend"):
        get_backend("nope")
    with pytest.raises(TypeError):
        get_backend(42)

    # a custom module-like backend is accepted directly AND by name
    calls = []

    def fake(landmark_vectors, clustering_params, min_samples, verbose=False):
        calls.append(len(landmark_vectors))
        return dotprod.do_landmark_clustering(
            landmark_vectors, clustering_params, min_samples, verbose)

    custom = types.SimpleNamespace(do_landmark_clustering=fake)
    assert get_backend(custom) is custom
    register_backend("custom_test_backend", custom)
    try:
        md = make_hopping_trajectory(n_cells=2, a=4.0, n_ions=2,
                                     n_frames=60, jump_rate=0.02, seed=3)
        sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
        seeds = VoronoiSiteGenerator(merge_tol=0.05).run(sn0)
        st = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                              clustering_algorithm="custom_test_backend",
                              verbose=False).run(seeds, md.traj)
        assert calls, "registered backend was not invoked"
        assert st.site_network.n_sites > 0
    finally:
        from sitator_tpu.landmark.cluster import _BACKENDS
        _BACKENDS.pop("custom_test_backend", None)


def test_mesh_helpers_semantics():
    import jax
    import jax.numpy as jnp

    from sitator_tpu.parallel.mesh import (frame_mesh, frame_sharding,
                                           pad_frames, replicated,
                                           shard_map_frames)

    mesh = frame_mesh()
    assert mesh.devices.size == 8          # conftest pins 8 virtual devices

    arr = np.arange(10 * 2, dtype=np.float32).reshape(10, 2)
    padded, n_valid = pad_frames(arr, 8)
    assert padded.shape == (16, 2) and n_valid == 10
    np.testing.assert_array_equal(padded[10:], np.broadcast_to(arr[-1:],
                                                               (6, 2)))
    same, n_same = pad_frames(arr[:8], 8)
    assert same.shape == (8, 2) and n_same == 8

    fs, rep = frame_sharding(mesh), replicated(mesh)
    assert fs.mesh is mesh and rep.mesh is mesh
    assert fs.spec != rep.spec

    x = jnp.arange(16.0).reshape(16, 1)
    w = jnp.asarray(2.0)

    def fn(xb, wrep):
        return xb + 1.0, xb * wrep

    a, b = shard_map_frames(fn, mesh, 1, x, w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(x) + 1.0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(x) * 2.0)


def test_iter_text_frames_matches_readers(tmp_path):
    from sitator_tpu.io.formats import (iter_text_frames, read_lammps_dump,
                                        read_xdatcar, read_xyz,
                                        write_lammps_dump, write_xdatcar,
                                        write_xyz)

    rng = np.random.default_rng(5)
    cell = np.array([[6.0, 0, 0], [0.5, 7.0, 0], [0.2, -0.3, 8.0]])
    pos = rng.uniform(0, 5, (4, 3))
    s = Structure(pos, ["Si", "Si", "Li", "Li"], cell)
    traj = pos[None] + rng.normal(0, 0.05, (3, 4, 3))

    write_xyz(tmp_path / "t.xyz", s, traj)
    write_lammps_dump(tmp_path / "t.lammpstrj", s, traj)
    write_xdatcar(tmp_path / "XDATCAR", s, traj)
    for fmt, path, reader in [
            ("xyz", tmp_path / "t.xyz", read_xyz),
            ("lammps", tmp_path / "t.lammpstrj", read_lammps_dump),
            ("xdatcar", tmp_path / "XDATCAR", read_xdatcar)]:
        frames = list(iter_text_frames(str(path), fmt))
        assert len(frames) == 3
        if fmt == "xyz":
            s2, t2 = reader(path, index="all")
        else:
            s2, t2 = reader(path)
        for (fs_, fp), want in zip(frames, np.asarray(t2)):
            np.testing.assert_allclose(fp, want, atol=1e-6)
            np.testing.assert_allclose(fs_.cell, s2.cell, atol=1e-6)


def test_parse_xdatcar_header(tmp_path):
    from sitator_tpu.io.formats import parse_xdatcar_header, write_xdatcar

    cell = np.array([[6.0, 0, 0], [0.5, 7.0, 0], [0.2, -0.3, 8.0]])
    pos = np.random.default_rng(0).uniform(0, 5, (4, 3))
    s = Structure(pos, ["Si", "Si", "Li", "Li"], cell)
    write_xdatcar(tmp_path / "XDATCAR", s, pos[None])
    with open(tmp_path / "XDATCAR") as f:
        hcell, species, counts, off = parse_xdatcar_header(f)
        line = f.readline()
    np.testing.assert_allclose(hcell, cell, atol=1e-12)
    assert list(counts) == [2, 2]
    assert line.startswith("Direct configuration")
    assert off > 0


def test_static_drift_helpers():
    import jax.numpy as jnp

    from sitator_tpu.ops.landmark import (max_static_drift,
                                          static_drift_per_frame)

    rng = np.random.default_rng(11)
    cell = np.diag([5.0, 6.0, 7.0])
    ci = np.linalg.inv(cell)
    ref = rng.uniform(0, 5, (6, 3)).astype(np.float32)
    disp = rng.normal(0, 0.1, (4, 6, 3)).astype(np.float32)
    block = ref[None] + disp
    # add a lattice-vector shift: must not count as drift
    block[2, 3] += cell[0]
    want_pf = np.sqrt((disp ** 2).sum(-1)).max(-1)
    got_pf = np.asarray(static_drift_per_frame(
        jnp.asarray(block), jnp.asarray(ref), jnp.asarray(cell),
        jnp.asarray(ci)))
    np.testing.assert_allclose(got_pf, want_pf, atol=1e-5)
    got_max = float(max_static_drift(jnp.asarray(block), jnp.asarray(ref),
                                     jnp.asarray(cell), jnp.asarray(ci)))
    assert got_max == pytest.approx(want_pf.max(), abs=1e-5)


def test_viz_core_helpers():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sitator_tpu.visualization.common import (draw_cell, layers,
                                                  plotter, species_color)

    assert species_color(16) == "#FFFF30"
    c1, c2 = species_color(999), species_color(999)
    np.testing.assert_array_equal(c1, c2)          # deterministic fallback
    assert not np.allclose(species_color(999), species_color(998))

    seen = {}

    @plotter(is3D=True)
    def dummy(fig=None, ax=None):
        seen["ax"] = ax

    fig = dummy()
    assert seen["ax"] is not None and hasattr(seen["ax"], "get_zlim")
    n0 = len(seen["ax"].lines)
    draw_cell(np.eye(3) * 4.0, seen["ax"])
    assert len(seen["ax"].lines) == n0 + 12        # cube wireframe
    fig2 = layers((dummy, {}), (dummy, {}))
    assert fig2 is not None
    plt.close("all")


def test_kernel_common_host_helpers():
    import jax.numpy as jnp

    from sitator_tpu.ops.kernel_common import pack_cell_params, round_up

    assert round_up(1, 8) == 8 and round_up(8, 8) == 8 and round_up(9, 8) == 16

    consts = jnp.asarray([4.0, 3.0, 0.5], jnp.float32)
    p_ortho, tri = pack_cell_params(jnp.asarray([5.0, 6.0, 7.0]), consts)
    assert not tri and p_ortho.shape == (6,)
    np.testing.assert_allclose(np.asarray(p_ortho),
                               [5, 6, 7, 4, 3, 0.5], atol=1e-6)
    cell = jnp.asarray([[5.0, 0, 0], [0.4, 6.0, 0], [0.1, 0.2, 7.0]])
    p_tri, tri = pack_cell_params(cell, consts)
    assert tri and p_tri.shape == (21,)
    np.testing.assert_allclose(np.asarray(p_tri[:9]).reshape(3, 3),
                               np.asarray(cell), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_tri[9:18]).reshape(3, 3) @ np.asarray(cell),
        np.eye(3), atol=1e-5)


def test_new_round4_attributes_roundtrip_save_load(tmp_path, tiny_sn):
    """Every attribute the round-4 engines persist (betweenness,
    bv_sum/bv_mismatch, density_barrier_ij, occ_corr,
    balance_p/edge_asymmetry, site_density) survives SiteNetwork
    save/load bit-exactly, including NaN patterns."""
    sn = tiny_sn
    rng = np.random.default_rng(5)
    site_attrs = {
        "betweenness": rng.uniform(0, 1, 2),
        "bv_sum": rng.uniform(0.5, 1.5, 2),
        "bv_mismatch": rng.uniform(0, 0.3, 2),
        "site_density": rng.uniform(0, 9, 2),
    }
    E = rng.uniform(0, 1, (2, 2))
    E[0, 0] = np.nan
    edge_attrs = {
        "density_barrier_ij": E,
        "occ_corr": E * -1,
        "balance_p": np.where(E > 0.5, E, np.nan),
        "edge_asymmetry": E - 0.5,
        "n_ij": np.arange(4.0).reshape(2, 2),
    }
    for k, v in site_attrs.items():
        sn.add_site_attribute(k, v)
    for k, v in edge_attrs.items():
        sn.add_edge_attribute(k, v)
    path = str(tmp_path / "net.npz")
    sn.save(path)
    from sitator_tpu import SiteNetwork
    back = SiteNetwork.load(path)
    for k, v in site_attrs.items():
        np.testing.assert_array_equal(back.get_site_attribute(k), v)
    for k, v in edge_attrs.items():
        got = getattr(back, k)
        np.testing.assert_array_equal(got, v)
