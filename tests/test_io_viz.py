"""IO formats, chunked feeder, and visualization smoke tests."""
import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from sitator_tpu import SiteNetwork, SiteTrajectory, Structure
from sitator_tpu.io import (
    ChunkedFeeder,
    H5Trajectory,
    NpyTrajectory,
    XYZTrajectory,
    open_trajectory,
    read_xyz,
    write_xyz,
)
from sitator_tpu.visualization import (
    SiteNetworkPlotter,
    layers,
    plot_atoms,
    plot_points,
)


@pytest.fixture
def structure(rng):
    cell = np.array([[10.0, 0, 0], [1.0, 9.0, 0], [0, 0, 11.0]])
    pos = rng.uniform(0, 8, size=(7, 3))
    return Structure(pos, ["Li", "Li", "S", "S", "S", "O", "O"], cell)


def test_xyz_roundtrip(structure, tmp_path):
    f = tmp_path / "s.extxyz"
    write_xyz(f, structure)
    s2 = read_xyz(f)
    assert np.array_equal(s2.species, structure.species)
    np.testing.assert_allclose(s2.positions, structure.positions, atol=1e-7)
    np.testing.assert_allclose(s2.cell, structure.cell, atol=1e-9)


def test_xyz_trajectory_roundtrip(structure, tmp_path, rng):
    traj = rng.uniform(0, 9, size=(5, 7, 3))
    f = tmp_path / "t.extxyz"
    write_xyz(f, structure, traj=traj)
    s2, t2 = read_xyz(f, index="all")
    assert t2.shape == (5, 7, 3)
    np.testing.assert_allclose(t2, traj, atol=1e-7)
    r = XYZTrajectory(f)
    assert len(r) == 5
    np.testing.assert_allclose(r[1:3], traj[1:3], atol=1e-6)


def test_npy_h5_readers(tmp_path, rng):
    traj = rng.random((20, 4, 3)).astype(np.float32)
    np.save(tmp_path / "t.npy", traj)
    r = NpyTrajectory(tmp_path / "t.npy")
    assert len(r) == 20 and r.n_atoms == 4
    np.testing.assert_allclose(r[3:7], traj[3:7])

    import h5py
    with h5py.File(tmp_path / "t.h5", "w") as f:
        f.create_dataset("positions", data=traj)
    r2 = open_trajectory(tmp_path / "t.h5")
    np.testing.assert_allclose(r2[0:20], traj)
    r2.close()


def test_chunked_feeder(tmp_path, rng):
    traj = rng.random((23, 3, 3)).astype(np.float32)
    np.save(tmp_path / "t.npy", traj)
    r = NpyTrajectory(tmp_path / "t.npy")
    got = list(ChunkedFeeder(r, block_frames=5))
    assert [lo for lo, _ in got] == [0, 5, 10, 15, 20]
    np.testing.assert_allclose(np.concatenate([b for _, b in got]), traj)
    # partial range
    got2 = list(ChunkedFeeder(r, block_frames=8, start=4, stop=20))
    assert sum(len(b) for _, b in got2) == 16


def test_feeder_propagates_errors():
    class Bad:
        def __len__(self):
            return 10

        def __getitem__(self, key):
            raise IOError("disk on fire")

    with pytest.raises(IOError):
        list(ChunkedFeeder(Bad(), block_frames=4))


def _make_annotated_st(rng):
    cell = np.eye(3) * 8.0
    pos = rng.uniform(0, 8, size=(10, 3))
    s = Structure(pos, [16] * 8 + [3] * 2, cell)
    sn = SiteNetwork(s, s.species == 16, s.species == 3)
    sn.centers = rng.uniform(0, 8, size=(4, 3))
    sn.vertices = [np.sort(rng.choice(8, 3, replace=False))
                   for _ in range(4)]
    sn.site_types = np.array([0, 0, 1, 1])
    sn.add_site_attribute("occupancies", np.array([0.5, 0.2, 0.9, 0.1]))
    sn.add_edge_attribute("n_ij", rng.integers(0, 5, size=(4, 4)))
    traj = rng.integers(-1, 4, size=(6, 2)).astype(np.int32)
    st = SiteTrajectory(sn, traj)
    st.set_real_traj(rng.uniform(0, 8, size=(6, 10, 3)))
    return st


def test_plotting_smoke(rng, tmp_path):
    st = _make_annotated_st(rng)
    sn = st.site_network
    fig = plot_atoms(sn.structure)
    fig.savefig(tmp_path / "atoms.png")
    fig = SiteNetworkPlotter(site_size_attr="occupancies",
                             site_color_attr="occupancies").plot(sn)
    fig.savefig(tmp_path / "network.png")
    fig = st.plot_frame(0)
    fig.savefig(tmp_path / "frame.png")
    fig = st.plot_site(2)
    fig.savefig(tmp_path / "site.png")
    fig = st.plot_particle_trajectory(0)
    fig.savefig(tmp_path / "ion.png")
    fig = layers((plot_atoms, dict(structure=sn.structure)),
                 (plot_points, dict(points=sn.centers, cell=sn.structure.cell)))
    fig.savefig(tmp_path / "layers.png")
    assert (tmp_path / "network.png").stat().st_size > 1000
    import matplotlib.pyplot as plt
    plt.close("all")


def test_plot_jump_lag(rng, tmp_path):
    from sitator_tpu.dynamics import JumpAnalysis
    st = _make_annotated_st(rng)
    ja = JumpAnalysis(verbose=False)
    ja.run(st)
    fig = ja.plot_jump_lag()
    fig.savefig(tmp_path / "lag.png")
    import matplotlib.pyplot as plt
    plt.close("all")


def test_read_xdatcar(tmp_path):
    from sitator_tpu.io.formats import XDATCARTrajectory, read_xdatcar
    rng = np.random.default_rng(4)
    cell = np.array([[8.0, 0, 0], [0.5, 8.5, 0], [0, 0, 9.0]])
    counts = {"S": 5, "Li": 3}
    n = sum(counts.values())
    frac = rng.random((4, n, 3))
    f = tmp_path / "XDATCAR"
    with open(f, "w") as fh:
        fh.write("test system\n  1.0\n")
        for row in cell:
            fh.write("  %.8f %.8f %.8f\n" % tuple(row))
        fh.write("  " + " ".join(counts) + "\n")
        fh.write("  " + " ".join(str(c) for c in counts.values()) + "\n")
        for t in range(4):
            fh.write(f"Direct configuration=  {t + 1}\n")
            for i in range(n):
                fh.write("  %.8f %.8f %.8f\n" % tuple(frac[t, i]))
    s, traj = read_xdatcar(f)
    assert s.n_atoms == n and len(traj) == 4
    np.testing.assert_allclose(s.cell, cell)
    np.testing.assert_allclose(traj, frac @ cell, atol=1e-6)
    assert (s.species[:5] == 16).all() and (s.species[5:] == 3).all()
    # open_trajectory auto-detects the bare XDATCAR filename (native
    # decoder when available, Python fallback otherwise)
    from sitator_tpu.io import open_trajectory
    r = open_trajectory(f)
    assert len(r) == 4 and r.n_atoms == n
    np.testing.assert_allclose(r[0:4], frac @ cell, atol=2e-4)
    np.testing.assert_allclose(r[-1], frac[-1] @ cell, atol=2e-4)
    assert np.array_equal(r.structure.species, s.species)
    # eager Python reader still importable/equal
    rp = XDATCARTrajectory(f)
    np.testing.assert_allclose(r[1:3], rp[1:3], atol=2e-4)


def test_read_lammps_dump(tmp_path):
    from sitator_tpu.io.formats import LammpsDumpTrajectory, read_lammps_dump
    rng = np.random.default_rng(5)
    L = (10.0, 11.0, 12.0)
    n = 6
    pos = rng.random((3, n, 3)) * np.array(L)
    types = np.array([1, 1, 1, 2, 2, 2])
    f = tmp_path / "run.lammpstrj"
    with open(f, "w") as fh:
        for t in range(3):
            fh.write("ITEM: TIMESTEP\n%d\n" % (t * 100))
            fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
            fh.write("ITEM: BOX BOUNDS pp pp pp\n")
            for ax in range(3):
                fh.write("0.0 %.6f\n" % L[ax])
            fh.write("ITEM: ATOMS id type x y z\n")
            order = rng.permutation(n)  # ids out of order on purpose
            for i in order:
                fh.write("%d %d %.8f %.8f %.8f\n"
                         % (i + 1, types[i], *pos[t, i]))
    s, traj = read_lammps_dump(f)
    assert s.n_atoms == n and len(traj) == 3
    np.testing.assert_allclose(np.diag(s.cell), L)
    np.testing.assert_allclose(traj, pos, atol=1e-6)  # sorted by id
    np.testing.assert_array_equal(s.species, types)
    from sitator_tpu.io import open_trajectory
    r = open_trajectory(f)  # native decoder preferred, Python fallback
    assert len(r) == 3 and r.n_atoms == n
    np.testing.assert_allclose(r[0:3], pos, atol=2e-4)
    np.testing.assert_array_equal(r.structure.species, types)
    # native decoder (if available) agrees with the Python parser exactly
    try:
        from sitator_tpu.io.native import FastLammpsTrajectory, get_lib
    except Exception:
        get_lib = lambda: None  # noqa: E731
    if get_lib() is not None:
        rn = FastLammpsTrajectory(f, cache_index=False)
        np.testing.assert_allclose(rn[0:3], traj, atol=2e-4)
        np.testing.assert_allclose(rn[-1], traj[-1], atol=2e-4)


def test_read_lammps_dump_triclinic_scaled(tmp_path):
    from sitator_tpu.io.formats import read_lammps_dump
    rng = np.random.default_rng(6)
    lx, ly, lz, xy, xz, yz = 10.0, 9.0, 8.0, 2.0, -1.0, 0.5
    cell = np.array([[lx, 0, 0], [xy, ly, 0], [xz, yz, lz]])
    n = 4
    frac = rng.random((2, n, 3))
    f = tmp_path / "tri.dump"
    with open(f, "w") as fh:
        for t in range(2):
            fh.write("ITEM: TIMESTEP\n%d\n" % t)
            fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
            fh.write("ITEM: BOX BOUNDS xy xz yz pp pp pp\n")
            fh.write("%.6f %.6f %.6f\n" % (0 + min(0, xy, xz, xy + xz),
                                           lx + max(0, xy, xz, xy + xz), xy))
            fh.write("%.6f %.6f %.6f\n" % (0 + min(0.0, yz),
                                           ly + max(0.0, yz), xz))
            fh.write("%.6f %.6f %.6f\n" % (0.0, lz, yz))
            fh.write("ITEM: ATOMS id type xs ys zs\n")
            for i in range(n):
                fh.write("%d 1 %.8f %.8f %.8f\n" % (i + 1, *frac[t, i]))
    s, traj = read_lammps_dump(f)
    np.testing.assert_allclose(s.cell, cell, atol=1e-6)
    np.testing.assert_allclose(traj, frac @ cell, atol=1e-5)


def test_convert_to_npy(tmp_path):
    from sitator_tpu.io import convert_to_npy, open_trajectory
    rng = np.random.default_rng(7)
    cell = np.eye(3) * 9.0
    s = Structure(rng.uniform(0, 9, (5, 3)), ["S"] * 5, cell)
    traj = rng.uniform(0, 9, size=(11, 5, 3)).astype(np.float32)
    # from an extxyz path (two-pass streaming)
    from sitator_tpu.io import write_xyz
    src = tmp_path / "t.extxyz"
    write_xyz(src, s, traj=traj)
    st, out = convert_to_npy(str(src), str(tmp_path / "t.npy"))
    r = open_trajectory(out)
    assert len(r) == 11
    np.testing.assert_allclose(r[0:11], traj, atol=2e-4)
    # from a reader
    from sitator_tpu.io import ArrayTrajectory
    st2, out2 = convert_to_npy(ArrayTrajectory(traj, s),
                               str(tmp_path / "t2.npy"))
    np.testing.assert_allclose(open_trajectory(out2)[0:11], traj, atol=1e-6)


def test_npy_structure_sidecar(tmp_path):
    """convert_to_npy writes a .structure.xyz sidecar; NpyTrajectory and
    open_trajectory recover species + cell from it automatically."""
    from sitator_tpu.io import convert_to_npy, open_trajectory, write_xyz
    from sitator_tpu.io.formats import structure_sidecar_path
    rng = np.random.default_rng(11)
    cell = np.array([[8.0, 0, 0], [0.4, 7.0, 0], [0.1, 0.2, 6.0]])
    s = Structure(rng.uniform(0, 5, (4, 3)), ["Li", "S", "S", "S"], cell)
    traj = rng.uniform(0, 5, size=(6, 4, 3)).astype(np.float32)
    src = tmp_path / "sc.extxyz"
    write_xyz(src, s, traj=traj)
    _, out = convert_to_npy(str(src), str(tmp_path / "sc.npy"))
    sidecar = structure_sidecar_path(out)
    assert sidecar == out + ".structure.xyz"
    import os as _os
    assert _os.path.exists(sidecar)
    r = open_trajectory(out)
    assert r.structure is not None
    np.testing.assert_allclose(r.structure.cell, cell, atol=1e-6)
    np.testing.assert_array_equal(r.structure.species, s.species)
    # explicit structure= wins over the sidecar
    from sitator_tpu.io import NpyTrajectory
    r2 = NpyTrajectory(out, structure=None)
    assert r2.structure is not None
    # opt-out: no sidecar written
    _, out3 = convert_to_npy(str(src), str(tmp_path / "ns.npy"),
                             structure_sidecar=False)
    assert not _os.path.exists(structure_sidecar_path(out3))
    assert open_trajectory(out3).structure is None


def test_iread_lammps_dump_streaming(tmp_path):
    from sitator_tpu.io import convert_to_npy, iread_lammps_dump
    rng = np.random.default_rng(8)
    n = 4
    pos = rng.random((5, n, 3)) * 7.0
    f = tmp_path / "s.lammpstrj"
    with open(f, "w") as fh:
        for t in range(5):
            fh.write("ITEM: TIMESTEP\n%d\nITEM: NUMBER OF ATOMS\n%d\n"
                     % (t, n))
            fh.write("ITEM: BOX BOUNDS pp pp pp\n0 7\n0 7\n0 7\n")
            fh.write("ITEM: ATOMS id type x y z\n")
            for i in range(n):
                fh.write("%d 1 %.8f %.8f %.8f\n" % (i + 1, *pos[t, i]))
    got = [p for _, p in iread_lammps_dump(f)]
    np.testing.assert_allclose(np.stack(got), pos, atol=1e-6)
    st, out = convert_to_npy(str(f), str(tmp_path / "s.npy"))
    np.testing.assert_allclose(np.load(out), pos, atol=1e-6)


def test_ase_adapter_gated():
    """The ASE adapter imports without ase and raises a clear ImportError
    at call time (or works if ase happens to be installed)."""
    from sitator_tpu.io import ase_adapter
    try:
        import ase  # noqa: F401
        have_ase = True
    except ImportError:
        have_ase = False
    s = Structure(np.zeros((2, 3)), ["S", "Li"], np.eye(3) * 5.0)
    if not have_ase:
        with pytest.raises(ImportError, match="ASE is not installed"):
            ase_adapter.to_ase(s)
    else:  # pragma: no cover - env-dependent
        atoms = ase_adapter.to_ase(s)
        s2 = ase_adapter.from_ase(atoms)
        np.testing.assert_allclose(s2.positions, s.positions)
        np.testing.assert_array_equal(s2.species, s.species)


def test_lammps_group_dump_non_contiguous_ids(tmp_path):
    """A group dump keeps global atom ids (e.g. 9262..10000); the native
    decoder's precheck must reject it cheaply so open_trajectory falls
    back to the Python parser — which reads it fine (regression)."""
    from sitator_tpu.io import open_trajectory
    from sitator_tpu.io.formats import LammpsDumpTrajectory
    rng = np.random.default_rng(9)
    n = 5
    ids = np.array([101, 103, 105, 107, 109])  # non-contiguous
    pos = rng.random((3, n, 3)) * 8.0
    f = tmp_path / "group.lammpstrj"
    with open(f, "w") as fh:
        for t in range(3):
            fh.write("ITEM: TIMESTEP\n%d\nITEM: NUMBER OF ATOMS\n%d\n"
                     % (t, n))
            fh.write("ITEM: BOX BOUNDS pp pp pp\n0 8\n0 8\n0 8\n")
            fh.write("ITEM: ATOMS id type x y z\n")
            for i in range(n):
                fh.write("%d 1 %.8f %.8f %.8f\n" % (ids[i], *pos[t, i]))
    r = open_trajectory(f)
    assert isinstance(r, LammpsDumpTrajectory)  # fell back, didn't crash
    np.testing.assert_allclose(r[0:3], pos, atol=1e-6)
    # and no stale native index sidecar was written by the precheck
    import os
    assert not os.path.exists(str(f) + ".flmpidx.npz")


def test_native_decoders_reject_nan(tmp_path):
    """nan coordinates error loudly in the native decoders instead of
    silently becoming 0.0."""
    try:
        from sitator_tpu.io.native import (FastLammpsTrajectory,
                                           FastXYZTrajectory, get_lib)
    except Exception:
        pytest.skip("native lib unavailable")
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    f = tmp_path / "bad.lammpstrj"
    with open(f, "w") as fh:
        fh.write("ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n2\n")
        fh.write("ITEM: BOX BOUNDS pp pp pp\n0 8\n0 8\n0 8\n")
        fh.write("ITEM: ATOMS id type x y z\n")
        fh.write("1 1 1.0 2.0 3.0\n2 1 nan nan nan\n")
    r = FastLammpsTrajectory(f, cache_index=False)
    with pytest.raises(IOError):
        r[0:1]
    g = tmp_path / "bad.extxyz"
    with open(g, "w") as fh:
        fh.write('2\nLattice="8 0 0 0 8 0 0 0 8"\n')
        fh.write("S 1.0 2.0 3.0\nS nan nan nan\n")
    r2 = FastXYZTrajectory(g, cache_index=False)
    with pytest.raises(IOError):
        r2[0:1]


def test_xdatcar_variable_cell_d_comment(tmp_path):
    """A variable-cell XDATCAR whose comment starts with 'D' must NOT be
    mis-indexed by the native decoder: open_trajectory falls back to the
    Python reader, which raises the clear variable-cell error."""
    rng = np.random.default_rng(11)
    n = 3
    f = tmp_path / "XDATCAR"

    def header(fh):
        fh.write("Diamond-like\n1.0\n")
        for row in np.eye(3) * 7.0:
            fh.write("%.6f %.6f %.6f\n" % tuple(row))
        fh.write("C\n%d\n" % n)

    with open(f, "w") as fh:
        for t in range(3):
            header(fh)  # repeated header every frame = variable cell
            fh.write("Direct configuration= %d\n" % (t + 1))
            for i in range(n):
                fh.write("%.6f %.6f %.6f\n" % tuple(rng.random(3)))
    from sitator_tpu.io import open_trajectory
    with pytest.raises(ValueError, match="variable-cell"):
        open_trajectory(f)


def test_xdatcar_vasp4_header(tmp_path):
    """VASP4-style XDATCAR (no symbols line) parses in both readers."""
    rng = np.random.default_rng(12)
    frac = rng.random((2, 4, 3))
    f = tmp_path / "old.xdatcar"
    with open(f, "w") as fh:
        fh.write("old style\n1.0\n")
        for row in np.eye(3) * 6.0:
            fh.write("%.6f %.6f %.6f\n" % tuple(row))
        fh.write("3 1\n")  # counts only
        for t in range(2):
            fh.write("Direct configuration= %d\n" % (t + 1))
            for i in range(4):
                fh.write("%.8f %.8f %.8f\n" % tuple(frac[t, i]))
    from sitator_tpu.io import open_trajectory
    r = open_trajectory(f)
    assert len(r) == 2 and r.n_atoms == 4
    np.testing.assert_allclose(r[0:2], frac * 6.0, atol=2e-4)
    np.testing.assert_array_equal(r.structure.species, [1, 1, 1, 2])
    # empty slice at the end never touches the native offsets buffer
    assert r[2:2].shape == (0, 4, 3)


def test_extxyz_properties_column_layout(tmp_path):
    """Properties= declarations with non-standard column order (pos
    before species, extra per-atom columns) parse correctly; the native
    decoder falls back for them and open_trajectory still works."""
    from sitator_tpu.io import open_trajectory
    from sitator_tpu.io.formats import read_xyz
    rng = np.random.default_rng(21)
    pos = rng.random((2, 3, 3)) * 6.0
    f = tmp_path / "odd.extxyz"
    with open(f, "w") as fh:
        for t in range(2):
            fh.write("3\n")
            fh.write('Lattice="6 0 0 0 6 0 0 0 6" '
                     'Properties=pos:R:3:forces:R:3:species:S:1\n')
            for i in range(3):
                fh.write("%.8f %.8f %.8f 0.1 0.2 0.3 %s\n"
                         % (*pos[t, i], ["S", "S", "Li"][i]))
    s, traj = read_xyz(f, index="all")
    np.testing.assert_allclose(traj, pos, atol=1e-7)
    np.testing.assert_array_equal(s.species, [16, 16, 3])
    r = open_trajectory(f)          # native precheck -> Python fallback
    np.testing.assert_allclose(r[0:2], pos, atol=1e-5)
    np.testing.assert_array_equal(r.structure.species, [16, 16, 3])


def test_extxyz_trailing_columns_native_ok(tmp_path):
    """Standard species-first layout WITH trailing force columns stays on
    the native decoder (it skips to end-of-line after pos)."""
    from sitator_tpu.io import open_trajectory
    rng = np.random.default_rng(22)
    pos = rng.random((2, 3, 3)) * 6.0
    f = tmp_path / "forces.extxyz"
    with open(f, "w") as fh:
        for t in range(2):
            fh.write("3\n")
            fh.write('Lattice="6 0 0 0 6 0 0 0 6" '
                     'Properties=species:S:1:pos:R:3:forces:R:3\n')
            for i in range(3):
                fh.write("Li %.8f %.8f %.8f 0.1 0.2 0.3\n" % tuple(pos[t, i]))
    r = open_trajectory(f)
    np.testing.assert_allclose(r[0:2], pos, atol=1e-5)


def test_xdatcar_negative_scale_is_volume(tmp_path):
    """VASP convention: a negative universal scale is the target cell
    VOLUME."""
    from sitator_tpu.io.formats import read_xdatcar
    f = tmp_path / "XDATCAR"
    with open(f, "w") as fh:
        fh.write("vol-scaled\n-1000.0\n")     # want volume 1000
        for row in np.eye(3) * 2.0:           # raw volume 8
            fh.write("%.6f %.6f %.6f\n" % tuple(row))
        fh.write("Li\n2\n")
        fh.write("Direct configuration= 1\n")
        fh.write("0.25 0.25 0.25\n0.5 0.5 0.5\n")
    s, traj = read_xdatcar(f)
    np.testing.assert_allclose(np.abs(np.linalg.det(s.cell)), 1000.0,
                               rtol=1e-10)
    np.testing.assert_allclose(s.cell, np.eye(3) * 10.0, atol=1e-9)
    np.testing.assert_allclose(traj[0, 1], [5.0, 5.0, 5.0], atol=1e-9)


def test_lammps_element_column(tmp_path):
    """`dump custom ... element` symbols become species numbers."""
    from sitator_tpu.io.formats import read_lammps_dump
    f = tmp_path / "el.lammpstrj"
    with open(f, "w") as fh:
        fh.write("ITEM: TIMESTEP\n0\n")
        fh.write("ITEM: NUMBER OF ATOMS\n3\n")
        fh.write("ITEM: BOX BOUNDS pp pp pp\n")
        for _ in range(3):
            fh.write("0.0 8.0\n")
        fh.write("ITEM: ATOMS id type element x y z\n")
        fh.write("1 1 S 1.0 1.0 1.0\n")
        fh.write("2 1 S 2.0 2.0 2.0\n")
        fh.write("3 2 Li 3.0 3.0 3.0\n")
    s, traj = read_lammps_dump(f)
    np.testing.assert_array_equal(s.species, [16, 16, 3])


def test_content_sniffing_unconventional_names(tmp_path, rng):
    """Files with arbitrary names open via content sniffing."""
    from sitator_tpu.io import open_trajectory, write_xdatcar, write_xyz
    from sitator_tpu.core.structure import Structure
    cell = np.diag([6.0, 6.0, 6.0])
    pos = rng.random((2, 3, 3)) * 6.0
    s = Structure(pos[0], np.array([3, 3, 3]), cell)

    write_xdatcar(tmp_path / "run_output.txt", s, pos)
    r = open_trajectory(tmp_path / "run_output.txt")
    np.testing.assert_allclose(r[0:2], pos, atol=1e-5)

    write_xyz(tmp_path / "snapshot.dat", s, pos)
    r2 = open_trajectory(tmp_path / "snapshot.dat")
    np.testing.assert_allclose(r2[0:2], pos, atol=1e-5)

    # lammps content under a bland name
    f = tmp_path / "dumpfile"
    with open(f, "w") as fh:
        fh.write("ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n2\n")
        fh.write("ITEM: BOX BOUNDS pp pp pp\n0 6\n0 6\n0 6\n")
        fh.write("ITEM: ATOMS id type x y z\n1 1 1 1 1\n2 1 2 2 2\n")
    r3 = open_trajectory(f)
    assert len(r3) == 1

    # npy under a bland name
    np.save(tmp_path / "blob.bin.npy", pos)  # np.save appends .npy
    import os
    os.rename(tmp_path / "blob.bin.npy", tmp_path / "blob.bin")
    r4 = open_trajectory(tmp_path / "blob.bin")
    np.testing.assert_allclose(r4[0:2], pos, atol=1e-6)

    with pytest.raises(ValueError, match="unknown trajectory format"):
        (tmp_path / "garbage").write_text("not a trajectory\nat all\n")
        open_trajectory(tmp_path / "garbage")


def test_lammps_element_unknown_labels_fall_back_to_type(tmp_path):
    from sitator_tpu.io.formats import read_lammps_dump
    f = tmp_path / "odd_el.lammpstrj"
    with open(f, "w") as fh:
        fh.write("ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n2\n")
        fh.write("ITEM: BOX BOUNDS pp pp pp\n0 8\n0 8\n0 8\n")
        fh.write("ITEM: ATOMS id type element x y z\n")
        fh.write("1 5 Type1 1 1 1\n")      # unknown label -> type column
        fh.write("2 2 li 2 2 2\n")         # lowercase symbol -> Li
    s, _ = read_lammps_dump(f)
    np.testing.assert_array_equal(s.species, [5, 3])


def test_xyz_freetext_properties_comment_tolerated(tmp_path):
    """A free-text comment containing 'Properties=something' that is not
    a real declaration must not break the plain-xyz layout."""
    from sitator_tpu.io.formats import read_xyz
    f = tmp_path / "weird.xyz"
    f.write_text("2\nmy Properties=none run\n"
                 "C 1.0 2.0 3.0\nC 4.0 5.0 6.0\n")
    s, traj = read_xyz(f, index="all")
    np.testing.assert_allclose(traj[0], [[1, 2, 3], [4, 5, 6]], atol=1e-9)


def test_sniff_xdatcar_with_numeric_comment(tmp_path):
    """An oddly-named XDATCAR whose comment line is a bare number must
    sniff as xdatcar, not xyz."""
    from sitator_tpu.io import open_trajectory
    f = tmp_path / "run77.txt"
    with open(f, "w") as fh:
        fh.write("128\n1.0\n")             # numeric comment!
        for row in np.eye(3) * 6.0:
            fh.write("%.6f %.6f %.6f\n" % tuple(row))
        fh.write("Li\n2\n")
        fh.write("Direct configuration= 1\n0.1 0.1 0.1\n0.5 0.5 0.5\n")
    r = open_trajectory(f)
    assert len(r) == 1 and r.n_atoms == 2


def test_sniff_lammps_with_leading_time_item(tmp_path):
    """dump_modify time/units prepends ITEM: TIME / ITEM: UNITS blocks —
    the sniffer and the Python reader both cope."""
    from sitator_tpu.io import open_trajectory
    f = tmp_path / "timed_dump"
    with open(f, "w") as fh:
        fh.write("ITEM: UNITS\nmetal\nITEM: TIME\n0.5\n")
        fh.write("ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n2\n")
        fh.write("ITEM: BOX BOUNDS pp pp pp\n0 8\n0 8\n0 8\n")
        fh.write("ITEM: ATOMS id type x y z\n1 1 1 1 1\n2 1 2 2 2\n")
    r = open_trajectory(f)
    assert len(r) == 1


def test_native_rejects_mixed_properties_layouts(tmp_path, rng):
    """Concatenated extxyz with a mid-stream layout switch: the native
    decoder's sampled check raises and the Python parser (which honors
    per-frame declarations) reads it correctly via open_trajectory."""
    from sitator_tpu.io import open_trajectory
    pos = rng.random((2, 2, 3)) * 5.0
    f = tmp_path / "mixed.extxyz"
    with open(f, "w") as fh:
        fh.write("2\nLattice=\"5 0 0 0 5 0 0 0 5\" "
                 "Properties=species:S:1:pos:R:3\n")
        for p in pos[0]:
            fh.write("Li %.8f %.8f %.8f\n" % tuple(p))
        fh.write("2\nLattice=\"5 0 0 0 5 0 0 0 5\" "
                 "Properties=pos:R:3:species:S:1\n")
        for p in pos[1]:
            fh.write("%.8f %.8f %.8f Li\n" % tuple(p))
    r = open_trajectory(f)
    np.testing.assert_allclose(r[0:2], pos, atol=1e-5)


def test_npy_sidecar_staleness_guards(tmp_path):
    """Re-converting without a structure removes a stale sidecar, and a
    mismatched sidecar is ignored with a warning (review finding r4)."""
    import os
    from sitator_tpu.io import convert_to_npy, open_trajectory, write_xyz
    from sitator_tpu.io.formats import structure_sidecar_path
    rng = np.random.default_rng(2)
    s3 = Structure(rng.uniform(0, 5, (3, 3)), ["S"] * 3, np.eye(3) * 8.0)
    src = tmp_path / "a.extxyz"
    write_xyz(src, s3, traj=rng.uniform(0, 5, (4, 3, 3)))
    out = str(tmp_path / "t.npy")
    convert_to_npy(str(src), out)
    assert os.path.exists(structure_sidecar_path(out))
    # overwrite the npy with a DIFFERENT system (7 atoms) out-of-band
    np.save(out, rng.uniform(0, 5, (5, 7, 3)).astype(np.float32))
    r = open_trajectory(out)
    assert r.structure is None          # stale 3-atom sidecar ignored
    # re-converting from a structureless reader must remove the sidecar
    from sitator_tpu.io import ArrayTrajectory
    convert_to_npy(ArrayTrajectory(rng.uniform(0, 5, (5, 7, 3))), out)
    assert not os.path.exists(structure_sidecar_path(out))
    assert open_trajectory(out).structure is None


def test_plot_atoms_mask(rng, tmp_path):
    st = _make_annotated_st(rng)
    s = st.site_network.structure
    mask = np.zeros(s.n_atoms, bool)
    mask[:4] = True
    fig = plot_atoms(s, mask=mask)
    fig.savefig(tmp_path / "atoms_masked.png")
