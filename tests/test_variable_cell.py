"""Variable-cell (NPT) trajectory support.

The reference assumes one cell per analysis (SURVEY.md §3.1/§3.7 — its
PBCCalculator is constructed once per run); NPT trajectories carry a cell
per frame.  sitator_tpu bridges them with an affine fractional-preserving
map into the first frame's cell (``ops.pbc.rescale_to_cell``), exposed as
``variable_cell='rescale'`` on every text reader.  These tests pin:

- the rescale math (fractional coordinates preserved exactly, identity for
  constant cells, no wrapping of unwrapped coordinates);
- XDATCAR repeated-header parsing, LAMMPS per-frame box bounds (cartesian
  AND scaled columns), and per-frame extxyz ``Lattice=`` entries;
- that ions pinned to fixed fractional coordinates in a breathing cell
  become stationary after rescaling — the invariant that makes landmark
  analysis on NPT runs meaningful;
- the default 'error' policy raising everywhere, and convert_to_npy baking
  the bridge into the streamed .npy.
"""
import numpy as np
import pytest

from sitator_tpu.ops.pbc import rescale_to_cell


def _breathing_cells(base, n, amp=0.05, seed=0):
    """n cells: base scaled by per-frame factors plus a little shear."""
    rng = np.random.default_rng(seed)
    cells = np.empty((n, 3, 3))
    for t in range(n):
        s = 1.0 + amp * np.sin(0.7 * t + 0.3)
        shear = np.eye(3)
        shear[1, 0] = 0.02 * np.cos(1.1 * t)
        cells[t] = shear @ (base * s)
    # tiny anisotropy so no two frames share a cell
    cells += rng.normal(scale=1e-4, size=cells.shape)
    return cells


# ------------------------------------------------------------- the math --
def test_rescale_identity_for_constant_cell(rng):
    cell = np.array([[8.0, 0, 0], [0.5, 8.5, 0], [0, 0, 9.0]])
    pos = rng.random((5, 7, 3)) @ cell
    out = rescale_to_cell(pos, cell, cell)
    np.testing.assert_allclose(out, pos, atol=1e-12)


def test_rescale_preserves_fractional_coords(rng):
    base = np.array([[8.0, 0, 0], [0.5, 8.5, 0], [0, 0, 9.0]])
    cells = _breathing_cells(base, 6)
    frac = rng.random((6, 4, 3))
    pos = np.einsum("fai,fij->faj", frac, cells)
    ref = cells[0]
    out = rescale_to_cell(pos, cells, ref)
    np.testing.assert_allclose(out, frac @ ref, atol=1e-9)


def test_rescale_no_wrapping():
    """Unwrapped (out-of-cell) coordinates stay continuous: fractional 1.75
    maps to 1.75 in the reference cell, not 0.75."""
    cell_a = np.eye(3) * 10.0
    cell_b = np.eye(3) * 12.0
    pos = np.array([[17.5, -3.0, 5.0]])  # frac (1.75, -0.3, 0.5) of cell_a
    out = rescale_to_cell(pos, cell_a, cell_b)
    np.testing.assert_allclose(out, [[21.0, -3.6, 6.0]], atol=1e-12)


def test_rescale_origins_single_frame():
    """(A, 3) positions with a single (3,) origin must not crash."""
    out = rescale_to_cell(np.array([[6.0, 6.0, 6.0]]), np.eye(3) * 10.0,
                          np.eye(3) * 20.0, origins=np.array([1.0, 1.0, 1.0]),
                          ref_origin=np.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(out, [[11.0, 11.0, 11.0]], atol=1e-12)


def test_rescale_origins():
    cell = np.eye(3)[None] * np.array([10.0, 12.0])[:, None, None]
    pos = np.array([[[6.0, 6.0, 6.0]], [[7.0, 7.0, 7.0]]])
    origins = np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    out = rescale_to_cell(pos, cell, cell[0], origins=origins,
                          ref_origin=origins[0])
    # frame 1: frac (0.5,..) of the 12-box -> 0.5*10 + 1 = 6
    np.testing.assert_allclose(out[0], [[6.0, 6.0, 6.0]], atol=1e-12)
    np.testing.assert_allclose(out[1], [[6.0, 6.0, 6.0]], atol=1e-12)


# -------------------------------------------------------------- XDATCAR --
def _write_npt_xdatcar(path, cells, frac, symbols=("S", "Li"),
                       counts=(3, 2)):
    with open(path, "w") as fh:
        for t in range(len(frac)):
            fh.write("npt run\n  1.0\n")
            for row in cells[t]:
                fh.write("  %.10f %.10f %.10f\n" % tuple(row))
            fh.write("  " + " ".join(symbols) + "\n")
            fh.write("  " + " ".join(str(c) for c in counts) + "\n")
            fh.write(f"Direct configuration=  {t + 1}\n")
            for i in range(frac.shape[1]):
                fh.write("  %.10f %.10f %.10f\n" % tuple(frac[t, i]))


def test_xdatcar_npt_rescale(tmp_path, rng):
    from sitator_tpu.io import open_trajectory, read_xdatcar
    base = np.array([[8.0, 0, 0], [0.5, 8.5, 0], [0, 0, 9.0]])
    cells = _breathing_cells(base, 5)
    frac0 = rng.random((5, 3))
    frac = np.broadcast_to(frac0, (5, 5, 3))  # pinned fractional coords
    f = tmp_path / "XDATCAR"
    _write_npt_xdatcar(f, cells, frac)

    with pytest.raises(ValueError, match="variable-cell"):
        read_xdatcar(f)
    with pytest.raises(ValueError, match="variable-cell"):
        open_trajectory(f)

    s, traj = read_xdatcar(f, variable_cell="rescale")
    np.testing.assert_allclose(s.cell, cells[0], atol=1e-9)
    # pinned fractional coords => stationary cartesian coords
    for t in range(5):
        np.testing.assert_allclose(traj[t], frac0 @ cells[0], atol=1e-8)
    assert list(s.species[:3]) == [16] * 3 and list(s.species[3:]) == [3] * 2

    r = open_trajectory(f, variable_cell="rescale")
    np.testing.assert_allclose(r[0:5], traj, atol=1e-6)


def test_xdatcar_npt_changed_counts_raises(tmp_path, rng):
    from sitator_tpu.io import read_xdatcar
    base = np.eye(3) * 7.0
    f = tmp_path / "XDATCAR"
    with open(f, "w") as fh:
        for t, counts in enumerate([(2, 1), (1, 2)]):
            fh.write("bad\n1.0\n")
            for row in base * (1 + 0.1 * t):
                fh.write("%.6f %.6f %.6f\n" % tuple(row))
            fh.write("S Li\n" + " ".join(map(str, counts)) + "\n")
            fh.write("Direct configuration= %d\n" % (t + 1))
            for _ in range(3):
                fh.write("%.6f %.6f %.6f\n" % tuple(rng.random(3)))
    with pytest.raises(ValueError, match="atom counts changed"):
        read_xdatcar(f, variable_cell="rescale")


def test_xdatcar_bad_policy(tmp_path):
    from sitator_tpu.io import read_xdatcar
    with pytest.raises(ValueError, match="variable_cell must be"):
        read_xdatcar("nonexistent", variable_cell="ignore")


# ---------------------------------------------------------------- LAMMPS --
def _write_npt_lammps(path, boxes, pos_or_frac, types, scaled=False):
    """boxes: (F, 3, 2) lo/hi per axis (orthogonal)."""
    cols = "xs ys zs" if scaled else "x y z"
    with open(path, "w") as fh:
        for t in range(len(pos_or_frac)):
            n = pos_or_frac.shape[1]
            fh.write("ITEM: TIMESTEP\n%d\n" % (t * 100))
            fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
            fh.write("ITEM: BOX BOUNDS pp pp pp\n")
            for ax in range(3):
                fh.write("%.8f %.8f\n" % tuple(boxes[t, ax]))
            fh.write(f"ITEM: ATOMS id type {cols}\n")
            for i in range(n):
                fh.write("%d %d %.10f %.10f %.10f\n"
                         % (i + 1, types[i], *pos_or_frac[t, i]))


def test_lammps_npt_rescale_cartesian(tmp_path, rng):
    from sitator_tpu.io import open_trajectory, read_lammps_dump
    n, F = 4, 5
    frac0 = rng.random((n, 3))
    types = np.array([1, 1, 2, 2])
    L = 10.0 + np.sin(np.arange(F))[:, None] * np.array([0.5, 0.8, 0.3])
    lo = np.full((F, 3), -2.0)
    boxes = np.stack([lo, lo + L], axis=-1)  # (F, 3, 2)
    pos = frac0[None] * L[:, None, :] + lo[:, None, :]
    f = tmp_path / "npt.lammpstrj"
    _write_npt_lammps(f, boxes, pos, types)

    with pytest.raises(ValueError, match="variable-cell"):
        read_lammps_dump(f)
    # the native decoder's sampled box-bounds check must catch it too
    with pytest.raises(ValueError, match="variable-cell"):
        open_trajectory(f)

    s, traj = read_lammps_dump(f, variable_cell="rescale")
    np.testing.assert_allclose(s.cell, np.diag(L[0]), atol=1e-8)
    for t in range(F):
        np.testing.assert_allclose(traj[t], pos[0], atol=1e-8)

    r = open_trajectory(f, variable_cell="rescale")
    np.testing.assert_allclose(r[0:F], traj, atol=1e-5)


def test_lammps_npt_rescale_scaled(tmp_path, rng):
    from sitator_tpu.io import read_lammps_dump
    n, F = 3, 4
    frac = np.broadcast_to(rng.random((n, 3)), (F, n, 3))
    types = np.ones(n, dtype=int)
    L = 8.0 + np.cos(np.arange(F))[:, None] * np.array([0.4, 0.2, 0.6])
    boxes = np.stack([np.zeros((F, 3)), L], axis=-1)
    f = tmp_path / "npt_scaled.lammpstrj"
    _write_npt_lammps(f, boxes, frac, types, scaled=True)
    s, traj = read_lammps_dump(f, variable_cell="rescale")
    for t in range(F):
        np.testing.assert_allclose(traj[t], frac[0] @ np.diag(L[0]),
                                   atol=1e-8)


# ----------------------------------------------------------------- extxyz --
def test_xyz_per_frame_lattice(tmp_path, rng):
    from sitator_tpu.io import open_trajectory, read_xyz
    F, n = 4, 3
    base = np.array([[7.0, 0, 0], [0.3, 7.5, 0], [0, 0, 8.0]])
    cells = _breathing_cells(base, F)
    frac0 = rng.random((n, 3))
    f = tmp_path / "npt.extxyz"
    with open(f, "w") as fh:
        for t in range(F):
            cellstr = " ".join(f"{x:.10g}" for x in cells[t].ravel())
            fh.write(f"{n}\n")
            fh.write(f'Lattice="{cellstr}" Properties=species:S:1:pos:R:3\n')
            for p in frac0 @ cells[t]:
                fh.write("Li %.10f %.10f %.10f\n" % tuple(p))

    with pytest.raises(ValueError, match="variable-cell"):
        read_xyz(f, index="all")
    # open_trajectory's native decoder detects the varying Lattice= on
    # its frame sample and falls back to the Python reader's full-scan
    # error
    with pytest.raises(ValueError, match="variable-cell"):
        open_trajectory(f)

    s, traj = read_xyz(f, index="all", variable_cell="rescale")
    np.testing.assert_allclose(s.cell, cells[0], atol=1e-9)
    for t in range(F):
        np.testing.assert_allclose(traj[t], frac0 @ cells[0], atol=1e-7)

    r = open_trajectory(f, variable_cell="rescale")
    np.testing.assert_allclose(r[0:F], traj, atol=1e-5)


def test_xyz_cellless_frames_share_bounding_box(tmp_path, rng):
    """Plain xyz (no Lattice=): all frames share one synthetic bounding
    box, so fixed-cell readers don't false-positive on variable cells."""
    from sitator_tpu.io import read_xyz
    from sitator_tpu.io.formats import iread_xyz
    f = tmp_path / "plain.xyz"
    pos = rng.random((3, 4, 3)) * 5.0
    with open(f, "w") as fh:
        for t in range(3):
            fh.write("4\nplain frame\n")
            for p in pos[t]:
                fh.write("C %.8f %.8f %.8f\n" % tuple(p))
    cells = [s.cell for s in iread_xyz(f)]
    for c in cells[1:]:
        np.testing.assert_array_equal(c, cells[0])
    s, traj = read_xyz(f, index="all")  # 'error' policy: must not raise
    np.testing.assert_allclose(traj, pos, atol=1e-7)


# ---------------------------------------------------------- convert + e2e --
def test_convert_to_npy_variable_cell(tmp_path, rng):
    from sitator_tpu.io import convert_to_npy, read_xdatcar
    base = np.eye(3) * 9.0
    cells = _breathing_cells(base, 4)
    frac = rng.random((4, 5, 3))
    f = tmp_path / "XDATCAR"
    _write_npt_xdatcar(f, cells, frac)

    with pytest.raises(ValueError, match="variable-cell"):
        convert_to_npy(f, tmp_path / "out.npy")

    s, out = convert_to_npy(f, tmp_path / "out.npy",
                            variable_cell="rescale")
    arr = np.load(out, mmap_mode="r")
    _, traj = read_xdatcar(f, variable_cell="rescale")
    np.testing.assert_allclose(arr, traj, atol=1e-5)
    np.testing.assert_allclose(s.cell, cells[0], atol=1e-9)


def test_landmark_analysis_on_rescaled_npt(tmp_path):
    """End-to-end: a breathing-cell (NPT-like) run whose geometry follows
    the cell affinely yields the same site analysis as the equivalent
    fixed-cell run after the rescale bridge."""
    from sitator_tpu import SiteNetwork
    from sitator_tpu.io import read_xdatcar
    from sitator_tpu.io.synthetic import make_hopping_trajectory
    from sitator_tpu.landmark import LandmarkAnalysis
    from sitator_tpu.voronoi import VoronoiSiteGenerator

    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=4, n_frames=200,
                                 jump_rate=0.02, sigma_mobile=0.25,
                                 sigma_static=0.04, seed=7)
    cell0 = md.structure.cell
    F = md.traj.shape[0]
    # modulate the cell; positions follow affinely (fractional pinned).
    # Frame 0 keeps the original cell so the rescale target IS cell0 and
    # the bridged trajectory must reproduce md.traj exactly.
    cells = _breathing_cells(cell0, F, amp=0.03, seed=8)
    cells[0] = cell0
    frac = md.traj @ np.linalg.inv(cell0)
    f = tmp_path / "XDATCAR"
    # synthetic layout: all static atoms first, then mobile ions
    n_static = int(md.static_mask.sum())
    n_mobile = int(md.mobile_mask.sum())
    _write_npt_xdatcar(f, cells, frac, symbols=("S", "Li"),
                       counts=(n_static, n_mobile))
    s2, traj2 = read_xdatcar(f, variable_cell="rescale")
    np.testing.assert_allclose(traj2, md.traj, atol=1e-5)

    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    seeds = VoronoiSiteGenerator(merge_tol=0.05).run(sn0)
    la_a = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                            minimum_site_occupancy=0.01)
    la_b = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                            minimum_site_occupancy=0.01)
    st_a = la_a.run(seeds, md.traj.astype(np.float32))
    st_b = la_b.run(seeds, traj2.astype(np.float32))
    assert st_a.site_network.n_sites == st_b.site_network.n_sites
    # the text round-trip perturbs positions by ~1e-6; allow rare
    # borderline-assignment flips but require essential identity
    agree = np.mean(st_a.traj == st_b.traj)
    assert agree > 0.99, agree


def test_streaming_on_npt_bridge(tmp_path):
    """NPT file -> convert_to_npy(variable_cell='rescale') -> streaming
    engine: the bridge feeds the out-of-core path and reproduces the
    fixed-cell streaming run exactly (positions differ only by the text
    round-trip)."""
    from sitator_tpu import SiteNetwork
    from sitator_tpu.io import convert_to_npy, make_hopping_trajectory
    from sitator_tpu.io.formats import NpyTrajectory
    from sitator_tpu.landmark import StreamingLandmarkAnalysis
    from sitator_tpu.voronoi import VoronoiSiteGenerator

    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=4, n_frames=300,
                                 jump_rate=0.03, seed=13)
    cell0 = md.structure.cell
    F = md.traj.shape[0]
    cells = _breathing_cells(cell0, F, amp=0.02, seed=14)
    cells[0] = cell0
    frac = md.traj @ np.linalg.inv(cell0)
    f = tmp_path / "XDATCAR"
    ns, nm = int(md.static_mask.sum()), int(md.mobile_mask.sum())
    _write_npt_xdatcar(f, cells, frac, symbols=("S", "Li"),
                       counts=(ns, nm))
    _, npy = convert_to_npy(f, tmp_path / "bridged.npy",
                            variable_cell="rescale")

    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    seeds = VoronoiSiteGenerator(merge_tol=0.05).run(sn0)

    def stream(reader):
        sla = StreamingLandmarkAnalysis(
            cutoff_midpoint=4.0, cutoff_steepness=3.0, block_frames=64,
            fit_frames=300, verbose=False)
        return sla.run(seeds, reader)

    out_npt = stream(NpyTrajectory(npy))
    out_fix = stream(md.traj.astype(np.float32))
    assert out_npt.n_sites == out_fix.n_sites
    np.testing.assert_array_equal(np.asarray(out_npt.n_ij),
                                  np.asarray(out_fix.n_ij))


def test_xdatcar_npt_truncated_header(tmp_path, rng):
    """A file truncated mid-repeated-header must raise cleanly, not parse
    garbage coordinates."""
    from sitator_tpu.io import read_xdatcar
    base = np.eye(3) * 7.0
    f = tmp_path / "XDATCAR"
    with open(f, "w") as fh:
        fh.write("run\n1.0\n")
        for row in base:
            fh.write("%.6f %.6f %.6f\n" % tuple(row))
        fh.write("S Li\n2 1\n")
        fh.write("Direct configuration= 1\n")
        for _ in range(3):
            fh.write("%.6f %.6f %.6f\n" % tuple(rng.random(3)))
        fh.write("run\n1.0\n")
        fh.write("%.6f %.6f %.6f\n" % tuple(base[0]))   # truncated here
    with pytest.raises((ValueError, IndexError)):
        read_xdatcar(f, variable_cell="rescale")


def test_xdatcar_npt_trailing_header_no_frame(tmp_path, rng):
    """A repeated header with no following frame (job killed mid-dump)
    yields the complete frames and stops."""
    from sitator_tpu.io import read_xdatcar
    base = np.eye(3) * 7.0

    def header(fh, scale):
        fh.write("run\n1.0\n")
        for row in base * scale:
            fh.write("%.6f %.6f %.6f\n" % tuple(row))
        fh.write("S Li\n2 1\n")

    f = tmp_path / "XDATCAR"
    with open(f, "w") as fh:
        header(fh, 1.0)
        fh.write("Direct configuration= 1\n")
        for _ in range(3):
            fh.write("%.6f %.6f %.6f\n" % tuple(rng.random(3)))
        header(fh, 1.01)    # header of a frame that never arrived
    s, traj = read_xdatcar(f, variable_cell="rescale")
    assert traj.shape == (1, 3, 3)


def test_lammps_npt_blank_lines_between_frames(tmp_path, rng):
    """Stray blank lines between NPT frames don't derail the parser."""
    from sitator_tpu.io import read_lammps_dump
    n = 2
    f = tmp_path / "npt.lammpstrj"
    with open(f, "w") as fh:
        for t in range(3):
            fh.write("ITEM: TIMESTEP\n%d\n" % t)
            fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
            fh.write("ITEM: BOX BOUNDS pp pp pp\n")
            for ax in range(3):
                fh.write("0.0 %.6f\n" % (8.0 + 0.1 * t))
            fh.write("ITEM: ATOMS id type x y z\n")
            for i in range(n):
                fh.write("%d 1 %.6f %.6f %.6f\n"
                         % (i + 1, *(rng.random(3) * 8)))
            fh.write("\n\n")
    s, traj = read_lammps_dump(f, variable_cell="rescale")
    assert traj.shape == (3, 2, 3)
