"""Tensorstore-backed chunked trajectory store (SURVEY.md §3.9 item 5):
round-trip exactness, sidecar structure, ChunkedFeeder integration, and
the streaming engine running off a zarr store bitwise-equal to in-memory."""
import numpy as np
import pytest

pytest.importorskip("tensorstore")

from sitator_tpu import SiteNetwork
from sitator_tpu.io import (
    ArrayTrajectory,
    ChunkedFeeder,
    TensorstoreTrajectory,
    convert_to_zarr,
    open_trajectory,
)
from sitator_tpu.io.synthetic import make_hopping_trajectory
from sitator_tpu.landmark import StreamingLandmarkAnalysis
from sitator_tpu.voronoi import VoronoiSiteGenerator


@pytest.fixture(scope="module")
def md_system():
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=4, n_frames=700,
                                 jump_rate=0.03, seed=9)
    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    seeds = VoronoiSiteGenerator(merge_tol=0.05).run(sn0)
    return md, seeds


@pytest.mark.parametrize("zarr_format", [2, 3])
def test_zarr_roundtrip_exact(tmp_path, zarr_format):
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(101, 7, 3)).astype(np.float32)
    store = str(tmp_path / f"t{zarr_format}.zarr")
    _, out = convert_to_zarr(ArrayTrajectory(traj), store,
                             chunk_frames=16, zarr_format=zarr_format)
    r = TensorstoreTrajectory(out)
    assert len(r) == 101
    assert r.n_atoms == 7
    np.testing.assert_array_equal(r[0:101], traj)
    # non-chunk-aligned block reads
    np.testing.assert_array_equal(r[13:55], traj[13:55])
    np.testing.assert_array_equal(r[100:101], traj[100:101])


def test_zarr_sidecar_structure_and_sniffing(tmp_path, md_system):
    md, _ = md_system
    store = str(tmp_path / "md.zarr")
    s, _ = convert_to_zarr(ArrayTrajectory(md.traj, md.structure), store,
                           chunk_frames=64)
    assert s is md.structure
    # open_trajectory dispatches on the store DIRECTORY and restores the
    # sidecar structure (variable_cell is accepted-and-dropped as for npy)
    r = open_trajectory(store, variable_cell="rescale")
    assert isinstance(r, TensorstoreTrajectory)
    np.testing.assert_array_equal(r.structure.cell, md.structure.cell)
    np.testing.assert_array_equal(r.structure.species, md.structure.species)
    np.testing.assert_array_equal(r[0:700], md.traj.astype(np.float32))


def test_zarr_chunked_feeder(tmp_path):
    rng = np.random.default_rng(1)
    traj = rng.normal(size=(40, 5, 3)).astype(np.float32)
    _, store = convert_to_zarr(ArrayTrajectory(traj),
                               str(tmp_path / "f.zarr"), chunk_frames=8)
    r = TensorstoreTrajectory(store)
    got = list(ChunkedFeeder(r, block_frames=7))
    assert [lo for lo, _ in got] == list(range(0, 40, 7))
    np.testing.assert_array_equal(np.concatenate([b for _, b in got]), traj)


def test_streaming_off_zarr_matches_inmemory(tmp_path, md_system):
    """The exactness gate: StreamingLandmarkAnalysis off the tensorstore
    reader reproduces the in-memory run bitwise (same fitted centers)."""
    md, seeds = md_system
    _, store = convert_to_zarr(ArrayTrajectory(md.traj, md.structure),
                               str(tmp_path / "md.zarr"), chunk_frames=128)
    reader = TensorstoreTrajectory(store)

    sla = StreamingLandmarkAnalysis(cutoff_midpoint=4.0,
                                    cutoff_steepness=3.0,
                                    block_frames=96, verbose=False)
    centers = sla.fit_centers(seeds, ArrayTrajectory(md.traj))
    out_mem = sla.run(seeds, md.traj, centers=centers)

    sla2 = StreamingLandmarkAnalysis(cutoff_midpoint=4.0,
                                     cutoff_steepness=3.0,
                                     block_frames=96, verbose=False)
    out_ts = sla2.run(seeds, reader, centers=centers)

    np.testing.assert_array_equal(out_ts.n_ij, out_mem.n_ij)
    np.testing.assert_array_equal(out_ts.occupancies, out_mem.occupancies)
    np.testing.assert_allclose(out_ts.residence_times,
                               out_mem.residence_times, equal_nan=True)
    np.testing.assert_array_equal(out_ts.centers, out_mem.centers)


def test_zarr_rejects_bad_shape(tmp_path):
    import tensorstore as ts
    store = str(tmp_path / "bad.zarr")
    ts.open({"driver": "zarr",
             "kvstore": {"driver": "file", "path": store},
             "metadata": {"shape": [4, 5], "chunks": [4, 5],
                          "dtype": "<f4"},
             "create": True}).result()
    with pytest.raises(ValueError, match=r"\(F, A, 3\)"):
        TensorstoreTrajectory(store)


def test_convert_to_zarr_two_pass_text_matches_npy(tmp_path, rng):
    """Text sources with no native route (NPT rescale) stream through the
    two-pass O(1)-memory parse — byte-for-byte equal to convert_to_npy."""
    from sitator_tpu.io import convert_to_npy
    from tests.test_variable_cell import _breathing_cells, _write_npt_xdatcar

    base = np.array([[8.0, 0, 0], [0.5, 8.5, 0], [0, 0, 9.0]])
    cells = _breathing_cells(base, 37)
    frac = rng.random((37, 5, 3))
    f = tmp_path / "XDATCAR"
    _write_npt_xdatcar(f, cells, frac)

    s_npy, npy = convert_to_npy(f, str(tmp_path / "t.npy"),
                                variable_cell="rescale")
    s_z, store = convert_to_zarr(f, str(tmp_path / "t.zarr"),
                                 chunk_frames=8, variable_cell="rescale")
    r = TensorstoreTrajectory(store)
    np.testing.assert_array_equal(r[0:37], np.load(npy))
    np.testing.assert_allclose(s_z.cell, s_npy.cell)
    # the sidecar restored the structure
    assert r.structure is not None
    np.testing.assert_allclose(r.structure.cell, s_npy.cell)


def test_convert_to_zarr_plain_text_uses_reader(tmp_path):
    """Fixed-cell text goes through open_trajectory (native decoder when
    available) and still round-trips exactly."""
    from sitator_tpu.io import write_xdatcar
    from sitator_tpu.io.synthetic import make_hopping_trajectory

    md = make_hopping_trajectory(n_cells=2, n_ions=2, n_frames=23, seed=3)
    f = tmp_path / "XDATCAR"
    write_xdatcar(f, md.structure, md.traj)
    _, store = convert_to_zarr(str(f), str(tmp_path / "t.zarr"),
                               chunk_frames=7)
    r = TensorstoreTrajectory(store)
    np.testing.assert_allclose(r[0:23], md.traj, atol=1e-4)


def test_zarr_mesh_checkpoint_resume_integration(tmp_path, md_system):
    """Integration matrix: the streaming engine on an 8-device mesh,
    reading from a tensorstore zarr store, interrupted mid-run and resumed
    from its checkpoint — bit-exact vs the uninterrupted meshed run."""
    import os
    md, seeds = md_system
    from sitator_tpu.parallel.mesh import frame_mesh

    _, store = convert_to_zarr(ArrayTrajectory(md.traj[:256], md.structure),
                               str(tmp_path / "m.zarr"), chunk_frames=64)
    reader = TensorstoreTrajectory(store)
    mesh = frame_mesh(n_devices=8)

    kw = dict(cutoff_midpoint=4.0, cutoff_steepness=3.0, block_frames=64,
              mesh=mesh, use_fused=True, interpret=True, verbose=False)
    ref = StreamingLandmarkAnalysis(**kw)
    centers = ref.fit_centers(seeds, reader)
    out_ref = ref.run(seeds, reader, centers=centers)

    class Interrupt(Exception):
        pass

    class Flaky(TensorstoreTrajectory):
        served = 0
        die_after = 2

        def __getitem__(self, key):
            Flaky.served += 1
            if self.die_after is not None and Flaky.served > self.die_after:
                raise Interrupt()
            return super().__getitem__(key)

    ckpt = str(tmp_path / "m.ckpt")
    sla = StreamingLandmarkAnalysis(checkpoint_path=ckpt,
                                    checkpoint_every=1, **kw)
    flaky = Flaky(store)
    with pytest.raises(Interrupt):
        sla.run(seeds, flaky, centers=centers)
    assert os.path.exists(ckpt)
    Flaky.die_after = None
    out = sla.run(seeds, flaky, centers=centers)
    np.testing.assert_array_equal(out.n_ij, out_ref.n_ij)
    np.testing.assert_array_equal(out.occupancies, out_ref.occupancies)
    assert not os.path.exists(ckpt)


def test_convert_rejects_bad_zarr_format(tmp_path):
    import pytest

    from sitator_tpu.io.tensorstore_io import convert_to_zarr

    traj = np.zeros((4, 2, 3), np.float32)
    np.save(tmp_path / "t.npy", traj)
    for bad in (1, "3", None):
        with pytest.raises(ValueError, match="zarr_format"):
            convert_to_zarr(str(tmp_path / "t.npy"),
                            str(tmp_path / "out.zarr"), zarr_format=bad)


def test_driver_sniffing_dict_spec_and_validation(tmp_path, capsys):
    """_zarr_driver detection for all three layouts, the dict-spec ctor
    path, the zarr_format typo raise, the empty-source raise, and the
    verbose print (coverage audit)."""
    from sitator_tpu.io.tensorstore_io import _zarr_driver

    # driver detection is purely layout-based
    for marker, want in [("zarr.json", "zarr3"), (".zarray", "zarr"),
                         ("attributes.json", "n5")]:
        d = tmp_path / f"probe_{want}"
        d.mkdir()
        (d / marker).write_text("{}")
        assert _zarr_driver(str(d)) == want
    empty = tmp_path / "nothing"
    empty.mkdir()
    assert _zarr_driver(str(empty)) is None
    with pytest.raises(ValueError, match="not a zarr"):
        TensorstoreTrajectory(str(empty))

    # verbose conversion prints the summary line
    rng = np.random.default_rng(1)
    traj = rng.normal(size=(20, 3, 3)).astype(np.float32)
    store = str(tmp_path / "v.zarr")
    _, out = convert_to_zarr(ArrayTrajectory(traj), store,
                             chunk_frames=8, verbose=True)
    assert "wrote 20 frames" in capsys.readouterr().out

    # a raw tensorstore spec dict works as `path` (no sidecar lookup)
    spec = {"driver": _zarr_driver(out),
            "kvstore": {"driver": "file", "path": out}}
    r = TensorstoreTrajectory(spec)
    assert len(r) == 20 and r.structure is None
    np.testing.assert_array_equal(r[3:9], traj[3:9])

    # zarr_format typos fail loudly before any IO
    with pytest.raises(ValueError, match="zarr_format must be 2 or 3"):
        convert_to_zarr(ArrayTrajectory(traj), str(tmp_path / "x.zarr"),
                        zarr_format="3")
