"""Core data-model edge contracts the round-5 line-coverage audit found
untested: constructor/attribute validation raises, indexing/protocol
methods (``__len__``/``__getitem__``/``__repr__``/``copy``), format-
version guards on ``save``/``load``, and the pre-run property raises on
``LandmarkAnalysis``."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork, SiteTrajectory
from sitator_tpu.core.structure import Structure
from sitator_tpu.landmark import LandmarkAnalysis


@pytest.fixture()
def sn():
    pos = np.array([[1.0, 1, 1], [3, 1, 1], [1, 3, 1], [1, 1, 3],
                    [2, 2, 2], [3, 3, 3.0]])
    s = Structure(pos, [16, 16, 16, 16, 3, 3], np.eye(3) * 6.0)
    static = np.array([1, 1, 1, 1, 0, 0], bool)
    net = SiteNetwork(s, static, ~static)
    net.centers = np.array([[1.5, 1.5, 1.5], [3.0, 3.0, 3.0]])
    net.vertices = [[0, 1, 2], [1, 2, 3]]
    return net


# ------------------------------------------------------- SiteNetwork

def test_sitenet_mask_shape_validation(sn):
    with pytest.raises(ValueError, match="masks must be"):
        SiteNetwork(sn.structure, np.ones(3, bool), np.zeros(3, bool))


def test_sitenet_setter_validation(sn):
    with pytest.raises(ValueError, match="centers must be"):
        sn.centers = np.zeros((2, 2))
    with pytest.raises(ValueError, match="one entry per site"):
        sn.vertices = [[0, 1]]
    with pytest.raises(ValueError, match="site_types must be"):
        sn.site_types = np.zeros(5, int)


def test_sitenet_len_and_getitem_int(sn):
    assert len(sn) == 2
    sub = sn[1]
    assert sub.n_sites == 1
    np.testing.assert_allclose(sub.centers[0], [3.0, 3.0, 3.0])


def test_sitenet_padded_vertices_validation(sn):
    with pytest.raises(ValueError, match="pad_to=2 < max vertex count"):
        sn.padded_vertices(pad_to=2)
    v, m = sn.padded_vertices(pad_to=5)
    assert v.shape == (2, 5) and m.shape == (2, 5)
    assert m.sum() == 6
    bare = SiteNetwork(sn.structure, sn.static_mask, sn.mobile_mask)
    with pytest.raises(ValueError, match="no vertices"):
        bare.padded_vertices()
    # a vertex pointing at a mobile atom is a hard error
    sn.vertices = [[0, 1], [4]]          # atom 4 is mobile
    with pytest.raises(ValueError, match="non-static vertex"):
        sn.padded_vertices()


def test_sitenet_edge_attr_shape_validation(sn):
    with pytest.raises(ValueError, match="leading dims"):
        sn.add_edge_attribute("n_ij", np.zeros((2, 3)))


def test_sitenet_getattr_raises_for_unknown(sn):
    with pytest.raises(AttributeError, match="does_not_exist"):
        sn.does_not_exist


def test_sitenet_of_type_and_types(sn):
    with pytest.raises(ValueError, match="no site_types"):
        sn.of_type(0)
    assert sn.types.size == 0 and sn.n_types == 0
    sn.site_types = np.array([7, 9])
    sub = sn.of_type(9)
    assert sub.n_sites == 1
    np.testing.assert_array_equal(sn.types, [7, 9])


def test_sitenet_copy_is_deep(sn):
    sn.add_site_attribute("occupancies", np.array([0.5, 0.25]))
    cp = sn.copy()
    cp.centers[0, 0] = 99.0
    cp.occupancies[0] = 99.0
    assert sn.centers[0, 0] == 1.5
    assert sn.occupancies[0] == 0.5
    assert "n_sites=2" in repr(sn)


def test_sitenet_load_rejects_future_version(sn, tmp_path):
    p = tmp_path / "net.npz"
    sn.save(str(p))
    with np.load(str(p), allow_pickle=True) as d:
        data = dict(d)
    data["__sitenet_version__"] = np.int64(9999)
    np.savez(str(p), **data)
    with pytest.raises(ValueError, match="unsupported SiteNetwork format"):
        SiteNetwork.load(str(p))


# ---------------------------------------------------- SiteTrajectory

def test_sitetraj_ctor_validation(sn):
    with pytest.raises(ValueError, match="must be .n_frames, n_mobile."):
        SiteTrajectory(sn, np.zeros(5, int))
    with pytest.raises(ValueError, match="confidences must match"):
        SiteTrajectory(sn, np.zeros((4, 2), int),
                       confidences=np.zeros((4, 3)))
    with pytest.raises(ValueError, match="n_mobile"):
        SiteTrajectory(sn, np.zeros((4, 3), int))


def test_sitetraj_protocol_and_slicing(sn):
    labels = np.array([[0, 1], [1, 1], [0, -1], [1, 0]])
    confs = np.linspace(0, 1, 8, dtype=np.float32).reshape(4, 2)
    st = SiteTrajectory(sn, labels, confidences=confs)
    real = np.zeros((4, 6, 3)) + np.arange(4)[:, None, None]
    st.set_real_traj(real)
    assert len(st) == 4
    np.testing.assert_array_equal(st[2], [0, -1])    # int -> raw labels
    sub = st[1:3]                                    # slice -> SiteTrajectory
    assert isinstance(sub, SiteTrajectory) and len(sub) == 2
    np.testing.assert_array_equal(sub.traj, labels[1:3])
    np.testing.assert_array_equal(sub._real_traj, real[1:3])
    assert "n_frames=4" in repr(st)
    # rebinding a network with a different n_mobile is rejected
    other = SiteNetwork(sn.structure, np.ones(6, bool), np.zeros(6, bool))
    with pytest.raises(ValueError, match="different n_mobile"):
        st.site_network = other


def test_sitetraj_real_positions_requires_real_traj(sn):
    st = SiteTrajectory(sn, np.array([[0, 1]]))
    with pytest.raises(ValueError, match="no real trajectory"):
        st.real_positions_for_site(0)
    st.set_real_traj(np.arange(18, dtype=float).reshape(1, 6, 3))
    pts, confs = st.real_positions_for_site(1, return_confidences=True)
    np.testing.assert_allclose(pts, [[15.0, 16.0, 17.0]])
    np.testing.assert_allclose(confs, [1.0])   # defaults when confs unset


def test_sitetraj_save_load_with_real_traj(sn, tmp_path):
    labels = np.array([[0, 1], [1, -1]])
    st = SiteTrajectory(sn, labels)
    real = np.random.default_rng(0).normal(size=(2, 6, 3))
    st.set_real_traj(real)
    p = tmp_path / "st.npz"
    st.save(str(p), with_real_traj=True)
    st2 = SiteTrajectory.load(str(p))
    np.testing.assert_array_equal(st2.traj, labels)
    np.testing.assert_allclose(st2._real_traj, real)
    # future format version refuses to load
    with np.load(str(p), allow_pickle=True) as d:
        data = dict(d)
    data["__sitetraj_version__"] = np.int64(9999)
    np.savez(str(p), **data)
    with pytest.raises(ValueError,
                       match="unsupported SiteTrajectory format"):
        SiteTrajectory.load(str(p))


def test_compute_site_occupancies_replaces_existing(sn):
    st = SiteTrajectory(sn, np.array([[0, 0], [0, 1]]))
    occ1 = st.compute_site_occupancies()
    np.testing.assert_allclose(occ1, [1.5, 0.5])
    occ2 = st.compute_site_occupancies()    # second run must not raise
    np.testing.assert_allclose(occ2, occ1)


# --------------------------------------------------- LandmarkAnalysis

def test_landmark_analysis_validation(sn):
    with pytest.raises(ValueError, match="multiple_occupancy_action"):
        LandmarkAnalysis(multiple_occupancy_action="shrug")
    la = LandmarkAnalysis()
    with pytest.raises(ValueError, match="has not been run"):
        la.landmark_vectors
    with pytest.raises(ValueError, match="has not been run"):
        la.landmark_dimension
    with pytest.raises(ValueError, match="frames must be"):
        la.run(sn, np.zeros((4, 6)))
    bare = SiteNetwork(sn.structure, sn.static_mask, sn.mobile_mask)
    bare.centers = sn.centers.copy()
    with pytest.raises(ValueError, match="no vertices"):
        la.run(bare, np.zeros((4, 6, 3)))


# ------------------------------------------------ SiteVolumes edges

def test_site_volumes_degenerate_sites(sn):
    """Sites with <4 points or a coplanar cloud: NaN by default, raise
    with error_on_insufficient (coverage audit: QhullError branch)."""
    from sitator_tpu.network.site_volumes import SiteVolumes
    # site 0: coplanar cloud (QhullError); site 1: too few points
    labels = np.array([[0, 1], [0, 1], [0, 1], [0, -1], [0, -1], [0, -1]])
    st = SiteTrajectory(sn, labels)
    real = np.zeros((6, 6, 3))
    # mobile atoms are indices 4, 5; ion 0 -> site 0 coplanar z=0 square+
    planar = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                       [0.5, 0.5, 0], [0.2, 0.7, 0.0]])
    real[:, 4, :] = planar + 1.0
    real[:3, 5, :] = planar[:3] + 3.0      # site 1: only 3 assigned frames
    st.set_real_traj(real)
    st2 = SiteVolumes(verbose=False).run(st)
    vols = st2.site_network.site_volumes
    assert np.isnan(vols).all()            # coplanar AND low-count -> NaN
    # site 0 (coplanar, >= 4 points) is hit first: the QhullError re-raise
    from scipy.spatial import QhullError
    with pytest.raises(QhullError):
        SiteVolumes(error_on_insufficient=True, verbose=False).run(st)
    # low-count branch raises the explicit ValueError (site 0 underfilled,
    # reached before any hull is attempted)
    labels_low = np.array([[-1, 0], [-1, 0], [-1, 0],
                           [-1, -1], [-1, -1], [-1, -1]])
    st_low = SiteTrajectory(sn, labels_low)
    real_low = np.zeros((6, 6, 3))
    real_low[:3, 5, :] = planar[:3] + 3.0
    st_low.set_real_traj(real_low)
    with pytest.raises(ValueError, match="< 4 assigned points"):
        SiteVolumes(error_on_insufficient=True, verbose=False).run(st_low)


def test_recenter_with_masses(sn):
    """Mass-weighted COM removal equals the hand-computed weighted
    drift (coverage audit: masses branch)."""
    from sitator_tpu.misc.recenter import RecenterTrajectory
    rng = np.random.default_rng(2)
    base = rng.uniform(1, 5, (6, 3))
    drift = np.cumsum(rng.normal(0, 0.05, (10, 3)), axis=0)
    traj = base[None] + drift[:, None, :]
    static_mask = np.array([1, 1, 1, 1, 0, 0], bool)
    masses = np.array([1.0, 2.0, 3.0, 4.0])
    out = RecenterTrajectory(masses=masses, verbose=False).run(
        static_mask, traj, cell=np.eye(3) * 50.0)
    # every static atom's weighted COM displacement is removed exactly
    w = masses / masses.sum()
    disp = out[:, static_mask, :] - out[0:1, static_mask, :]
    com = np.einsum("fnc,n->fc", disp, w)
    np.testing.assert_allclose(com, 0.0, atol=1e-12)
    # input untouched (in_place=False default)
    assert not np.allclose(traj[:, static_mask, :],
                           out[:, static_mask, :])
