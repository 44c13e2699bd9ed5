"""Direct coverage for public API symbols previously exercised only
indirectly (found by an API-vs-tests audit in round 5):
``plot_reactive_flux``, ``InsufficientSitesError``, ``get_progress_bar``,
``FRAME_AXIS``, ``MergeSitesBase``, ``SyntheticMD``."""
import matplotlib
import numpy as np
import pytest

matplotlib.use("Agg")

from sitator_tpu import SiteNetwork
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import TransitionPathAnalysis
from sitator_tpu.io import SyntheticMD, make_hopping_trajectory
from sitator_tpu.landmark import LandmarkAnalysis
from sitator_tpu.util import InsufficientSitesError, SitatorError
from sitator_tpu.util.progress import get_progress_bar
from sitator_tpu.visualization import plot_reactive_flux
from sitator_tpu.voronoi import VoronoiSiteGenerator


def _tpt_fixture():
    structure = Structure(np.zeros((2, 3)), [16, 3], np.eye(3) * 20.0)
    sn = SiteNetwork(structure, np.array([1, 0], bool),
                     np.array([0, 1], bool))
    rng = np.random.default_rng(0)
    S = 6
    sn.centers = rng.uniform(0, 20.0, (S, 3))
    n = np.zeros((S, S))
    # two channels 0->1->2->5 (wide) and 0->3->4->5 (narrow), reversible
    for a, b, w in ((0, 1, 30), (1, 2, 30), (2, 5, 30),
                    (0, 3, 10), (3, 4, 10), (4, 5, 10)):
        n[a, b] = n[b, a] = w
    t = np.full(S, 100.0)
    sn.add_edge_attribute("n_ij", n)
    sn.add_site_attribute("total_corrected_residences", t)
    return sn


def test_plot_reactive_flux_draws():
    sn = _tpt_fixture()
    tpa = TransitionPathAnalysis(sources=[0], sinks=[5], n_paths=3,
                                 verbose=False)
    tpa.run(sn)
    fig = plot_reactive_flux(tpa, sn)
    ax = fig.axes[0]
    fig.canvas.draw()
    # flux edges + highlighted pathways are Line2D artists; both
    # channels must appear (6 reversible net-flux edges collapse to 6
    # directed positives, plus >= 2 pathway overlays)
    assert len(ax.lines) >= 8, f"only {len(ax.lines)} lines drawn"
    # source/sink/interior scatters all present
    assert len(ax.collections) >= 3
    # every site appears at its committor: data spans q in [0, 1]
    xs = np.concatenate([ln.get_xdata() for ln in ax.lines])
    assert xs.min() == 0.0 and xs.max() == 1.0
    matplotlib.pyplot.close(fig)


def test_insufficient_sites_error_raised():
    """minimum_site_occupancy above 1.0 makes min_samples > n_frames, so
    clustering keeps nothing and the engine must raise the PUBLIC typed
    error (a subclass of SitatorError), not crash downstream."""
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=4, n_frames=60,
                                 jump_rate=0.03, seed=11)
    sn0 = SiteNetwork(md.structure, md.static_mask, md.mobile_mask)
    seeds = VoronoiSiteGenerator(merge_tol=0.05).run(sn0)
    la = LandmarkAnalysis(cutoff_midpoint=4.0, cutoff_steepness=3.0,
                          minimum_site_occupancy=1.5, verbose=False)
    with pytest.raises(InsufficientSitesError) as ei:
        la.run(seeds, md.traj)
    assert isinstance(ei.value, SitatorError)
    assert "minimum_site_occupancy" in str(ei.value)


def test_get_progress_bar_passthrough():
    items = [1, 2, 3]
    assert list(get_progress_bar(items, enabled=False)) == items
    # enabled path must also yield identical items (tqdm or fallback)
    assert list(get_progress_bar(iter(items), enabled=True,
                                 total=3, desc="t")) == items


def test_frame_axis_names_the_mesh_axis():
    import jax
    from sitator_tpu.parallel import FRAME_AXIS, frame_mesh
    if jax.default_backend() != "cpu" or jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU test mesh")
    mesh = frame_mesh(jax.device_count())
    assert FRAME_AXIS in mesh.axis_names


def test_merge_sites_base_is_abstract():
    from sitator_tpu.network import MergeSitesBase
    sn = _tpt_fixture()
    with pytest.raises(NotImplementedError):
        MergeSitesBase()._get_merges(sn)


def test_synthetic_md_ground_truth_consistent():
    md = make_hopping_trajectory(n_cells=3, a=4.0, n_ions=4, n_frames=50,
                                 jump_rate=0.03, seed=5)
    assert isinstance(md, SyntheticMD)
    n_ions = int(md.mobile_mask.sum())
    assert md.true_assignments.shape == (md.traj.shape[0], n_ions)
    assert md.true_assignments.min() >= 0
    assert md.true_assignments.max() < len(md.true_sites)
    # mobile ions sit near their assigned ground-truth site (min-image)
    cell = np.asarray(md.structure.cell)
    pos = md.traj[0, md.mobile_mask]
    tgt = md.true_sites[md.true_assignments[0]]
    d = pos - tgt
    d -= np.round(d @ np.linalg.inv(cell)) @ cell
    assert np.linalg.norm(d, axis=1).max() < 1.5
