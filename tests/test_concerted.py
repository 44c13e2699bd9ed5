"""ConcertedJumpAnalysis: cooperative multi-ion events recovered exactly
from engineered label trajectories (handoff chains, ring exchanges,
window semantics, unknown-gap policies)."""
import numpy as np
import pytest

from sitator_tpu import SiteNetwork
from sitator_tpu.core.sitetraj import SiteTrajectory
from sitator_tpu.core.structure import Structure
from sitator_tpu.dynamics import ConcertedJumpAnalysis


def _network(S, n_ions):
    n = 1 + n_ions
    structure = Structure(np.zeros((n, 3)), [16] + [3] * n_ions,
                          np.eye(3) * 10.0)
    static = np.zeros(n, bool)
    static[0] = True
    sn = SiteNetwork(structure, static, ~static)
    sn.centers = np.linspace(0.5, 9.5, S)[:, None] * np.array([1.0, 0, 0])
    return sn


def _st(labels):
    labels = np.asarray(labels, dtype=np.int32)
    S = int(labels.max()) + 1
    return SiteTrajectory(_network(max(S, 2), labels.shape[1]), labels)


def test_two_ion_handoff_is_one_chain_event():
    # ion0: 0->1 at frame 1; ion1: 1->2 at frame 1 (same-frame handoff)
    labels = [[0, 1],
              [1, 2],
              [1, 2]]
    cja = ConcertedJumpAnalysis(window=1)
    cja.run(_st(labels))
    assert cja.n_jumps_ == 2
    assert cja.n_events_ == 1
    assert cja.event_n_ions_.tolist() == [2]
    assert cja.event_is_ring_.tolist() == [False]
    assert cja.n_chain_events_ == 1 and cja.n_ring_events_ == 0
    assert cja.cooperativity_fraction_ == 1.0


def test_ring_exchange_detected():
    # 3-ion cyclic exchange 0->1->2->0 in one frame: a ring, no net
    # vacancy transport
    labels = [[0, 1, 2],
              [1, 2, 0],
              [1, 2, 0]]
    cja = ConcertedJumpAnalysis(window=0)
    cja.run(_st(labels))
    assert cja.n_events_ == 1
    assert cja.event_n_ions_.tolist() == [3]
    assert cja.event_is_ring_.tolist() == [True]
    assert cja.n_ring_events_ == 1 and cja.n_chain_events_ == 0


def test_two_ion_swap_is_a_ring():
    labels = [[0, 1],
              [1, 0]]
    cja = ConcertedJumpAnalysis(window=0)
    cja.run(_st(labels))
    assert cja.n_events_ == 1
    assert cja.event_is_ring_.tolist() == [True]


def test_independent_jumps_stay_separate():
    # two ions hop between disjoint site pairs: no shared site, no link
    labels = [[0, 2],
              [1, 3]]
    cja = ConcertedJumpAnalysis(window=5)
    cja.run(_st(labels))
    assert cja.n_jumps_ == 2
    assert cja.n_events_ == 2
    assert cja.event_n_ions_.tolist() == [1, 1]
    assert cja.cooperativity_fraction_ == 0.0
    assert cja.event_size_histogram_.tolist() == [0, 2]


def test_window_semantics_exact():
    # handoff separated by 2 frames: linked at window=2, not at window=1
    labels = [[0, 1],
              [1, 1],    # ion0 0->1 at frame 1
              [1, 1],
              [1, 2]]    # ion1 1->2 at frame 3
    for window, n_events in ((1, 2), (2, 1)):
        cja = ConcertedJumpAnalysis(window=window)
        cja.run(_st(labels))
        assert cja.n_events_ == n_events, window


def test_transitive_chain_merges_into_one_event():
    # vacancy train: ion2 2->3 (frame 1), ion1 1->2 (frame 2),
    # ion0 0->1 (frame 3); pairwise links chain transitively
    labels = [[0, 1, 2],
              [0, 1, 3],
              [0, 2, 3],
              [1, 2, 3]]
    cja = ConcertedJumpAnalysis(window=1)
    cja.run(_st(labels))
    assert cja.n_events_ == 1
    assert cja.event_n_ions_.tolist() == [3]
    assert cja.event_n_jumps_.tolist() == [3]
    assert cja.event_span_.tolist() == [2]
    assert cja.event_is_ring_.tolist() == [False]
    # frame-sorted within the event
    ev = cja.event_jumps_[0]
    assert cja.jump_frames_[ev].tolist() == [1, 2, 3]


def test_single_ion_double_hop_is_not_cooperative():
    # one ion hops 0->1 then 1->2 within the window: one event (its own
    # handoff) but only 1 distinct ion -> not concerted
    labels = [[0], [1], [2]]
    cja = ConcertedJumpAnalysis(window=1)
    cja.run(_st(labels))
    assert cja.n_events_ == 1
    assert cja.event_n_ions_.tolist() == [1]
    assert cja.cooperativity_fraction_ == 0.0


def test_site_attribute_concerted_fraction():
    # site 0 departure is cooperative (handoff with ion1 leaving 1);
    # site 3 departure (ion2, isolated, far in time) is not
    labels = [[0, 1, 3],
              [1, 2, 3],
              [1, 2, 3],
              [1, 2, 3],
              [1, 2, 4]]
    st = _st(labels)
    cja = ConcertedJumpAnalysis(window=1)
    cja.run(st)
    frac = st.site_network.get_site_attribute("concerted_fraction")
    assert frac[0] == 1.0 and frac[1] == 1.0
    assert frac[3] == 0.0
    assert np.isnan(frac[2]) and np.isnan(frac[4])


def test_unknown_policy_persist_vs_break():
    # ion0 leaves site 0, is unassigned one frame, reappears at site 1;
    # ion1 arrives at 0 in the gap's window
    labels = [[0, 2],
              [-1, 0],
              [1, 0]]
    p = ConcertedJumpAnalysis(window=1, unknown_policy="persist")
    p.run(_st(labels))
    # persist: ion0 jump 0->1 recorded at frame 2; ion1 2->0 at frame 1
    assert p.n_jumps_ == 2
    assert p.n_events_ == 1 and p.event_n_ions_.tolist() == [2]
    b = ConcertedJumpAnalysis(window=1, unknown_policy="break")
    b.run(_st(labels))
    # break: ion0's gap kills its jump; only ion1's remains
    assert b.n_jumps_ == 1
    assert b.n_events_ == 1 and b.event_n_ions_.tolist() == [1]


def test_no_jumps_is_well_defined():
    labels = np.zeros((5, 1), dtype=np.int32)
    st = _st(labels)
    cja = ConcertedJumpAnalysis()
    cja.run(st)
    assert cja.n_jumps_ == 0 and cja.n_events_ == 0
    assert cja.cooperativity_fraction_ == 0.0
    assert np.isnan(
        st.site_network.get_site_attribute("concerted_fraction")).all()


def test_ctor_validation():
    with pytest.raises(ValueError):
        ConcertedJumpAnalysis(window=-1)
    with pytest.raises(ValueError):
        ConcertedJumpAnalysis(min_event_size=1)
    with pytest.raises(ValueError):
        ConcertedJumpAnalysis(unknown_policy="bogus")


def test_plot_event_sizes_draws_bars():
    import matplotlib
    matplotlib.use("Agg")
    labels = [[0, 1, 2],
              [1, 2, 0],
              [1, 2, 0]]
    cja = ConcertedJumpAnalysis(window=0)
    cja.run(_st(labels))
    fig = cja.plot_event_sizes()
    ax = fig.axes[0]
    assert len(ax.patches) > 0
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_agrees_with_jump_analysis_totals():
    # jump extraction must match JumpAnalysis on a random trajectory
    from sitator_tpu.dynamics import JumpAnalysis
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 5, size=(300, 4)).astype(np.int32)
    labels[rng.random(labels.shape) < 0.1] = -1
    st = _st(np.maximum(labels, -1))
    ja = JumpAnalysis(verbose=False)
    ja.run(st)
    cja = ConcertedJumpAnalysis(verbose=False)
    cja.run(st)
    assert cja.n_jumps_ == ja.n_jumps
    # every jump is in exactly one event
    assert int(cja.event_n_jumps_.sum()) == cja.n_jumps_
    covered = np.concatenate(cja.event_jumps_)
    assert len(np.unique(covered)) == cja.n_jumps_


def test_kmc_resample_gives_chance_baseline():
    """Cooperativity is mechanistic signal the Markov model cannot carry:
    KineticMonteCarlo advances walkers independently, so measuring
    ConcertedJumpAnalysis on a resample of a highly cooperative MD
    (single-vacancy exchange: every hop is a handoff into the hole)
    yields only the chance-coincidence baseline, far below the MD value.
    """
    from sitator_tpu.core.structure import Structure
    from sitator_tpu.dynamics import JumpAnalysis, KineticMonteCarlo

    rng = np.random.default_rng(11)
    n, a = 3, 3.0
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
    S = len(grid)
    idx = {tuple(g): i for i, g in enumerate(grid)}
    neigh = [[idx[tuple((g + d) % n)] for d in
              [(1, 0, 0), (-1, 0, 0), (0, 1, 0),
               (0, -1, 0), (0, 0, 1), (0, 0, -1)]] for g in grid]
    site_of_ion = np.arange(1, S)
    ion_at = {s: i for i, s in enumerate(site_of_ion)}
    vac = 0
    F = 3000
    labels = np.empty((F, S - 1), np.int32)
    for f in range(F):
        labels[f] = site_of_ion
        if rng.random() < 0.5:
            nxt = neigh[vac][rng.integers(6)]
            i = ion_at.pop(nxt)
            site_of_ion[i] = vac
            ion_at[vac] = i
            vac = nxt

    nat = S
    structure = Structure(np.zeros((nat, 3)), [16] + [3] * (S - 1),
                          np.eye(3) * n * a)
    static = np.zeros(nat, bool)
    static[0] = True
    sn = SiteNetwork(structure, static, ~static)
    sn.centers = (grid + 0.5) * a
    st = SiteTrajectory(sn, labels)

    window = 2
    md_c = ConcertedJumpAnalysis(window=window, verbose=False)
    md_c.run(st)
    # P(a hop links to neither temporal neighbor) = (0.5**window)**2
    assert md_c.cooperativity_fraction_ > 0.85

    JumpAnalysis(verbose=False).run(st)
    kmc = KineticMonteCarlo(n_walkers=S - 1, n_frames=F, seed=0,
                            verbose=False)
    st_kmc = kmc.run(sn)
    kmc_c = ConcertedJumpAnalysis(window=window, verbose=False)
    kmc_c.run(st_kmc)
    # independent walkers: handoffs only by site/time coincidence
    assert (kmc_c.cooperativity_fraction_
            < md_c.cooperativity_fraction_ - 0.3)
