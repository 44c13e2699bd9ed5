"""PBC math: oracle + property tests (SURVEY.md §5 items 1-2)."""
import numpy as np
import pytest

from sitator_tpu.ops import pbc
from sitator_tpu.ops.pbc import PBCCalculator


CELLS = {
    "cubic": np.eye(3) * 10.0,
    "ortho": np.diag([8.0, 11.0, 13.0]),
    "triclinic": np.array([[10.0, 0.0, 0.0],
                           [2.0, 9.0, 0.0],
                           [1.0, -1.5, 11.0]]),
}


def brute_force_min_dist(a, b, cell):
    """Oracle: true minimum-image distance by scanning 5^3 images."""
    best = np.inf
    for i in range(-2, 3):
        for j in range(-2, 3):
            for k in range(-2, 3):
                shift = np.array([i, j, k], dtype=float) @ cell
                best = min(best, np.linalg.norm(b + shift - a))
    return best


@pytest.mark.parametrize("cell_name", list(CELLS))
def test_distance_matches_brute_force(cell_name, rng):
    cell = CELLS[cell_name]
    # fractional rounding is the exact minimum image only for sufficiently
    # orthogonal cells; skewed cells need the 27-image search
    calc = PBCCalculator(cell, exact=(cell_name == "triclinic"))
    pts = rng.uniform(-1, 2, size=(20, 3)) @ cell
    ref = rng.uniform(0, 1, size=3) @ cell
    got = calc.distances(ref, pts)
    want = np.array([brute_force_min_dist(ref, p, cell) for p in pts])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_exact_mode_on_skewed_cell(rng):
    # heavily skewed cell where rounding can pick the wrong image
    cell = np.array([[10.0, 0.0, 0.0],
                     [9.0, 2.0, 0.0],
                     [0.0, 0.0, 10.0]])
    calc = PBCCalculator(cell, exact=True)
    pts = rng.uniform(0, 1, size=(50, 3)) @ cell
    ref = rng.uniform(0, 1, size=3) @ cell
    got = calc.distances(ref, pts)
    want = np.array([brute_force_min_dist(ref, p, cell) for p in pts])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_translation_invariance(rng):
    """Rigid translation of everything leaves all PBC distances unchanged."""
    cell = CELLS["triclinic"]
    calc = PBCCalculator(cell)
    pts = rng.uniform(0, 1, size=(30, 3)) @ cell
    t = rng.uniform(-5, 5, size=3)
    d0 = calc.pairwise_distances(pts)
    d1 = calc.pairwise_distances(pts + t)
    np.testing.assert_allclose(d0, d1, atol=1e-6)


def test_image_shift_invariance(rng):
    """Shifting one atom by a full lattice vector changes nothing."""
    cell = CELLS["ortho"]
    calc = PBCCalculator(cell)
    pts = rng.uniform(0, 1, size=(10, 3)) @ cell
    pts2 = pts.copy()
    pts2[3] += cell[0] - 2 * cell[2]
    np.testing.assert_allclose(calc.pairwise_distances(pts),
                               calc.pairwise_distances(pts2), atol=1e-6)


def test_wrap_points(rng):
    cell = CELLS["triclinic"]
    calc = PBCCalculator(cell)
    pts = rng.uniform(-3, 4, size=(25, 3)) @ cell
    wrapped = calc.wrap_points(pts)
    frac = wrapped @ np.linalg.inv(cell)
    assert np.all(frac >= -1e-9) and np.all(frac < 1 + 1e-9)
    # wrapping must preserve all pairwise PBC distances
    np.testing.assert_allclose(calc.pairwise_distances(pts),
                               calc.pairwise_distances(wrapped), atol=1e-6)


def test_min_image_mapping(rng):
    cell = CELLS["cubic"]
    calc = PBCCalculator(cell)
    ref = np.array([0.5, 0.5, 0.5])
    # point near opposite corner: its min image wrt ref is at negative coords
    pt = np.array([[9.8, 9.7, 9.9]])
    mapped = calc.min_image(ref, pt)
    np.testing.assert_allclose(mapped, [[-0.2, -0.3, -0.1]], atol=1e-6)


def test_pbc_average_across_boundary():
    """Points straddling the cell boundary average to the boundary, not the
    cell middle — the classic failure of a naive mean."""
    cell = np.eye(3) * 10.0
    calc = PBCCalculator(cell)
    pts = np.array([[9.9, 5.0, 5.0], [0.1, 5.0, 5.0]])
    avg = calc.average(pts)
    d = calc.distances(np.array([0.0, 5.0, 5.0]), avg[None, :])
    assert d[0] < 1e-6


def test_pbc_average_weighted():
    cell = np.eye(3) * 10.0
    calc = PBCCalculator(cell)
    pts = np.array([[9.8, 5.0, 5.0], [0.2, 5.0, 5.0]])
    avg = calc.average(pts, weights=np.array([3.0, 1.0]))
    # weighted toward 9.8 side: 9.8 + 0.25*(0.4) = 9.9
    d = calc.distances(np.array([9.9, 5.0, 5.0]), avg[None, :])
    assert d[0] < 1e-6


def test_coords_roundtrip(rng):
    cell = CELLS["triclinic"]
    calc = PBCCalculator(cell)
    pts = rng.uniform(0, 1, size=(12, 3)) @ cell
    np.testing.assert_allclose(
        calc.to_real_coords(calc.to_cell_coords(pts)), pts, atol=1e-8)


def test_is_in_image_of():
    cell = np.eye(3) * 7.0
    calc = PBCCalculator(cell)
    a = np.array([1.0, 2.0, 3.0])
    assert calc.is_in_image_of(a + cell[0] - cell[1], a)
    assert not calc.is_in_image_of(a + 0.5, a)
