"""Geometry tables: vertex generators, moments, decompositions."""

import math

import numpy as np

from magical_tpu import constants as C
from magical_tpu import geometry as G


def _poly_area(verts):
    a = 0.0
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        a += x1 * y2 - x2 * y1
    return a / 2


def test_regular_poly_area_matches_circle():
    # geom.py:18-22: side length chosen so the polygon's area equals the
    # circle of radius SHAPE_RAD
    for n in (3, 5, 6, 8):
        side = G.regular_poly_circ_rad_to_side_length(n, C.SHAPE_RAD)
        verts = G.compute_regular_poly_verts(n, side)
        assert abs(_poly_area(verts) - math.pi * C.SHAPE_RAD ** 2) < 1e-9


def test_star_decomposition_exact():
    out_r, in_r = 1.3 * C.SHAPE_RAD, 0.65 * C.SHAPE_RAD
    star = G.compute_star_verts(5, out_r, in_r)
    parts = G._star_decomposition(out_r, in_r)
    assert len(parts) == 6
    star_area = _poly_area(star)
    parts_area = sum(_poly_area(p) for p in parts)
    assert abs(star_area - parts_area) < 1e-12
    # all parts CCW (positive area) and convex
    for p in parts:
        assert _poly_area(p) > 0


def test_moment_formulas():
    # circle: m r^2 / 2
    assert abs(G.moment_for_circle(2.0, 0, 0.5) - 0.25) < 1e-12
    # square box side s: m s^2 / 6
    s = 0.3
    box = G.rect_verts(s, s)
    assert abs(G.moment_for_poly(1.0, box) - s * s / 6) < 1e-12


def test_finger_vertices_match_reference_construction():
    upper, fore = G.make_finger_vertices(0.22, 0.14, 0.05, -1)
    # upper arm is an axis-aligned box lifted by upper_len/2
    np.testing.assert_allclose(
        upper, [(0.025, 0.22), (-0.025, 0.22), (-0.025, 0.0), (0.025, 0.0)],
        atol=1e-12)
    # forearm canted by -pi/8 for the left side
    fore = np.asarray(fore)
    e = fore[1] - fore[0]
    ang = math.atan2(e[1], e[0])
    assert abs(abs(ang) - (math.pi - math.pi / 8)) < 1e-9


def test_block_tables_consistent():
    assert G.BLOCK_VERTS.shape == (7, G.KSUB, G.NV, 2)
    # circle uses 1-vertex + radius convention
    ci = C.ShapeType.CIRCLE
    assert G.BLOCK_SUB_NV[ci, 0] == 1
    assert abs(G.BLOCK_SUB_RADIUS[ci, 0] - C.SHAPE_RAD) < 1e-7
    # star has 6 active sub-shapes; others 1
    assert G.BLOCK_SUB_ACTIVE[C.ShapeType.STAR].sum() == 6
    assert G.BLOCK_SUB_ACTIVE[C.ShapeType.SQUARE].sum() == 1
    assert np.all(G.BLOCK_MOMENT > 0)
    assert np.all(G.BLOCK_BOUND_RADIUS > 0.1)
