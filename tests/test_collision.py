"""Narrowphase unit tests against analytic cases."""

import jax.numpy as jnp
import numpy as np
import pytest

from magical_tpu.core import collision as col
from magical_tpu.geometry import NV


def pad(verts):
    verts = np.asarray(verts, np.float32)
    out = np.zeros((NV, 2), np.float32)
    out[:len(verts)] = verts
    out[len(verts):] = verts[-1]
    return jnp.asarray(out)


def box(cx, cy, w, h):
    return pad([(cx + w / 2, cy + h / 2), (cx - w / 2, cy + h / 2),
                (cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2)])


def test_circle_circle():
    p, n, d = col.circle_circle(jnp.asarray([0.0, 0.0]), 0.5,
                                jnp.asarray([0.8, 0.0]), 0.5)
    assert abs(float(d) - (-0.2)) < 1e-6
    np.testing.assert_allclose(np.asarray(n), [1.0, 0.0], atol=1e-6)
    assert abs(float(p[0]) - 0.4) < 1e-6


def test_circle_poly_outside_face():
    verts = box(0, 0, 1, 1)
    p, n, d = col.circle_poly(jnp.asarray([0.0, 0.9]), 0.5, verts, 4, 0.0)
    # distance from face y=0.5 to centre 0.9 is 0.4; minus radius = -0.1
    assert abs(float(d) - (-0.1)) < 1e-6
    np.testing.assert_allclose(np.asarray(n), [0.0, 1.0], atol=1e-6)


def test_circle_poly_corner():
    verts = box(0, 0, 1, 1)
    c = jnp.asarray([0.5 + 0.3, 0.5 + 0.4])   # 0.5 from the corner
    p, n, d = col.circle_poly(c, 0.6, verts, 4, 0.0)
    assert abs(float(d) - (0.5 - 0.6)) < 1e-5
    np.testing.assert_allclose(np.asarray(n), [0.6, 0.8], atol=1e-5)


def test_circle_poly_inside():
    verts = box(0, 0, 1, 1)
    p, n, d = col.circle_poly(jnp.asarray([0.3, 0.0]), 0.1, verts, 4, 0.0)
    # deepest face is x=0.5 (0.2 inside), so dist = -0.2 - 0.1
    assert float(d) == pytest.approx(-0.3, abs=1e-6)
    np.testing.assert_allclose(np.asarray(n), [1.0, 0.0], atol=1e-6)


def test_poly_poly_overlap_two_contacts():
    a = box(0, 0, 1, 1)
    b = box(0.9, 0.0, 1, 1)      # overlap band x in [0.4, 0.5]
    pts, ns, ds, vs = col.poly_poly(a, 4, 0.0, b, 4, 0.0)
    vs = np.asarray(vs)
    assert vs.sum() == 2
    np.testing.assert_allclose(np.asarray(ns)[0], [1.0, 0.0], atol=1e-5)
    assert np.allclose(np.asarray(ds)[vs], -0.1, atol=1e-5)


def test_poly_poly_separated():
    a = box(0, 0, 1, 1)
    b = box(2.0, 0.0, 1, 1)
    _, _, _, vs = col.poly_poly(a, 4, 0.0, b, 4, 0.0)
    assert not np.asarray(vs).any()


def test_poly_poly_rotated_corner():
    # diamond (rotated square) poking into a box face
    s = np.sqrt(2) / 2
    diamond = pad([(0.0, s), (-s, 0.0), (0.0, -s), (s, 0.0)])
    a = box(0, 0, 1, 1)
    d2 = jnp.asarray(np.asarray(diamond) + np.asarray([1.1, 0.0],
                                                      np.float32))
    pts, ns, ds, vs = col.poly_poly(a, 4, 0.0, d2, 4, 0.0)
    vs = np.asarray(vs)
    assert vs.any()
    # leftmost diamond vertex sits at x = 1.1 - s, box face at 0.5:
    # penetration distance = (1.1 - s) - 0.5 = 0.6 - s (negative)
    assert np.min(np.asarray(ds)[vs]) == pytest.approx(0.6 - s, abs=1e-5)


def test_wall_contacts():
    # box resting past the left wall x=-1
    verts = box(-0.95, 0.0, 0.2, 0.2)
    pts, n, ds, vs = col.wall_contacts_for_slot(
        verts, jnp.asarray(4), jnp.asarray(0.0),
        jnp.asarray(col.WALL_NORMALS[0]), jnp.asarray(col.WALL_OFFSETS[0]))
    vs = np.asarray(vs)
    assert vs.sum() == 2            # two penetrating vertices
    assert np.allclose(np.asarray(ds)[vs], -0.05, atol=1e-6)
    # circle not touching
    cverts = pad([(0.0, 0.0)])
    _, _, ds2, vs2 = col.wall_contacts_for_slot(
        cverts, jnp.asarray(1), jnp.asarray(0.2),
        jnp.asarray(col.WALL_NORMALS[0]), jnp.asarray(col.WALL_OFFSETS[0]))
    assert not np.asarray(vs2).any()
