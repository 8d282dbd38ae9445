"""Vectorised narrowphase collision routines.

The reference delegates narrowphase to the Chipmunk2D C library (via
pymunk, entities.py / base_env.py:194-196).  Here every collider is a
convex polygon of up to ``NV`` vertices with an outset radius — the same
unification Chipmunk uses internally (a circle is a 1-vertex "poly" with
a large radius).  All functions are written to be ``vmap``-ed over a pair
axis and an env axis; shapes are static-size with masking, there is no
data-dependent control flow.

Conventions:
  * polygons are CCW; padded vertex rows repeat the last real vertex
  * contact normals point from shape A to shape B
  * a contact is active iff dist < 0 (penetration), matching Chipmunk's
    non-speculative contact generation
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu.geometry import NV

_EPS = 1e-9
_BIG = 1e9


def rot2(angle):
    """(…,) angle -> (…, 2, 2) rotation matrix."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def transform_verts(verts, pos, angle):
    """Local (…, NV, 2) verts -> world frame."""
    R = rot2(angle)
    return jnp.einsum('...ij,...vj->...vi', R, verts) + pos[..., None, :]


def _poly_edges(verts, nv):
    """Return per-edge (start, end, outward normal, valid) for a CCW poly
    with `nv` real vertices stored in padded (NV, 2) `verts`."""
    idx = jnp.arange(NV)
    nxt = jnp.where(idx + 1 < nv, idx + 1, 0)
    v0 = verts
    v1 = verts[nxt]
    e = v1 - v0
    elen = jnp.linalg.norm(e, axis=-1, keepdims=True)
    n = jnp.stack([e[..., 1], -e[..., 0]], -1) / jnp.maximum(elen, _EPS)
    valid = (idx < nv) & (elen[..., 0] > _EPS)
    return v0, v1, n, valid


def circle_circle(ca, ra, cb, rb):
    """Single contact between two circles (cpCollideCircles semantics)."""
    d = cb - ca
    dist_c = jnp.linalg.norm(d)
    n = d / jnp.maximum(dist_c, _EPS)
    dist = dist_c - (ra + rb)
    point = ca + n * (ra + 0.5 * dist)
    return point, n, dist


def circle_poly(c, rc, verts, nv, rpoly):
    """Contact between a circle (centre c, radius rc) and a convex poly.

    Returns (point, normal, dist) with the normal pointing from the POLY
    towards the CIRCLE."""
    v0, v1, n, valid = _poly_edges(verts, nv)
    # Face separations of the centre.
    sep = jnp.einsum('vi,vi->v', n, c[None, :] - v0)
    sep = jnp.where(valid, sep, -_BIG)
    inside = jnp.max(sep) <= 0.0

    # Deepest face when inside.
    f = jnp.argmax(sep)
    n_in = n[f]
    dist_in = sep[f] - rpoly - rc

    # Closest boundary point when outside.
    e = v1 - v0
    ee = jnp.maximum(jnp.einsum('vi,vi->v', e, e), _EPS)
    tproj = jnp.clip(jnp.einsum('vi,vi->v', c[None, :] - v0, e) / ee, 0.0, 1.0)
    q = v0 + tproj[:, None] * e
    dq = jnp.linalg.norm(c[None, :] - q, axis=-1)
    dq = jnp.where(valid, dq, _BIG)
    j = jnp.argmin(dq)
    qj = q[j]
    dqj = jnp.maximum(dq[j], _EPS)
    n_out = (c - qj) / dqj
    dist_out = dq[j] - rpoly - rc

    normal = jnp.where(inside, n_in, n_out)
    dist = jnp.where(inside, dist_in, dist_out)
    point = c - normal * (rc + 0.5 * dist)
    return point, normal, dist


def poly_poly(va, nva, ra, vb, nvb, rb):
    """Up to two contacts between two convex polys (SAT + reference-face
    clipping, the classic Chipmunk/Box2D construction).

    Returns (points (2,2), normal (2,), dists (2,), valids (2,))."""
    a0, _, an, avalid = _poly_edges(va, nva)
    b0, _, bn, bvalid = _poly_edges(vb, nvb)

    # SAT over A's faces: support of B along -an.
    dots_ab = jnp.einsum('fi,vi->fv', an, vb)           # (F, V)
    minsB = jnp.min(dots_ab, axis=1)
    sepA = minsB - jnp.einsum('fi,fi->f', an, a0)
    sepA = jnp.where(avalid, sepA, -_BIG)
    iA = jnp.argmax(sepA)
    sA = sepA[iA]

    dots_ba = jnp.einsum('fi,vi->fv', bn, va)
    minsA = jnp.min(dots_ba, axis=1)
    sepB = minsA - jnp.einsum('fi,fi->f', bn, b0)
    sepB = jnp.where(bvalid, sepB, -_BIG)
    iB = jnp.argmax(sepB)
    sB = sepB[iB]

    use_a = sA >= sB
    sep = jnp.where(use_a, sA, sB)

    # reference face data
    idxA = jnp.arange(NV)
    nxtA = jnp.where(idxA + 1 < nva, idxA + 1, 0)
    nxtB = jnp.where(idxA + 1 < nvb, idxA + 1, 0)
    refp0 = jnp.where(use_a, va[iA], vb[iB])
    refp1 = jnp.where(use_a, va[nxtA[iA]], vb[nxtB[iB]])
    refm = jnp.where(use_a, an[iA], bn[iB])     # outward normal of ref face
    # contact normal always points A -> B
    normal = jnp.where(use_a, refm, -refm)

    # incident face: on the other poly, face most anti-parallel to refm
    inc_n, inc_valid = jnp.where(use_a, bn, an), jnp.where(use_a, bvalid,
                                                          avalid)
    scores = jnp.einsum('fi,i->f', inc_n, refm)
    scores = jnp.where(inc_valid, scores, _BIG)
    ji = jnp.argmin(scores)
    inc_v = jnp.where(use_a, vb, va)
    inc_nxt = jnp.where(use_a, nxtB, nxtA)
    p1 = inc_v[ji]
    p2 = inc_v[inc_nxt[ji]]

    # clip incident segment to the reference face's side planes
    t = refp1 - refp0
    tlen = jnp.maximum(jnp.linalg.norm(t), _EPS)
    t = t / tlen
    x1 = jnp.dot(t, p1 - refp0)
    x2 = jnp.dot(t, p2 - refp0)
    dx = x2 - x1
    safe_dx = jnp.where(jnp.abs(dx) > _EPS, dx, _EPS)
    # param s in [0,1] along p1->p2 restricted to x in [0, tlen]
    s_at0 = (0.0 - x1) / safe_dx
    s_atL = (tlen - x1) / safe_dx
    s_lo3 = jnp.minimum(s_at0, s_atL)
    s_hi3 = jnp.maximum(s_at0, s_atL)
    s_lo = jnp.clip(s_lo3, 0.0, 1.0)
    s_hi = jnp.clip(s_hi3, 0.0, 1.0)
    c1 = p1 + s_lo * (p2 - p1)
    c2 = p1 + s_hi * (p2 - p1)

    rsum = ra + rb
    d1 = jnp.dot(refm, c1 - refp0) - rsum
    d2 = jnp.dot(refm, c2 - refp0) - rsum
    overlap = sep - rsum < 0.0
    valids = jnp.stack([overlap & (d1 < 0.0), overlap & (d2 < 0.0)])
    points = jnp.stack([c1, c2])
    dists = jnp.stack([d1, d2])
    normals = jnp.broadcast_to(normal, (2, 2))
    return points, normals, dists, valids


def pair_contacts(va, nva, ra, vb, nvb, rb, pa, pb):
    """Dispatch on circle-ness (nv == 1) and return up to two contacts
    (points (2,2), normals (2,2), dists (2,), valids (2,)).

    `pa`/`pb` are the padded world vert arrays' owning "centres" for the
    circle cases (i.e. row 0 of the vert array is the circle centre when
    nv == 1)."""
    a_circ = nva == 1
    b_circ = nvb == 1

    # circle-circle
    cc_pt, cc_n, cc_d = circle_circle(va[0], ra, vb[0], rb)
    # circle(A)-poly(B): circle_poly returns normal poly->circle = B->A,
    # so flip for the A->B convention.
    cpab_pt, cpab_n, cpab_d = circle_poly(va[0], ra, vb, nvb, rb)
    # poly(A)-circle(B): normal poly->circle = A->B already.
    cpba_pt, cpba_n, cpba_d = circle_poly(vb[0], rb, va, nva, ra)
    # poly-poly
    pp_pts, pp_ns, pp_ds, pp_vs = poly_poly(va, nva, ra, vb, nvb, rb)

    one_pt = jnp.where(
        a_circ & b_circ, cc_pt, jnp.where(a_circ, cpab_pt, cpba_pt))
    one_n = jnp.where(
        a_circ & b_circ, cc_n, jnp.where(a_circ, -cpab_n, cpba_n))
    one_d = jnp.where(
        a_circ & b_circ, cc_d, jnp.where(a_circ, cpab_d, cpba_d))

    any_circ = a_circ | b_circ
    points = jnp.where(any_circ, jnp.stack([one_pt, one_pt]), pp_pts)
    normals = jnp.where(any_circ, jnp.stack([one_n, one_n]), pp_ns)
    dists = jnp.where(any_circ, jnp.stack([one_d, one_d]), pp_ds)
    valids = jnp.where(
        any_circ,
        jnp.stack([one_d < 0.0, jnp.zeros((), bool)]), pp_vs)
    return points, normals, dists, valids


# Arena walls as inward half-planes (ArenaBoundaries, entities.py:493-517:
# four static segments of radius 1 just outside [-1,1]^2 — inside the
# arena their surfaces are exactly the lines x=±1, y=±1).
WALL_NORMALS = np.array(
    [[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]], dtype=np.float32)
WALL_OFFSETS = np.array([-1.0, -1.0, -1.0, -1.0], dtype=np.float32)
N_WALLS = 4


def wall_contacts_for_slot(wverts, nv, radius, wall_n, wall_o):
    """Up to two contacts between one shape slot (world verts) and one wall
    half-plane {x : dot(wall_n, x) >= wall_o}.

    Mirrors Chipmunk segment-vs-poly which clips to at most two points.
    Returns (points (2,2), normal (2,), dists (2,), valids (2,))."""
    idx = jnp.arange(NV)
    seps = jnp.einsum('vi,i->v', wverts, wall_n) - wall_o - radius
    seps = jnp.where(idx < nv, seps, _BIG)
    i1 = jnp.argmin(seps)
    s1 = seps[i1]
    seps2 = jnp.where(idx == i1, _BIG, seps)
    i2 = jnp.argmin(seps2)
    s2 = seps2[i2]
    p1 = wverts[i1] - wall_n * radius
    p2 = wverts[i2] - wall_n * radius
    points = jnp.stack([p1, p2])
    dists = jnp.stack([s1, s2])
    valids = dists < 0.0
    return points, wall_n, dists, valids
