"""On-device layout randomisation.

The reference randomises entity poses by rejection sampling against the
live pymunk space (geom.py:116-341: up to 10k serial tries, collisions
checked with space.shape_query).  The TPU-native equivalent draws a fixed
batch of pose proposals per entity with the threefry PRNG, evaluates all
of them against the already-placed entities with a vectorised SAT overlap
test, and takes the first acceptable one — bounded work, no data-
dependent control flow, vmappable over envs.

Entity geometry for placement is uniform: every placeable entity (robot,
block, goal region) is up to ``KSUB`` convex sub-shapes with an outset
radius, expressed in the entity's local frame.  Goal region sensor shapes
participate in overlap tests exactly like the reference's shape_query
(sensors are returned by space.shape_query, so e.g. the robot is never
placed overlapping a goal region during layout randomisation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu import geometry as G
from magical_tpu.core import collision as col

NV = G.NV
KSUB = G.KSUB
N_TRIES = 128          # proposals evaluated per entity placement
_BIG = 1e9


# ---------------------------------------------------------------------------
# Placement geometry builders
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def robot_placement_geom():
    """Robot as KSUB sub-shapes in the *robot body* frame, with fingers at
    their canonical reset offsets (entities.py:307-331): body circle + 4
    finger boxes."""
    verts = np.zeros((KSUB, NV, 2), np.float32)
    radius = np.zeros((KSUB,), np.float32)
    nv = np.ones((KSUB,), np.int32)
    active = np.zeros((KSUB,), bool)
    # body circle
    radius[0] = C.ROBOT_RAD
    active[0] = True
    rg = G.ROBOT_GEOM
    s = 1
    for side in range(2):
        delta = rg['finger_init_delta'][side]
        rel = rg['finger_rel_pos'][side]
        cd, sd = np.cos(delta), np.sin(delta)
        R = np.array([[cd, -sd], [sd, cd]], np.float32)
        for k in range(2):
            poly = rg['finger_polys'][side, k] @ R.T + rel
            verts[s, :4] = poly
            verts[s, 4:] = poly[-1]
            nv[s] = 4
            active[s] = True
            s += 1
    return verts, radius, nv, active


def goal_placement_geom(h, w):
    """Goal region sensor box as a 1-sub-shape entity (entities.py:794-798).
    h, w may be traced scalars."""
    hw = jnp.stack([w / 2, h / 2])
    box = jnp.stack([hw * jnp.asarray([1, 1], jnp.float32),
                     hw * jnp.asarray([-1, 1], jnp.float32),
                     hw * jnp.asarray([-1, -1], jnp.float32),
                     hw * jnp.asarray([1, -1], jnp.float32)])
    verts = jnp.zeros((KSUB, NV, 2), jnp.float32)
    verts = verts.at[0, :4].set(box)
    verts = verts.at[0, 4:].set(box[3])
    radius = jnp.zeros((KSUB,), jnp.float32)
    nv = jnp.ones((KSUB,), jnp.int32).at[0].set(4)
    active = jnp.zeros((KSUB,), bool).at[0].set(True)
    return verts, radius, nv, active


def block_placement_geom(shape_code):
    """Block as its KSUB convex parts, gathered by (traced) type code."""
    verts = jnp.asarray(G.BLOCK_VERTS)[shape_code]
    radius = jnp.asarray(G.BLOCK_SUB_RADIUS)[shape_code]
    nv = jnp.asarray(G.BLOCK_SUB_NV)[shape_code]
    active = jnp.asarray(G.BLOCK_SUB_ACTIVE)[shape_code]
    return verts, radius, nv, active


# ---------------------------------------------------------------------------
# SAT overlap test between convex sub-shapes
# ---------------------------------------------------------------------------

def _sat_overlap(va, nva, ra, vb, nvb, rb):
    """Boolean overlap between two convex padded polys (world frame),
    handling the 1-vertex circle case via closest-point distance."""
    a_circ = nva == 1
    b_circ = nvb == 1
    rsum = ra + rb

    # circle-circle
    cc = jnp.linalg.norm(vb[0] - va[0]) < rsum
    # circle-poly (either order)
    _, _, d_ab = col.circle_poly(va[0], ra, vb, nvb, rb)
    _, _, d_ba = col.circle_poly(vb[0], rb, va, nva, ra)
    # poly-poly SAT (exact for convex)
    a0, _, an, avalid = col._poly_edges(va, nva)
    b0, _, bn, bvalid = col._poly_edges(vb, nvb)
    sepA = jnp.min(jnp.einsum('fi,vi->fv', an, vb), 1) \
        - jnp.einsum('fi,fi->f', an, a0)
    sepB = jnp.min(jnp.einsum('fi,vi->fv', bn, va), 1) \
        - jnp.einsum('fi,fi->f', bn, b0)
    sep = jnp.maximum(jnp.max(jnp.where(avalid, sepA, -_BIG)),
                      jnp.max(jnp.where(bvalid, sepB, -_BIG)))
    pp = sep < rsum

    return jnp.where(a_circ & b_circ, cc,
                     jnp.where(a_circ, d_ab < 0,
                               jnp.where(b_circ, d_ba < 0, pp)))


# overlap between one proposal entity (KSUB subshapes) and one placed
# entity (KSUB subshapes): any-pair overlap
def _entity_overlap(verts_a, rad_a, nv_a, act_a, verts_b, rad_b, nv_b, act_b):
    def one_pair(i, j):
        return (_sat_overlap(verts_a[i], nv_a[i], rad_a[i],
                             verts_b[j], nv_b[j], rad_b[j])
                & act_a[i] & act_b[j])
    ii, jj = np.meshgrid(np.arange(KSUB), np.arange(KSUB), indexing='ij')
    flat = jax.vmap(one_pair)(ii.ravel(), jj.ravel())
    return jnp.any(flat)


def _inside_arena(verts, rad, nv, act):
    """True if the entity (world frame) does not overlap any arena wall."""
    idx = jnp.arange(NV)
    vmask = (idx[None, :] < nv[:, None]) & act[:, None]   # (KSUB, NV)
    seps = jnp.einsum('kvi,wi->kvw', verts, jnp.asarray(col.WALL_NORMALS)) \
        - jnp.asarray(col.WALL_OFFSETS)[None, None, :] - rad[:, None, None]
    ok = jnp.where(vmask[..., None], seps, _BIG) > 0.0
    return jnp.all(ok)


# ---------------------------------------------------------------------------
# The placement primitive
# ---------------------------------------------------------------------------

def transform_entity(geom, pos, angle):
    verts, rad, nv, act = geom
    w = col.transform_verts(verts, jnp.broadcast_to(pos, verts.shape[:1] +
                                                    (2,)),
                            jnp.broadcast_to(angle, verts.shape[:1]))
    return w, rad, nv, act


def place_entity(key, ent_geom, cur_pos, cur_angle, placed, placed_mask,
                 rand_pos=True, rand_rot=True,
                 pos_linf_limit=None, rot_limit=None,
                 n_tries=N_TRIES):
    """Sample a non-colliding pose for one entity (pm_randomise_pose,
    geom.py:116-264).

    Args:
      ent_geom: (verts (KSUB,NV,2), rad, nv, act) in entity local frame.
      cur_pos/cur_angle: current pose (centre of the jitter box).
      placed: tuple of world-frame arrays (E,KSUB,NV,2), (E,KSUB) rad/nv/act
        for already-placed entities.
      placed_mask: (E,) bool — which rows of `placed` to collide against
        (False rows are ignored, covering both "not yet placed" and the
        reference's ignore_shapes parameter).

    Returns (pos, angle, ok)."""
    arena_l, arena_r, arena_b, arena_t = C.ARENA_BOUNDS_LRBT
    if pos_linf_limit is not None:
        x_lo = jnp.maximum(arena_l, cur_pos[0] - pos_linf_limit)
        x_hi = jnp.minimum(arena_r, cur_pos[0] + pos_linf_limit)
        y_lo = jnp.maximum(arena_b, cur_pos[1] - pos_linf_limit)
        y_hi = jnp.minimum(arena_t, cur_pos[1] + pos_linf_limit)
    else:
        x_lo, x_hi, y_lo, y_hi = arena_l, arena_r, arena_b, arena_t
    if rot_limit is not None:
        r_lo = cur_angle - rot_limit
        r_hi = cur_angle + rot_limit
    else:
        r_lo, r_hi = -jnp.pi, jnp.pi

    kp, kr = jax.random.split(key)
    u = jax.random.uniform(kp, (n_tries, 2))
    props_pos = jnp.stack([x_lo + u[:, 0] * (x_hi - x_lo),
                           y_lo + u[:, 1] * (y_hi - y_lo)], -1)
    if not rand_pos:
        props_pos = jnp.broadcast_to(cur_pos, (n_tries, 2))
    props_ang = r_lo + jax.random.uniform(kr, (n_tries,)) * (r_hi - r_lo)
    if not rand_rot:
        props_ang = jnp.broadcast_to(cur_angle, (n_tries,))

    pverts, prad, pnv, pact = placed

    def try_one(pos, angle):
        wv, rad, nv, act = transform_entity(ent_geom, pos, angle)
        wall_ok = _inside_arena(wv, rad, nv, act)

        def against(e):
            return _entity_overlap(wv, rad, nv, act, pverts[e], prad[e],
                                   pnv[e], pact[e]) & placed_mask[e]
        hits = jax.vmap(against)(jnp.arange(pverts.shape[0]))
        return wall_ok & ~jnp.any(hits)

    ok = jax.vmap(try_one)(props_pos, props_ang)
    any_ok = jnp.any(ok)
    first = jnp.argmax(ok)
    # fall back to the final proposal if nothing fit (the reference would
    # raise PlacementError and restart; with 128 tries this is vanishingly
    # rare in these scenes)
    pick = jnp.where(any_ok, first, n_tries - 1)
    return props_pos[pick], props_ang[pick], any_ok


def randomise_hw(key, min_side, max_side, current_hw=None, linf_bound=None):
    """geom.py:344-359 — uniform goal height/width randomisation."""
    minima = jnp.asarray([min_side, min_side], jnp.float32)
    maxima = jnp.asarray([max_side, max_side], jnp.float32)
    if linf_bound is not None:
        cur = jnp.asarray(current_hw, jnp.float32)
        minima = jnp.maximum(minima, cur - linf_bound)
        maxima = jnp.minimum(maxima, cur + linf_bound)
    u = jax.random.uniform(key, (2,))
    hw = minima + u * (maxima - minima)
    return hw[0], hw[1]
