"""MakeLine: arrange all blocks into a straight line.

Reference: /root/reference/magical/benchmarks/make_line.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu.tasks import base as B
from magical_tpu.tasks import randomize as R
from magical_tpu.core.state import make_initial_state, N_ROBOT_BODIES

MAX_BLOCKS = 4
MAX_GOALS = 1      # unused
EP_LEN = 180
MIN_BLOCKS = 3

INLIER_DIST = C.SHAPE_RAD * 1.5     # make_line.py:10,90
MAX_SEP = C.SHAPE_RAD * 3.5         # make_line.py:11,91

ROBOT_POSE = ((0.702, -0.255), 0.347)
SC = C.ShapeColour
ST = C.ShapeType
DEFAULT_COLOURS = np.array([SC.BLUE, SC.YELLOW, SC.RED, SC.GREEN], np.int32)
DEFAULT_SHAPES = np.array([ST.STAR, ST.CIRCLE, ST.STAR, ST.PENTAGON],
                          np.int32)
DEFAULT_POSES = np.array([(0.790, -0.820), (-0.177, 0.383),
                          (-0.051, -0.128), (-0.292, -0.745)], np.float32)
DEFAULT_ANGLES = np.array([-0.721, -1.733, 2.696, -0.159], np.float32)

VARIANTS = B.FULL_VARIANTS
VARIANT_FLAGS = B.FULL_VARIANT_FLAGS


def reset(key, flags: B.Flags):
    ks = jax.random.split(key, 6)
    state = make_initial_state(MAX_BLOCKS, MAX_GOALS)
    state = state.replace(phys=B.sample_phys(ks[0], flags))

    if flags.count:
        n = jax.random.randint(ks[1], (), MIN_BLOCKS, MAX_BLOCKS + 1)
    else:
        n = jnp.int32(MAX_BLOCKS)
    active = jnp.arange(MAX_BLOCKS) < n

    colours = jnp.asarray(DEFAULT_COLOURS)
    shapes = jnp.asarray(DEFAULT_SHAPES)
    if flags.colour:
        colours = B.choice(ks[2], C.RAND_SHAPE_COLOURS, (MAX_BLOCKS,))
    if flags.shape:
        shapes = B.choice(ks[3], C.RAND_SHAPE_TYPES, (MAX_BLOCKS,))

    poses = jnp.asarray(DEFAULT_POSES)
    angles = jnp.asarray(DEFAULT_ANGLES)
    robot_pos = jnp.asarray(ROBOT_POSE[0], jnp.float32)
    robot_ang = jnp.float32(ROBOT_POSE[1])

    if flags.any_layout:
        pos_lim, rot_lim = B.jitter_limits(flags)
        # order per make_line.py:124-140: robot first, then blocks
        stack = B.Stack(1 + MAX_BLOCKS)
        rg = B.robot_geom()
        robot_pos, robot_ang, ok = R.place_entity(
            ks[4], rg, robot_pos, robot_ang, stack.placed(), stack.mask,
            pos_linf_limit=pos_lim, rot_limit=rot_lim)
        stack.put(0, rg, robot_pos, robot_ang, ok=ok)
        bkeys = jax.random.split(ks[5], MAX_BLOCKS)
        new_p, new_a = [], []
        for i in range(MAX_BLOCKS):
            bg = R.block_placement_geom(shapes[i])
            p, a, ok = R.place_entity(
                bkeys[i], bg, poses[i], angles[i], stack.placed(), stack.mask,
                pos_linf_limit=pos_lim, rot_limit=rot_lim)
            stack.put(1 + i, bg, p, a, present=active[i], ok=ok)
            new_p.append(p)
            new_a.append(a)
        poses = jnp.stack(new_p)
        angles = jnp.stack(new_a)
        state = state.replace(place_fail=stack.fails)

    state = B.set_blocks(state, shapes, colours, poses, angles, active)
    state = B.finalize_robot(state, robot_pos, robot_ang)
    return state


def longest_line(points, active, inlier_dist=INLIER_DIST, max_sep=MAX_SEP):
    """make_line.py:31-71 — exhaustive pairwise RANSAC with an adjacency
    (max separation) constraint, vectorised over the fixed MAX_BLOCKS slots
    with an active mask."""
    mb = points.shape[0]
    npts = jnp.sum(active).astype(jnp.int32)
    best0 = jnp.minimum(1, npts)

    def pair_best(i, j):
        pi = points[i]
        offs = points - pi
        pj_off = offs[j]
        norm = jnp.maximum(jnp.linalg.norm(pj_off), 1e-9)
        u = pj_off / norm
        proj = offs @ u
        dists = jnp.linalg.norm(offs - proj[:, None] * u[None, :], axis=-1)
        inlier = (dists <= inlier_dist) & active
        # sort projections of inliers (non-inliers pushed to +inf)
        vals = jnp.where(inlier, proj, jnp.inf)
        svals = jnp.sort(vals)
        m = jnp.sum(inlier)
        seps = jnp.abs(jnp.diff(svals))
        sep_ok = (seps <= max_sep) & \
            (jnp.arange(mb - 1) < m - 1)
        # longest run of consecutive True, +1
        def run_step(carry, ok):
            run, bst = carry
            run = jnp.where(ok, run + 1, 0)
            return (run, jnp.maximum(bst, run)), None
        (_, longest), _ = jax.lax.scan(run_step, (jnp.int32(0), jnp.int32(0)),
                                       sep_ok)
        max_run = longest + 1
        pair_valid = active[i] & active[j]
        return jnp.where(pair_valid, max_run, 0)

    ii, jj = np.triu_indices(mb, k=1)
    bests = jax.vmap(pair_best)(jnp.asarray(ii), jnp.asarray(jj))
    return jnp.maximum(best0, jnp.max(bests))


def score(state):
    """make_line.py:142-152 — 0 outliers -> 1, 1 outlier -> 0.5, 2+ -> 0."""
    pts = state.pos[N_ROBOT_BODIES:, :]
    active = state.block_active
    line_len = longest_line(pts, active)
    n = jnp.sum(active).astype(jnp.int32)
    min_len = jnp.maximum(n - 2, 2)
    denom = jnp.maximum(n - min_len, 1)
    return jnp.clip((line_len - min_len).astype(jnp.float32)
                    / denom.astype(jnp.float32), 0.0, 1.0)


TASK = B.TaskDef(
    name='MakeLine', max_blocks=MAX_BLOCKS, max_goals=MAX_GOALS,
    ep_len=EP_LEN, variants=VARIANTS, variant_flags=VARIANT_FLAGS,
    reset_fn=reset, score_fn=score,
    default_shapes=tuple(int(s) for s in DEFAULT_SHAPES),
    default_active=(True,) * MAX_BLOCKS)
