"""FindDupe: fetch a duplicate of the query block into the goal region.

Reference: /root/reference/magical/benchmarks/find_dupe.py
Block slot layout: slots 0..5 = outside blocks (slot n_out-1 is the
guaranteed duplicate of the query), slot 6 = the query block pre-placed
inside the goal region.
"""

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu.tasks import base as B
from magical_tpu.tasks import randomize as R
from magical_tpu.core.state import make_initial_state, N_ROBOT_BODIES

MAX_OUT = 6
MAX_BLOCKS = MAX_OUT + 1
QUERY_SLOT = MAX_OUT
MAX_GOALS = 1
EP_LEN = 100

SC = C.ShapeColour
ST = C.ShapeType
DEFAULT_QUERY_COLOUR = SC.YELLOW
DEFAULT_QUERY_SHAPE = ST.PENTAGON
DEFAULT_OUT_SHAPES = np.array(
    [ST.PENTAGON, ST.CIRCLE, ST.CIRCLE, ST.SQUARE, ST.STAR,
     DEFAULT_QUERY_SHAPE], np.int32)
DEFAULT_OUT_COLOURS = np.array(
    [SC.GREEN, SC.RED, SC.RED, SC.YELLOW, SC.BLUE, DEFAULT_QUERY_COLOUR],
    np.int32)
DEFAULT_OUT_POSES = np.array([
    (-0.066751, 0.7552), (-0.05195, 0.31468), (0.57528, -0.46865),
    (0.40594, -0.74977), (0.45254, 0.3681), (0.76849, -0.10652)], np.float32)
DEFAULT_OUT_ANGLES = np.array(
    [-2.9266, 1.5418, -2.2141, 0.24582, -1.0834, 0.10028], np.float32)
DEFAULT_ROBOT_POSE = ((-0.57, 0.25), 3.83)
DEFAULT_REGION_XYHW = (-0.72, -0.22, 0.67, 0.72)
DEFAULT_QUERY_POSE = ((-0.33, -0.49), -0.51)

VARIANTS = B.FULL_VARIANTS
VARIANT_FLAGS = B.FULL_VARIANT_FLAGS


def reset(key, flags: B.Flags):
    ks = jax.random.split(key, 12)
    state = make_initial_state(MAX_BLOCKS, MAX_GOALS)
    state = state.replace(phys=B.sample_phys(ks[0], flags))

    if flags.count:
        # find_dupe.py:84-88: 1-5 random blocks + 1 guaranteed duplicate
        n_out = jax.random.randint(ks[1], (), 1, 6) + 1
    else:
        n_out = jnp.int32(MAX_OUT)
    slot = jnp.arange(MAX_BLOCKS)
    active = (slot < n_out) | (slot == QUERY_SLOT)

    q_colour = jnp.int32(DEFAULT_QUERY_COLOUR)
    q_shape = jnp.int32(DEFAULT_QUERY_SHAPE)
    colours = jnp.concatenate([jnp.asarray(DEFAULT_OUT_COLOURS),
                               jnp.asarray([DEFAULT_QUERY_COLOUR], jnp.int32)])
    shapes = jnp.concatenate([jnp.asarray(DEFAULT_OUT_SHAPES),
                              jnp.asarray([DEFAULT_QUERY_SHAPE], jnp.int32)])
    if flags.colour:
        q_colour = B.choice(ks[2], C.RAND_SHAPE_COLOURS)
        rand_cols = B.choice(ks[3], C.RAND_SHAPE_COLOURS, (MAX_BLOCKS,))
        colours = jnp.where((slot == n_out - 1) | (slot == QUERY_SLOT),
                            q_colour, rand_cols)
    if flags.shape:
        q_shape = B.choice(ks[4], C.RAND_SHAPE_TYPES)
        rand_shapes = B.choice(ks[5], C.RAND_SHAPE_TYPES, (MAX_BLOCKS,))
        shapes = jnp.where((slot == n_out - 1) | (slot == QUERY_SLOT),
                           q_shape, rand_shapes)
    else:
        q_shape = shapes[QUERY_SLOT]
    q_colour = colours[QUERY_SLOT]

    # goal region (find_dupe.py:103-117) — coloured like the query block
    x, y, h0, w0 = DEFAULT_REGION_XYHW
    h = jnp.float32(h0)
    w = jnp.float32(w0)
    if flags.any_layout:
        bound = C.JITTER_TARGET_BOUND if flags.layout_minor else None
        h, w = R.randomise_hw(ks[6], C.RAND_GOAL_MIN_SIZE,
                              C.RAND_GOAL_MAX_SIZE, current_hw=(h, w),
                              linf_bound=bound)
    goal_c = jnp.stack([x + w / 2.0, y - h / 2.0])

    poses = jnp.concatenate(
        [jnp.asarray(DEFAULT_OUT_POSES),
         jnp.asarray([DEFAULT_QUERY_POSE[0]], jnp.float32)])
    angles = jnp.concatenate(
        [jnp.asarray(DEFAULT_OUT_ANGLES),
         jnp.asarray([DEFAULT_QUERY_POSE[1]], jnp.float32)])
    robot_pos = jnp.asarray(DEFAULT_ROBOT_POSE[0], jnp.float32)
    robot_ang = jnp.float32(DEFAULT_ROBOT_POSE[1])

    if flags.any_layout:
        pos_lim, rot_lim = B.jitter_limits(flags)
        # order per find_dupe.py:157-178: sensor, robot, outside blocks
        # (query ignored); then the query block inside the sensor.
        stack = B.Stack(2 + MAX_BLOCKS)
        gg = R.goal_placement_geom(h, w)
        goal_c, _, ok = R.place_entity(
            ks[7], gg, goal_c, jnp.float32(0.0), stack.placed(), stack.mask,
            rand_rot=False, pos_linf_limit=pos_lim)
        stack.put(0, gg, goal_c, jnp.float32(0.0), ok=ok)
        rg = B.robot_geom()
        robot_pos, robot_ang, ok = R.place_entity(
            ks[8], rg, robot_pos, robot_ang, stack.placed(), stack.mask,
            pos_linf_limit=pos_lim, rot_limit=rot_lim)
        stack.put(1, rg, robot_pos, robot_ang, ok=ok)
        bkeys = jax.random.split(ks[9], MAX_OUT)
        new_p, new_a = [], []
        for i in range(MAX_OUT):
            bg = R.block_placement_geom(shapes[i])
            p, a, ok = R.place_entity(
                bkeys[i], bg, poses[i], angles[i], stack.placed(), stack.mask,
                pos_linf_limit=pos_lim, rot_limit=rot_lim)
            stack.put(2 + i, bg, p, a, present=active[i], ok=ok)
            new_p.append(p)
            new_a.append(a)

        # query block: shifted to the sensor centre then placed within it,
        # ignoring the sensor itself (find_dupe.py:180-198)
        q_lim = jnp.maximum(0.0, jnp.minimum(h, w) / 2.0 - C.SHAPE_RAD / 2.0)
        if flags.layout_minor:
            q_lim = jnp.minimum(C.JITTER_POS_BOUND, q_lim)
        qg = R.block_placement_geom(shapes[QUERY_SLOT])
        qmask = stack.mask_without(0)        # ignore the sensor
        qp, qa, ok = R.place_entity(
            ks[10], qg, goal_c, angles[QUERY_SLOT], stack.placed(), qmask,
            pos_linf_limit=q_lim, rot_limit=rot_lim)
        stack.fails = stack.fails + (~ok).astype(jnp.int32)
        new_p.append(qp)
        new_a.append(qa)
        poses = jnp.stack(new_p)
        angles = jnp.stack(new_a)
        state = state.replace(place_fail=stack.fails)

    state = B.set_blocks(state, shapes, colours, poses, angles, active)
    cxcyhw = jnp.stack([goal_c[0], goal_c[1], h, w])[None, :]
    state = B.set_goals(state, cxcyhw, q_colour[None], jnp.ones((1,), bool))
    state = B.finalize_robot(state, robot_pos, robot_ang)
    # aux[0] records the query slot's colour/shape implicitly via arrays;
    # nothing else needed
    return state


def score(state):
    """find_dupe.py:203-216 — 1[>=2 matching blocks in region] * (1 -
    contamination)."""
    bp = state.pos[N_ROBOT_BODIES:, :]
    inside = B.com_in_goal(bp, state.goal_xyhw[0]) & state.block_active
    q_colour = state.block_colour[QUERY_SLOT]
    q_shape = state.block_shape[QUERY_SLOT]
    target = state.block_active & (state.block_colour == q_colour) & \
        (state.block_shape == q_shape)
    n_t = jnp.sum(target & inside).astype(jnp.float32)
    n_d = jnp.sum(inside & ~target).astype(jnp.float32)
    n_in = n_t + n_d
    have_two = (n_t >= 2).astype(jnp.float32)
    contam = jnp.where(n_in > 0, n_d / jnp.maximum(n_in, 1.0), 0.0)
    return have_two * (1.0 - contam)


TASK = B.TaskDef(
    name='FindDupe', max_blocks=MAX_BLOCKS, max_goals=MAX_GOALS,
    ep_len=EP_LEN, variants=VARIANTS, variant_flags=VARIANT_FLAGS,
    reset_fn=reset, score_fn=score,
    default_shapes=tuple(int(s) for s in DEFAULT_OUT_SHAPES)
    + (int(DEFAULT_QUERY_SHAPE),),
    default_active=(True,) * MAX_BLOCKS)
