"""MatchRegions: push blocks of the goal's colour into the goal region.

Reference: /root/reference/magical/benchmarks/match_regions.py
Block slot layout (fixed, masked by traced counts):
  slots 0-1: target blocks, slots 2+g*2+k: distractor group g in colour
  order (the three non-target colours, entities.py SHAPE_COLOURS order).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu.tasks import base as B
from magical_tpu.tasks import randomize as R
from magical_tpu.core.state import make_initial_state, N_ROBOT_BODIES

MAX_BLOCKS = 8
MAX_GOALS = 1
EP_LEN = 120

ROBOT_POSE = ((-0.5, 0.1), -math.pi * 1.2)
GOAL_XYHW = (0.1, 0.7, 0.7, 0.6)          # x, y top-left, h, w

ST = C.ShapeType
# default slot tables (match_regions.py:80-99)
DEFAULT_SHAPES = np.array([ST.STAR, ST.SQUARE, ST.SQUARE, ST.SQUARE,
                           ST.PENTAGON, ST.SQUARE, ST.CIRCLE, ST.PENTAGON],
                          np.int32)
DEFAULT_POSES = np.array([
    (0.8, -0.7), (-0.68, 0.72),
    (0, 0), (0, 0),
    (-0.05, -0.2), (0, 0),
    (-0.75, -0.55), (0.3, -0.82)], np.float32)
DEFAULT_ANGLES = np.array([2.37, 1.28, 0, 0, -1.09, 0, 2.78, -1.15],
                          np.float32)
DEFAULT_T_COUNT = 2
DEFAULT_D_COUNTS = np.array([0, 1, 2], np.int32)

VARIANTS = B.FULL_VARIANTS
VARIANT_FLAGS = B.FULL_VARIANT_FLAGS


def _distractor_colours(target):
    """The three non-target colour codes in enum order
    (match_regions.py:56-58)."""
    all4 = jnp.arange(4, dtype=jnp.int32)
    key = jnp.where(all4 == target, 99, all4)
    order = jnp.argsort(key)
    return jnp.asarray(order[:3], jnp.int32)


def _slot_masks(t_count, d_counts):
    """(8,) active mask from traced counts."""
    slot = jnp.arange(MAX_BLOCKS)
    is_target = slot < 2
    tgt_active = slot < t_count
    g = (slot - 2) // 2
    k = (slot - 2) % 2
    dis_active = k < d_counts[jnp.clip(g, 0, 2)]
    return jnp.where(is_target, tgt_active, dis_active), is_target


def reset(key, flags: B.Flags):
    ks = jax.random.split(key, 10)
    state = make_initial_state(MAX_BLOCKS, MAX_GOALS)
    state = state.replace(phys=B.sample_phys(ks[0], flags))

    target_colour = jnp.int32(C.ShapeColour.GREEN)
    if flags.colour:
        target_colour = B.choice(ks[1], C.RAND_SHAPE_COLOURS)
    dcols = _distractor_colours(target_colour)

    h = jnp.float32(GOAL_XYHW[2])
    w = jnp.float32(GOAL_XYHW[3])
    if flags.any_layout:
        bound = C.JITTER_TARGET_BOUND if flags.layout_minor else None
        h, w = R.randomise_hw(ks[2], C.RAND_GOAL_MIN_SIZE,
                              C.RAND_GOAL_MAX_SIZE, current_hw=(h, w),
                              linf_bound=bound)
    goal_c = jnp.stack([GOAL_XYHW[0] + w / 2.0, GOAL_XYHW[1] - h / 2.0])

    if flags.count:
        t_count = jax.random.randint(ks[3], (), 1, 3)
        d_counts = jax.random.randint(ks[4], (3,), 0, 3)
    else:
        t_count = jnp.int32(DEFAULT_T_COUNT)
        d_counts = jnp.asarray(DEFAULT_D_COUNTS)
    active, is_target = _slot_masks(t_count, d_counts)

    if flags.shape:
        shapes = B.choice(ks[5], C.RAND_SHAPE_TYPES, (MAX_BLOCKS,))
    else:
        shapes = jnp.asarray(DEFAULT_SHAPES)

    slot = jnp.arange(MAX_BLOCKS)
    g = jnp.clip((slot - 2) // 2, 0, 2)
    colours = jnp.where(is_target, target_colour, dcols[g])

    poses = jnp.asarray(DEFAULT_POSES)
    angles = jnp.asarray(DEFAULT_ANGLES)
    robot_pos = jnp.asarray(ROBOT_POSE[0], jnp.float32)
    robot_ang = jnp.float32(ROBOT_POSE[1])

    if flags.any_layout:
        pos_lim, rot_lim = B.jitter_limits(flags)
        # order per match_regions.py:168-188: sensor, robot, blocks;
        # goal rotation never randomised
        stack = B.Stack(2 + MAX_BLOCKS)
        gg = R.goal_placement_geom(h, w)
        goal_c, _, ok = R.place_entity(
            ks[6], gg, goal_c, jnp.float32(0.0), stack.placed(), stack.mask,
            rand_rot=False, pos_linf_limit=pos_lim)
        stack.put(0, gg, goal_c, jnp.float32(0.0), ok=ok)
        rg = B.robot_geom()
        robot_pos, robot_ang, ok = R.place_entity(
            ks[7], rg, robot_pos, robot_ang, stack.placed(), stack.mask,
            pos_linf_limit=pos_lim, rot_limit=rot_lim)
        stack.put(1, rg, robot_pos, robot_ang, ok=ok)
        bkeys = jax.random.split(ks[8], MAX_BLOCKS)
        new_p, new_a = [], []
        for i in range(MAX_BLOCKS):
            bg = R.block_placement_geom(shapes[i])
            p, a, ok = R.place_entity(
                bkeys[i], bg, poses[i], angles[i], stack.placed(), stack.mask,
                pos_linf_limit=pos_lim, rot_limit=rot_lim)
            stack.put(2 + i, bg, p, a, present=active[i], ok=ok)
            new_p.append(p)
            new_a.append(a)
        poses = jnp.stack(new_p)
        angles = jnp.stack(new_a)
        state = state.replace(place_fail=stack.fails)

    state = B.set_blocks(state, shapes, colours, poses, angles, active)
    cxcyhw = jnp.stack([goal_c[0], goal_c[1], h, w])[None, :]
    state = B.set_goals(state, cxcyhw, target_colour[None],
                        jnp.ones((1,), bool))
    state = B.finalize_robot(state, robot_pos, robot_ang)
    return state


def score(state):
    """match_regions.py:193-213 — target_frac_done * (1 - contamination)."""
    bp = state.pos[N_ROBOT_BODIES:, :]                      # (MB, 2)
    inside = B.com_in_goal(bp, state.goal_xyhw[0]) & state.block_active
    target = state.block_active & (state.block_colour == state.goal_colour[0])
    n_t = jnp.sum(target & inside).astype(jnp.float32)
    n_d = jnp.sum(inside & ~target).astype(jnp.float32)
    n_in = n_t + n_d
    n_targets = jnp.maximum(jnp.sum(target).astype(jnp.float32), 1.0)
    frac = n_t / n_targets
    contam = jnp.where(n_in > 0, n_d / jnp.maximum(n_in, 1.0), 0.0)
    return frac * (1.0 - contam)


TASK = B.TaskDef(
    name='MatchRegions', max_blocks=MAX_BLOCKS, max_goals=MAX_GOALS,
    ep_len=EP_LEN, variants=VARIANTS, variant_flags=VARIANT_FLAGS,
    reset_fn=reset, score_fn=score,
    default_shapes=tuple(int(s) for s in DEFAULT_SHAPES),
    default_active=(True, True, False, False, True, False, True, True))
