"""MoveToCorner: push the block to the top-left corner.

Reference: /root/reference/magical/benchmarks/move_to_corner.py
Variants registered in benchmarks/__init__.py:406-451 (no TestLayout or
TestCountPlus for this task, README.md parity).
"""

import math

import jax
import jax.numpy as jnp

from magical_tpu import constants as C
from magical_tpu.tasks import base as B
from magical_tpu.tasks import randomize as R
from magical_tpu.core.state import make_initial_state

MAX_BLOCKS = 1
MAX_GOALS = 1          # unused (kept >=1 for static-shape friendliness)
EP_LEN = 80

ROBOT_POSE = ((0.4, 0.0), 0.55 * math.pi)
BLOCK_POSE = ((0.1, -0.65), 0.13 * math.pi)

VARIANTS = ('Demo', 'TestJitter', 'TestColour', 'TestShape', 'TestDynamics',
            'TestAll')
VARIANT_FLAGS = {
    'Demo': B.Flags(),
    'TestJitter': B.Flags(layout_minor=True),
    'TestColour': B.Flags(colour=True),
    'TestShape': B.Flags(shape=True),
    'TestDynamics': B.Flags(dynamics=True),
    # TestAll uses jitter-level pose randomisation (rand_poses) per
    # benchmarks/__init__.py:444-450
    'TestAll': B.Flags(colour=True, shape=True, layout_minor=True,
                       dynamics=True),
}


def reset(key, flags: B.Flags):
    k_phys, k_col, k_shape, k_rob, k_blk = jax.random.split(key, 5)
    state = make_initial_state(MAX_BLOCKS, MAX_GOALS)
    state = state.replace(phys=B.sample_phys(k_phys, flags))

    colour = jnp.int32(C.ShapeColour.RED)
    shape = jnp.int32(C.ShapeType.SQUARE)
    if flags.colour:
        colour = B.choice(k_col, C.RAND_SHAPE_COLOURS)
    if flags.shape:
        shape = B.choice(k_shape, C.RAND_SHAPE_TYPES)

    robot_pos = jnp.asarray(ROBOT_POSE[0], jnp.float32)
    robot_ang = jnp.float32(ROBOT_POSE[1])
    block_pos = jnp.asarray(BLOCK_POSE[0], jnp.float32)
    block_ang = jnp.float32(BLOCK_POSE[1])

    if flags.any_layout:
        pos_lim, rot_lim = B.jitter_limits(flags)
        stack = B.Stack(2)
        rg = B.robot_geom()
        # order matches move_to_corner.py:57-64: robot first, then shape
        robot_pos, robot_ang, ok = R.place_entity(
            k_rob, rg, robot_pos, robot_ang, stack.placed(), stack.mask,
            pos_linf_limit=pos_lim, rot_limit=rot_lim)
        stack.put(0, rg, robot_pos, robot_ang, ok=ok)
        bg = R.block_placement_geom(shape)
        block_pos, block_ang, ok = R.place_entity(
            k_blk, bg, block_pos, block_ang, stack.placed(), stack.mask,
            pos_linf_limit=pos_lim, rot_limit=rot_lim)
        stack.put(1, bg, block_pos, block_ang, ok=ok)
        state = state.replace(place_fail=stack.fails)

    state = B.set_blocks(state, shape[None], colour[None],
                         block_pos[None], block_ang[None],
                         jnp.ones((1,), bool))
    state = B.finalize_robot(state, robot_pos, robot_ang)
    return state


def score(state):
    """move_to_corner.py:66-75 — linear ramp on block distance to (-1, 1)."""
    p = state.pos[..., 5, :]
    dist = jnp.linalg.norm(jnp.asarray([-1.0, 1.0]) - p, axis=-1)
    succeed = math.sqrt(2) / 2
    furthest = math.sqrt(2)
    return jnp.clip((furthest - dist) / (furthest - succeed), 0.0, 1.0)


def debug_shaped_reward(state):
    """move_to_corner.py:84-98 — dense debug reward for RL sanity checks."""
    shape_pos = state.pos[..., 5, :]
    robot_pos = state.pos[..., 0, :]
    corner = jnp.asarray([0.0, 1.0])
    s2c = jnp.linalg.norm(shape_pos - corner, axis=-1)
    r2s = jnp.linalg.norm(robot_pos - shape_pos, axis=-1)
    shaping = -s2c / 5.0 - jnp.maximum(r2s, 0.2) / 20.0
    return shaping + score(state)


TASK = B.TaskDef(
    name='MoveToCorner', max_blocks=MAX_BLOCKS, max_goals=MAX_GOALS,
    ep_len=EP_LEN, variants=VARIANTS, variant_flags=VARIANT_FLAGS,
    reset_fn=reset, score_fn=score,
    default_shapes=(int(C.ShapeType.SQUARE),), default_active=(True,))
