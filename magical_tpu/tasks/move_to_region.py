"""MoveToRegion: drive the robot into the goal region.

Reference: /root/reference/magical/benchmarks/move_to_region.py
"""

import jax
import jax.numpy as jnp

from magical_tpu import constants as C
from magical_tpu.tasks import base as B
from magical_tpu.tasks import randomize as R
from magical_tpu.core.state import make_initial_state

MAX_BLOCKS = 1         # no blocks in this task (slot kept inactive)
MAX_GOALS = 1
EP_LEN = 40

DEFAULT_ROBOT_POSE = ((0.058, 0.53), -2.13)
DEFAULT_GOAL_XYHW = (-0.62, -0.17, 0.76, 0.75)   # x, y top-left, h, w
DEFAULT_GOAL_COLOUR = C.ShapeColour.BLUE

VARIANTS = ('Demo', 'TestJitter', 'TestColour', 'TestLayout', 'TestDynamics',
            'TestAll')
VARIANT_FLAGS = {
    'Demo': B.Flags(),
    'TestJitter': B.Flags(layout_minor=True),
    'TestColour': B.Flags(colour=True),
    'TestLayout': B.Flags(layout_full=True),
    'TestDynamics': B.Flags(dynamics=True),
    'TestAll': B.Flags(colour=True, layout_full=True, dynamics=True),
}


def reset(key, flags: B.Flags):
    k_phys, k_hw, k_col, k_goal, k_rob = jax.random.split(key, 5)
    state = make_initial_state(MAX_BLOCKS, MAX_GOALS)
    state = state.replace(phys=B.sample_phys(k_phys, flags))

    x, y, h, w = DEFAULT_GOAL_XYHW
    h = jnp.float32(h)
    w = jnp.float32(w)
    if flags.any_layout:
        # move_to_region.py:32-45 — hw randomised before pose
        bound = C.JITTER_TARGET_BOUND if flags.layout_minor else None
        h, w = R.randomise_hw(k_hw, C.RAND_GOAL_MIN_SIZE,
                              C.RAND_GOAL_MAX_SIZE, current_hw=(h, w),
                              linf_bound=bound)
    # goal body position = centre derived from the (possibly resampled)
    # h/w with the default top-left (entities.py:797)
    goal_c = jnp.stack([x + w / 2.0, y - h / 2.0])

    colour = jnp.int32(DEFAULT_GOAL_COLOUR)
    if flags.colour:
        colour = B.choice(k_col, C.RAND_SHAPE_COLOURS)

    robot_pos = jnp.asarray(DEFAULT_ROBOT_POSE[0], jnp.float32)
    robot_ang = jnp.float32(DEFAULT_ROBOT_POSE[1])

    if flags.any_layout:
        # move_to_region.py:66-83: entities = (goal, robot); goal rotation
        # never randomised; minor => pos bound for both, rot bound robot only
        pos_lim = C.JITTER_POS_BOUND if flags.layout_minor else None
        rot_lim = C.JITTER_ROT_BOUND if flags.layout_minor else None
        stack = B.Stack(2)
        gg = R.goal_placement_geom(h, w)
        goal_c, _, ok = R.place_entity(
            k_goal, gg, goal_c, jnp.float32(0.0), stack.placed(), stack.mask,
            rand_rot=False, pos_linf_limit=pos_lim)
        stack.put(0, gg, goal_c, jnp.float32(0.0), ok=ok)
        rg = B.robot_geom()
        robot_pos, robot_ang, ok = R.place_entity(
            k_rob, rg, robot_pos, robot_ang, stack.placed(), stack.mask,
            pos_linf_limit=pos_lim, rot_limit=rot_lim)
        stack.put(1, rg, robot_pos, robot_ang, ok=ok)
        state = state.replace(place_fail=stack.fails)

    cxcyhw = jnp.stack([goal_c[0], goal_c[1], h, w])[None, :]
    state = B.set_goals(state, cxcyhw, colour[None], jnp.ones((1,), bool))
    state = B.finalize_robot(state, robot_pos, robot_ang)
    return state


def score(state):
    """move_to_region.py:85-94 — binary: robot COM inside the goal box."""
    inside = B.com_in_goal(state.pos[..., 0, :], state.goal_xyhw[..., 0, :])
    return inside.astype(jnp.float32)


TASK = B.TaskDef(
    name='MoveToRegion', max_blocks=MAX_BLOCKS, max_goals=MAX_GOALS,
    ep_len=EP_LEN, variants=VARIANTS, variant_flags=VARIANT_FLAGS,
    reset_fn=reset, score_fn=score,
    default_shapes=(int(C.ShapeType.SQUARE),), default_active=(False,))
