"""FixColour: remove the one colour-mismatched block from its region.

Reference: /root/reference/magical/benchmarks/fix_colour.py
Slot layout: region i <-> block i (index-aligned), i < n_regions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu.tasks import base as B
from magical_tpu.tasks import randomize as R
from magical_tpu.core.state import make_initial_state, N_ROBOT_BODIES

MAX_BLOCKS = 3
MAX_GOALS = 3
EP_LEN = 60
MIN_REGIONS = 2
MIN_GOAL_SIZE = 0.4     # fix_colour.py:13-14
MAX_GOAL_SIZE = 0.5

SC = C.ShapeColour
ST = C.ShapeType
DEFAULT_ROBOT_POSE = ((0.368, 0.586), 0.718)
DEFAULT_BLOCK_COLOURS = np.array([SC.GREEN, SC.GREEN, SC.BLUE], np.int32)
DEFAULT_BLOCK_SHAPES = np.array([ST.PENTAGON, ST.SQUARE, ST.PENTAGON],
                                np.int32)
DEFAULT_BLOCK_POSES = np.array(
    [(0.289, 0.030), (0.133, -0.561), (-0.336, 0.000)], np.float32)
DEFAULT_BLOCK_ANGLES = np.array([0.307, 1.699, -1.529], np.float32)
DEFAULT_REGION_XYHWS = np.array([
    (-0.032, 0.348, 0.427, 0.468),
    (0.019, -0.391, 0.460, 0.458),
    (-0.681, 0.196, 0.498, 0.418)], np.float32)
DEFAULT_REGION_COLOURS = np.array([SC.GREEN, SC.GREEN, SC.RED], np.int32)

VARIANTS = B.FULL_VARIANTS
VARIANT_FLAGS = B.FULL_VARIANT_FLAGS


def reset(key, flags: B.Flags):
    ks = jax.random.split(key, 12)
    state = make_initial_state(MAX_BLOCKS, MAX_GOALS)
    state = state.replace(phys=B.sample_phys(ks[0], flags))

    if flags.count:
        n = jax.random.randint(ks[1], (), MIN_REGIONS, MAX_GOALS + 1)
    else:
        n = jnp.int32(MAX_GOALS)
    slot = jnp.arange(MAX_BLOCKS)
    active = slot < n

    region_colours = jnp.asarray(DEFAULT_REGION_COLOURS)
    block_colours = jnp.asarray(DEFAULT_BLOCK_COLOURS)
    if flags.colour:
        # fix_colour.py:85-94: regions random; one block is the odd one out
        region_colours = B.choice(ks[2], C.RAND_SHAPE_COLOURS, (MAX_BLOCKS,))
        odd_idx = jax.random.randint(ks[3], (), 0, n)
        new_col_idx = jax.random.randint(ks[4], (), 0, 3)
        new_col_idx = jnp.where(
            new_col_idx == region_colours[odd_idx], new_col_idx + 1,
            new_col_idx)
        block_colours = region_colours.at[odd_idx].set(new_col_idx)

    shapes = jnp.asarray(DEFAULT_BLOCK_SHAPES)
    if flags.shape:
        shapes = B.choice(ks[5], C.RAND_SHAPE_TYPES, (MAX_BLOCKS,))

    xyhws = jnp.asarray(DEFAULT_REGION_XYHWS)
    if flags.count:
        # fix_colour.py:80-82: counts reuse the first default entry
        xyhws = jnp.broadcast_to(xyhws[0], (MAX_GOALS, 4)).copy()
    hws = xyhws[:, 2:]
    if flags.any_layout:
        bound = C.JITTER_TARGET_BOUND if flags.layout_minor else None
        hwkeys = jax.random.split(ks[6], MAX_GOALS)
        hs, wlist = [], []
        for i in range(MAX_GOALS):
            h, w = R.randomise_hw(hwkeys[i], MIN_GOAL_SIZE, MAX_GOAL_SIZE,
                                  current_hw=hws[i], linf_bound=bound)
            hs.append(h)
            wlist.append(w)
        hws = jnp.stack([jnp.stack(hs), jnp.stack(wlist)], -1)
    goal_c = jnp.stack([xyhws[:, 0] + hws[:, 1] / 2.0,
                        xyhws[:, 1] - hws[:, 0] / 2.0], -1)   # (MG, 2)

    poses = jnp.asarray(DEFAULT_BLOCK_POSES)
    angles = jnp.asarray(DEFAULT_BLOCK_ANGLES)
    robot_pos = jnp.asarray(DEFAULT_ROBOT_POSE[0], jnp.float32)
    robot_ang = jnp.float32(DEFAULT_ROBOT_POSE[1])

    if flags.any_layout:
        pos_lim, rot_lim = B.jitter_limits(flags)
        # fix_colour.py:143-165: (regions..., robot) placed ignoring blocks
        stack = B.Stack(1 + MAX_GOALS + MAX_BLOCKS)
        gkeys = jax.random.split(ks[7], MAX_GOALS)
        new_gc = []
        for i in range(MAX_GOALS):
            gg = R.goal_placement_geom(hws[i, 0], hws[i, 1])
            c, _, ok = R.place_entity(
                gkeys[i], gg, goal_c[i], jnp.float32(0.0), stack.placed(),
                stack.mask, rand_rot=False, pos_linf_limit=pos_lim)
            stack.put(i, gg, c, jnp.float32(0.0), present=active[i], ok=ok)
            new_gc.append(c)
        goal_c = jnp.stack(new_gc)
        rg = B.robot_geom()
        robot_pos, robot_ang, ok = R.place_entity(
            ks[8], rg, robot_pos, robot_ang, stack.placed(), stack.mask,
            pos_linf_limit=pos_lim, rot_limit=rot_lim)
        stack.put(MAX_GOALS, rg, robot_pos, robot_ang, ok=ok)

        # fix_colour.py:167-188: each block placed inside its own region
        # (ignoring that region's sensor); other regions/blocks collide.
        bkeys = jax.random.split(ks[9], MAX_BLOCKS)
        new_p, new_a = [], []
        for i in range(MAX_BLOCKS):
            b_lim = jnp.maximum(
                0.0, jnp.minimum(hws[i, 0], hws[i, 1]) / 2.0 - C.SHAPE_RAD)
            if flags.layout_minor:
                b_lim = jnp.minimum(C.JITTER_POS_BOUND, b_lim)
            bg = R.block_placement_geom(shapes[i])
            bmask = stack.mask_without(i)    # ignore own sensor
            p, a, ok = R.place_entity(
                bkeys[i], bg, goal_c[i], angles[i], stack.placed(), bmask,
                pos_linf_limit=b_lim, rot_limit=rot_lim)
            stack.put(MAX_GOALS + 1 + i, bg, p, a, present=active[i], ok=ok)
            new_p.append(p)
            new_a.append(a)
        poses = jnp.stack(new_p)
        angles = jnp.stack(new_a)
        state = state.replace(place_fail=stack.fails)

    state = B.set_blocks(state, shapes, block_colours, poses, angles, active)
    cxcyhw = jnp.concatenate([goal_c, hws], -1)
    state = B.set_goals(state, cxcyhw, region_colours, active)
    state = B.finalize_robot(state, robot_pos, robot_ang)
    return state


def score(state):
    """fix_colour.py:193-202 — binary: every region's COM-overlap set must
    equal its target list (odd region empty, others keep their block)."""
    bp = state.pos[N_ROBOT_BODIES:, :]                       # (MB, 2)

    def region_ok(g):
        inside = B.com_in_goal(bp, state.goal_xyhw[g]) & state.block_active
        block_matches = state.block_colour == state.goal_colour[g]
        # target membership: block g iff its colour matches region g
        want = (jnp.arange(MAX_BLOCKS) == g) & block_matches
        return jnp.all(inside == (want & state.block_active))

    oks = jax.vmap(region_ok)(jnp.arange(MAX_GOALS))
    complete = jnp.all(oks | ~state.goal_active)
    return complete.astype(jnp.float32)


TASK = B.TaskDef(
    name='FixColour', max_blocks=MAX_BLOCKS, max_goals=MAX_GOALS,
    ep_len=EP_LEN, variants=VARIANTS, variant_flags=VARIANT_FLAGS,
    reset_fn=reset, score_fn=score,
    default_shapes=tuple(int(s) for s in DEFAULT_BLOCK_SHAPES),
    default_active=(True,) * MAX_BLOCKS)
