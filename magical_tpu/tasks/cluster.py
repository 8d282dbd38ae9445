"""ClusterColour / ClusterShape: sort blocks into per-colour or per-type
clusters.

Reference: /root/reference/magical/benchmarks/cluster.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magical_tpu import constants as C
from magical_tpu.tasks import base as B
from magical_tpu.tasks import randomize as R
from magical_tpu.core.state import make_initial_state, N_ROBOT_BODIES

MAX_BLOCKS = 10
MAX_GOALS = 1      # unused
EP_LEN = 240
MIN_COUNT = 7      # cluster.py:82 randint(7, 10+1)
DEFAULT_COUNT = 8

SC = C.ShapeColour
ST = C.ShapeType

COLOUR_DEFAULTS = dict(
    robot_pose=((0.71692, -0.34374), 0.83693),
    colours=np.array([SC.BLUE, SC.BLUE, SC.BLUE, SC.GREEN, SC.GREEN, SC.RED,
                      SC.YELLOW, SC.YELLOW], np.int32),
    shapes=np.array([ST.CIRCLE, ST.STAR, ST.SQUARE, ST.PENTAGON, ST.PENTAGON,
                     ST.SQUARE, ST.STAR, ST.PENTAGON], np.int32),
    poses=np.array([(-0.5147, 0.14149), (-0.1347, -0.71414),
                    (-0.74247, -0.097592), (-0.077363, -0.42964),
                    (0.51978, 0.1853), (-0.5278, -0.21642),
                    (-0.54039, 0.48292), (-0.16761, 0.64303)], np.float32),
    angles=np.array([-0.38871, 1.0533, 1.1571, -0.64379, -1.1762, 2.9356,
                     0.072818, -2.3255], np.float32),
)
SHAPE_DEFAULTS = dict(
    robot_pose=((0.286, -0.202), -1.878),
    colours=np.array([SC.YELLOW, SC.BLUE, SC.RED, SC.RED, SC.GREEN,
                      SC.YELLOW, SC.BLUE, SC.GREEN], np.int32),
    shapes=np.array([ST.SQUARE, ST.PENTAGON, ST.PENTAGON, ST.PENTAGON,
                     ST.CIRCLE, ST.STAR, ST.STAR, ST.CIRCLE], np.int32),
    poses=np.array([(-0.414, 0.297), (0.068, 0.705), (0.821, 0.220),
                    (-0.461, -0.749), (0.867, -0.149), (-0.785, -0.140),
                    (-0.305, -0.226), (0.758, -0.708)], np.float32),
    angles=np.array([-1.731, 2.184, 0.650, -2.673, -2.215, -0.405, 1.341,
                     -2.140], np.float32),
)

VARIANTS = B.FULL_VARIANTS
VARIANT_FLAGS = B.FULL_VARIANT_FLAGS


def _shuffled_with_all(key, values, n):
    """cluster.py:91-98 / 102-109: one of each value, padded with random
    choices up to n, then shuffled — realised over MAX_BLOCKS slots with
    slots >= n unused."""
    k1, k2 = jax.random.split(key)
    base = jnp.asarray(np.asarray(values, np.int32))
    nv = len(values)
    fill = B.choice(k1, values, (MAX_BLOCKS,))
    idx = jnp.arange(MAX_BLOCKS)
    vals = jnp.where(idx < nv, base[jnp.clip(idx, 0, nv - 1)], fill)
    # shuffle the first n entries: sort random keys, inactive pushed last
    u = jax.random.uniform(k2, (MAX_BLOCKS,))
    u = jnp.where(idx < n, u, 2.0)
    perm = jnp.argsort(u)
    return vals[perm]


def _reset(key, flags: B.Flags, defaults):
    ks = jax.random.split(key, 6)
    state = make_initial_state(MAX_BLOCKS, MAX_GOALS)
    state = state.replace(phys=B.sample_phys(ks[0], flags))

    if flags.count:
        n = jax.random.randint(ks[1], (), MIN_COUNT, MAX_BLOCKS + 1)
    else:
        n = jnp.int32(DEFAULT_COUNT)
    active = jnp.arange(MAX_BLOCKS) < n

    def pad(arr):
        a = jnp.asarray(arr)
        return jnp.concatenate(
            [a, jnp.zeros((MAX_BLOCKS - a.shape[0],), a.dtype)])

    colours = pad(defaults['colours'])
    shapes = pad(defaults['shapes'])
    if flags.colour:
        colours = _shuffled_with_all(ks[2], C.RAND_SHAPE_COLOURS, n)
    if flags.shape:
        shapes = _shuffled_with_all(ks[3], C.RAND_SHAPE_TYPES, n)

    def pad2(arr):
        a = jnp.asarray(arr, jnp.float32)
        padrows = jnp.zeros((MAX_BLOCKS - a.shape[0],) + a.shape[1:],
                            jnp.float32)
        return jnp.concatenate([a, padrows])

    poses = pad2(defaults['poses'])
    angles = pad2(defaults['angles'])
    robot_pos = jnp.asarray(defaults['robot_pose'][0], jnp.float32)
    robot_ang = jnp.float32(defaults['robot_pose'][1])

    if flags.any_layout:
        pos_lim, rot_lim = B.jitter_limits(flags)
        # order per cluster.py:148-161: robot, then blocks
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


def _score(state, by_colour: bool):
    """cluster.py:166-216 — centroid-margin clustering score."""
    chars = state.block_colour if by_colour else state.block_shape
    nvals = 4 if by_colour else 7
    pts = state.pos[N_ROBOT_BODIES:, :]
    active = state.block_active

    # per-value centroids over present values
    val_ids = jnp.arange(nvals)
    member = (chars[None, :] == val_ids[:, None]) & active[None, :]  # (V, MB)
    counts = jnp.sum(member, -1)
    present = counts > 0
    centroids = jnp.where(
        present[:, None],
        jnp.sum(jnp.where(member[..., None], pts[None], 0.0), 1)
        / jnp.maximum(counts, 1)[:, None],
        0.0)

    # per-block: sqrt(own SSE) < sqrt(nearest other SSE) - 2*own SSE
    sses = jnp.sum((pts[:, None, :] - centroids[None, :, :]) ** 2, -1)  # (MB,V)
    own = jnp.take_along_axis(sses, chars[:, None], 1)[:, 0]
    bad = jnp.where(present[None, :] & (val_ids[None, :] != chars[:, None]),
                    sses, jnp.inf)
    nearest_bad = jnp.min(bad, -1)
    margin = 2.0 * own
    correct = (jnp.sqrt(own) < jnp.sqrt(nearest_bad) - margin) & active
    n = jnp.maximum(jnp.sum(active), 1)
    frac = jnp.sum(correct).astype(jnp.float32) / n.astype(jnp.float32)
    thresh = 0.75
    return jnp.maximum(frac - thresh, 0.0) / (1.0 - thresh)


COLOUR_TASK = B.TaskDef(
    name='ClusterColour', max_blocks=MAX_BLOCKS, max_goals=MAX_GOALS,
    ep_len=EP_LEN, variants=VARIANTS, variant_flags=VARIANT_FLAGS,
    reset_fn=functools.partial(_reset, defaults=COLOUR_DEFAULTS),
    score_fn=functools.partial(_score, by_colour=True),
    default_shapes=tuple(int(s) for s in COLOUR_DEFAULTS['shapes']),
    default_active=(True,) * MAX_BLOCKS)

SHAPE_TASK = B.TaskDef(
    name='ClusterShape', max_blocks=MAX_BLOCKS, max_goals=MAX_GOALS,
    ep_len=EP_LEN, variants=VARIANTS, variant_flags=VARIANT_FLAGS,
    reset_fn=functools.partial(_reset, defaults=SHAPE_DEFAULTS),
    score_fn=functools.partial(_score, by_colour=False),
    default_shapes=tuple(int(s) for s in SHAPE_DEFAULTS['shapes']),
    default_active=(True,) * MAX_BLOCKS)
