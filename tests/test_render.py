"""Rasterizer tests: frame structure, cameras, colours, determinism."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magical_tpu import constants as C
from magical_tpu.core import render as R
from magical_tpu.tasks import ALL_TASKS

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope='module')
def mtr_state():
    task = ALL_TASKS['MoveToRegion']
    return jax.jit(task.reset_fn, static_argnums=(1,))(
        KEY, task.flags_for('Demo'))


@pytest.fixture(scope='module')
def views(mtr_state):
    task = ALL_TASKS['MoveToRegion']

    def rend(s):
        return R.render_views(s, task.max_blocks, task.max_goals, False,
                              res=96, views=('allo', 'ego'), fidelity='lo')
    return jax.jit(rend)(mtr_state)


def test_frame_shapes_dtype(views):
    for v in ('allo', 'ego'):
        assert views[v].shape == (96, 96, 3)
        assert views[v].dtype == jnp.uint8


def test_allo_corner_is_bg_border_mix(views):
    # ARENA_ZOOM_OUT = 1.02 leaves a strip outside the arena.  The
    # corner pixel of the 96x96 view is NOT pure background even in the
    # reference pipeline: the 1px arena border at 384x384 lands inside
    # the corner pixel's 4x4 INTER_AREA footprint, so the corner is a
    # convex mix of background and arena-border grey (and nothing else
    # -- in particular no white arena fill).
    corner = np.asarray(views['allo'][0, 0]).astype(np.float64)
    bg = np.asarray(C.BACKGROUND_COLOUR) * 255
    grey = np.asarray(C.ARENA_GREY) * 255
    lo = np.minimum(bg, grey) - 2
    hi = np.maximum(bg, grey) + 2
    assert np.all(corner >= lo) and np.all(corner <= hi), corner
    # ...and a pixel a bit further along the edge but still outside the
    # arena stays closer to background than to the border grey
    edge = np.asarray(views['allo'][0, 48]).astype(np.float64)
    assert np.all(edge >= lo) and np.all(edge <= hi), edge


def test_allo_contains_goal_colour(views):
    # the blue goal's light fill must appear in the allo view
    img = np.asarray(views['allo']).reshape(-1, 3).astype(np.int32)
    light_blue = np.round(np.asarray(C.GOAL_COLOURS_LIGHT[2]) * 255)
    dist = np.abs(img - light_blue).sum(-1)
    assert (dist < 12).sum() > 100


def test_allo_contains_robot_grey(views):
    img = np.asarray(views['allo']).reshape(-1, 3).astype(np.int32)
    grey = np.round(np.asarray(C.ROBOT_COLOUR) * 255)
    dist = np.abs(img - grey).sum(-1)
    assert (dist < 12).sum() > 20


def test_ego_robot_at_anchor(views):
    # ego camera pins the robot at (0.5, 0.15) from the bottom -> robot
    # grey pixels cluster around column 48, row ~81
    img = np.asarray(views['ego']).astype(np.int32)
    grey = np.round(np.asarray(C.ROBOT_COLOUR) * 255)
    mask = np.abs(img - grey).sum(-1) < 12
    assert mask.sum() > 20
    rows, cols = np.nonzero(mask)
    assert abs(cols.mean() - 48) < 6
    assert abs(rows.mean() - (96 - 0.15 * 96)) < 8


def test_hi_lo_agree(mtr_state):
    task = ALL_TASKS['MoveToRegion']

    def rend(s, fid):
        return R.render_views(s, task.max_blocks, task.max_goals, False,
                              res=96, views=('allo',), fidelity=fid)
    lo = np.asarray(jax.jit(functools.partial(rend, fid='lo'))(
        mtr_state)['allo']).astype(np.float64)
    hi = np.asarray(jax.jit(functools.partial(rend, fid='hi'))(
        mtr_state)['allo']).astype(np.float64)
    # the two fidelity paths differ only in AA detail
    assert np.abs(lo - hi).mean() < 6.0


def test_block_colours_render():
    task = ALL_TASKS['MoveToCorner']
    s = jax.jit(task.reset_fn, static_argnums=(1,))(
        KEY, task.flags_for('Demo'))

    def rend(s):
        return R.render_views(s, task.max_blocks, task.max_goals, True,
                              res=96, views=('allo',), fidelity='lo')
    img = np.asarray(jax.jit(rend)(s)['allo']).reshape(-1, 3).astype(int)
    red = np.round(np.asarray(C.BLOCK_COLOURS[0]) * 255)
    assert (np.abs(img - red).sum(-1) < 16).sum() > 10


def test_render_deterministic(mtr_state, views):
    task = ALL_TASKS['MoveToRegion']

    def rend(s):
        return R.render_views(s, task.max_blocks, task.max_goals, False,
                              res=96, views=('allo', 'ego'), fidelity='lo')
    v2 = jax.jit(rend)(mtr_state)
    np.testing.assert_array_equal(np.asarray(views['allo']),
                                  np.asarray(v2['allo']))


def test_static_shape_display_list_matches_dynamic():
    """The static-shape-specialised display list must rasterise to the
    exact same image as the dynamic path (it only drops always-inactive
    prims and constant-folds nv/radius)."""
    import jax
    from magical_tpu.core import render as R
    from magical_tpu.tasks import ALL_TASKS

    for task_name in ('MoveToCorner', 'MatchRegions', 'ClusterColour'):
        task = ALL_TASKS[task_name]
        flags = task.flags_for('Demo')
        st = jax.jit(task.reset_fn, static_argnums=(1,))(
            jax.random.PRNGKey(3), flags)
        static = task.static_block_shapes(flags)
        assert static is not None
        robot_first = task_name == 'MoveToCorner'
        dyn = R.render_views(st, task.max_blocks, task.max_goals,
                             robot_first, res=96, views=('allo', 'ego'))
        spec = R.render_views(st, task.max_blocks, task.max_goals,
                              robot_first, res=96, views=('allo', 'ego'),
                              static_shapes=static)
        for v in ('allo', 'ego'):
            np.testing.assert_array_equal(np.asarray(dyn[v]),
                                          np.asarray(spec[v]))


def test_static_block_shapes_variant_gating():
    from magical_tpu.tasks import ALL_TASKS
    task = ALL_TASKS['MatchRegions']
    assert task.static_block_shapes(task.flags_for('Demo')) == \
        (6, 1, None, None, 2, None, 5, 2)
    assert task.static_block_shapes(task.flags_for('TestShape')) is None
    assert task.static_block_shapes(task.flags_for('TestCountPlus')) is None
    cl = ALL_TASKS['ClusterColour']
    st = cl.static_block_shapes(cl.flags_for('TestLayout'))
    assert len(st) == cl.max_blocks and st[8] is None and st[9] is None
