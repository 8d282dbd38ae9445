"""Task resets, randomisation invariants, and score functions."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magical_tpu import constants as C
from magical_tpu.core.state import N_ROBOT_BODIES
from magical_tpu.tasks import ALL_TASKS

KEY = jax.random.PRNGKey(42)


def reset(task, variant, key=KEY):
    return jax.jit(task.reset_fn, static_argnums=(1,))(
        key, task.flags_for(variant))


@pytest.mark.parametrize('name', list(ALL_TASKS))
def test_demo_reset_deterministic_defaults(name):
    task = ALL_TASKS[name]
    s = reset(task, 'Demo')
    s2 = reset(task, 'Demo', jax.random.PRNGKey(7))
    # Demo variants are seed-independent (fixed scene)
    np.testing.assert_allclose(np.asarray(s.pos), np.asarray(s2.pos),
                               atol=1e-7)
    sc = float(jax.jit(task.score_fn)(s))
    assert 0.0 <= sc <= 1.0


@pytest.mark.parametrize('name,variant', [
    ('MoveToCorner', 'TestJitter'),
    ('MoveToRegion', 'TestLayout'),
    ('MatchRegions', 'TestCountPlus'),
    ('FindDupe', 'TestAll'),
    ('FixColour', 'TestColour'),
    ('ClusterColour', 'TestShape'),
])
def test_variant_resets_randomise(name, variant):
    task = ALL_TASKS[name]
    s1 = reset(task, variant, jax.random.PRNGKey(0))
    s2 = reset(task, variant, jax.random.PRNGKey(1))
    diff = np.abs(np.asarray(s1.pos) - np.asarray(s2.pos)).max() \
        + np.abs(np.asarray(s1.block_colour) -
                 np.asarray(s2.block_colour)).max() \
        + np.abs(np.asarray(s1.goal_xyhw) - np.asarray(s2.goal_xyhw)).max() \
        + np.abs(np.asarray(s1.block_shape, np.float32) -
                 np.asarray(s2.block_shape, np.float32)).max()
    assert diff > 1e-4


def test_jitter_stays_near_defaults():
    task = ALL_TASKS['MoveToCorner']
    demo = reset(task, 'Demo')
    jit_s = reset(task, 'TestJitter', jax.random.PRNGKey(3))
    d = np.abs(np.asarray(jit_s.pos[0]) - np.asarray(demo.pos[0]))
    assert np.all(d <= C.JITTER_POS_BOUND + 1e-5)
    da = abs(float(jit_s.angle[0]) - float(demo.angle[0]))
    assert da <= C.JITTER_ROT_BOUND + 1e-5


def test_layout_no_overlaps():
    # fully randomised layouts place entities without interpenetration
    task = ALL_TASKS['ClusterColour']
    svec = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('TestLayout'))))(
            jax.random.split(KEY, 16))
    pos = np.asarray(svec.pos[:, N_ROBOT_BODIES:])      # (16, MB, 2)
    act = np.asarray(svec.block_active)
    for e in range(16):
        pts = pos[e][act[e]]
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, 1.0)
        # non-overlap: tangent circles sit at 0.24; interlocking star tips
        # can bring centres closer, but never below ~0.1
        assert d.min() > 0.1, f'env {e} min dist {d.min()}'
        assert np.all(np.abs(pts) <= 1.0)
    # every placement found a collision-free pose (PlacementError analogue)
    from magical_tpu.core import validate
    validate.assert_placements_ok(svec, 'ClusterColour TestLayout')


def test_placement_failure_is_counted():
    # an entity that cannot fit anywhere must raise the fail flag instead
    # of silently keeping a colliding pose (reference: PlacementError,
    # geom.py:111-113)
    from magical_tpu.tasks import base as B
    from magical_tpu.tasks import randomize as R

    # a "block" with a circle sub-shape far bigger than the arena
    verts = jnp.zeros((B.KSUB, B.NV, 2), jnp.float32)
    radius = jnp.zeros((B.KSUB,), jnp.float32).at[0].set(5.0)
    nv = jnp.ones((B.KSUB,), jnp.int32)
    active = jnp.zeros((B.KSUB,), bool).at[0].set(True)
    stack = B.Stack(1)
    pos, ang, ok = R.place_entity(
        KEY, (verts, radius, nv, active), jnp.zeros(2), jnp.float32(0.0),
        stack.placed(), stack.mask)
    stack.put(0, (verts, radius, nv, active), pos, ang, ok=ok)
    assert not bool(ok)
    assert int(stack.fails) == 1
    # and a normal-size entity succeeds with fails untouched
    radius_ok = jnp.zeros((B.KSUB,), jnp.float32).at[0].set(0.1)
    stack2 = B.Stack(1)
    _, _, ok2 = R.place_entity(
        KEY, (verts, radius_ok, nv, active), jnp.zeros(2), jnp.float32(0.0),
        stack2.placed(), stack2.mask)
    stack2.put(0, (verts, radius_ok, nv, active), pos, ang, ok=ok2)
    assert bool(ok2)
    assert int(stack2.fails) == 0


def test_dynamics_variant_randomises_phys():
    task = ALL_TASKS['MoveToRegion']
    s1 = reset(task, 'TestDynamics', jax.random.PRNGKey(0))
    s2 = reset(task, 'TestDynamics', jax.random.PRNGKey(1))
    assert np.abs(np.asarray(s1.phys) - np.asarray(s2.phys)).max() > 1e-4
    assert np.all(np.asarray(s1.phys) >= C.PHYS_VAR_LO - 1e-6)
    assert np.all(np.asarray(s1.phys) <= C.PHYS_VAR_HI + 1e-6)
    sdemo = reset(task, 'Demo')
    np.testing.assert_allclose(np.asarray(sdemo.phys), C.PHYS_VAR_DEFAULTS)


def test_count_plus_counts_in_range():
    cases = {
        'MatchRegions': (1, 8), 'MakeLine': (3, 4), 'FindDupe': (2, 7),
        'FixColour': (2, 3), 'ClusterColour': (7, 10),
    }
    for name, (lo, hi) in cases.items():
        task = ALL_TASKS[name]
        variant = 'TestCountPlus'
        svec = jax.jit(jax.vmap(functools.partial(
            task.reset_fn, flags=task.flags_for(variant))))(
                jax.random.split(KEY, 16))
        counts = np.asarray(svec.block_active).sum(-1)
        assert counts.min() >= lo, (name, counts)
        assert counts.max() <= hi, (name, counts)
        assert counts.std() > 0 or lo == hi


def test_cluster_colour_rand_has_all_colours():
    task = ALL_TASKS['ClusterColour']
    svec = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('TestColour'))))(
            jax.random.split(KEY, 8))
    cols = np.asarray(svec.block_colour)
    act = np.asarray(svec.block_active)
    for e in range(8):
        present = set(cols[e][act[e]].tolist())
        assert present == {0, 1, 2, 3}


def test_score_move_to_corner():
    task = ALL_TASKS['MoveToCorner']
    s = reset(task, 'Demo')
    # move block to the top-left corner -> score 1
    nb = N_ROBOT_BODIES
    s_win = s.replace(pos=s.pos.at[nb].set(jnp.asarray([-1.0, 1.0])))
    assert float(task.score_fn(s_win)) == 1.0
    s_half = s.replace(pos=s.pos.at[nb].set(jnp.asarray([-1.0 + 0.75,
                                                         1.0 - 0.75])))
    sc = float(task.score_fn(s_half))
    assert 0.0 < sc < 1.0
    assert float(task.score_fn(s)) == 0.0


def test_score_move_to_region():
    task = ALL_TASKS['MoveToRegion']
    s = reset(task, 'Demo')
    goal = np.asarray(s.goal_xyhw[0])
    s_win = s.replace(pos=s.pos.at[0].set(jnp.asarray(goal[:2])))
    assert float(task.score_fn(s_win)) == 1.0
    assert float(task.score_fn(s)) == 0.0


def test_score_match_regions():
    task = ALL_TASKS['MatchRegions']
    s = reset(task, 'Demo')
    goal = np.asarray(s.goal_xyhw[0])
    nb = N_ROBOT_BODIES
    # move both targets (slots 0, 1) into the goal -> score 1
    s2 = s
    for slot in (0, 1):
        s2 = s2.replace(pos=s2.pos.at[nb + slot].set(jnp.asarray(goal[:2])
                        + slot * 0.05))
    assert float(task.score_fn(s2)) == 1.0
    # add a distractor (slot 4) -> contamination: 2/3 of overlap are targets
    s3 = s2.replace(pos=s2.pos.at[nb + 4].set(jnp.asarray(goal[:2])))
    assert float(task.score_fn(s3)) == pytest.approx(1.0 * (1 - 1 / 3))
    assert float(task.score_fn(s)) == 0.0


def test_score_find_dupe():
    task = ALL_TASKS['FindDupe']
    s = reset(task, 'Demo')
    goal = np.asarray(s.goal_xyhw[0])
    nb = N_ROBOT_BODIES
    # query block (slot 6) already inside; bring the duplicate (slot 5)
    assert float(task.score_fn(s)) == 0.0
    s2 = s.replace(pos=s.pos.at[nb + 5].set(jnp.asarray(goal[:2])))
    assert float(task.score_fn(s2)) == 1.0
    # bring a non-matching block too -> contamination 1/3
    s3 = s2.replace(pos=s2.pos.at[nb + 0].set(jnp.asarray(goal[:2]) + 0.05))
    assert float(task.score_fn(s3)) == pytest.approx(1 - 1 / 3)


def test_score_fix_colour():
    task = ALL_TASKS['FixColour']
    s = reset(task, 'Demo')
    # default scene: region 2 (red) holds a blue block -> incomplete
    assert float(task.score_fn(s)) == 0.0
    # remove the mismatched block (slot 2) from its region -> complete
    nb = N_ROBOT_BODIES
    s2 = s.replace(pos=s.pos.at[nb + 2].set(jnp.asarray([0.9, -0.9])))
    assert float(task.score_fn(s2)) == 1.0


def test_score_make_line():
    task = ALL_TASKS['MakeLine']
    s = reset(task, 'Demo')
    nb = N_ROBOT_BODIES
    # perfect line -> 1
    line = np.stack([np.linspace(-0.6, 0.6, 4), np.zeros(4)], -1)
    s2 = s.replace(pos=s.pos.at[nb:].set(jnp.asarray(line, jnp.float32)))
    assert float(task.score_fn(s2)) == 1.0
    # one outlier -> 0.5
    off = line.copy()
    off[3] = (0.0, 0.8)
    s3 = s.replace(pos=s.pos.at[nb:].set(jnp.asarray(off, jnp.float32)))
    assert float(task.score_fn(s3)) == 0.5
    # gap larger than max separation breaks the run
    gap = line.copy()
    gap[3] = (3.5 * C.SHAPE_RAD * 3, 0.0)
    s4 = s.replace(pos=s.pos.at[nb:].set(jnp.asarray(gap, jnp.float32)))
    assert float(task.score_fn(s4)) == 0.5


def test_score_cluster():
    task = ALL_TASKS['ClusterColour']
    s = reset(task, 'Demo')
    nb = N_ROBOT_BODIES
    # tight per-colour clusters -> 1
    cols = np.asarray(s.block_colour)
    centres = {0: (-0.7, -0.7), 1: (0.7, -0.7), 2: (-0.7, 0.7),
               3: (0.7, 0.7)}
    pos = np.asarray(s.pos).copy()
    seen = {}
    for i, c in enumerate(cols):
        k = seen.get(int(c), 0)
        seen[int(c)] = k + 1
        cx, cy = centres[int(c)]
        pos[nb + i] = (cx + 0.02 * k, cy)
    s2 = s.replace(pos=jnp.asarray(pos))
    assert float(task.score_fn(s2)) == 1.0
    assert float(task.score_fn(s)) < 0.5
