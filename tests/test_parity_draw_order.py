"""Draw-order tests for the reference-parity reset samplers.

Each test replays a task sampler with a RECORDING rng (every
uniform/randint/choice/shuffle call is logged with its bounds) plus an
instrumented placement stack, and asserts the exact call sequence
against a hand transcription of the reference's ``on_reset``:

  MoveToCorner  move_to_corner.py:31-64
  MoveToRegion  move_to_region.py:30-83
  MatchRegions  match_regions.py:44-191
  MakeLine      make_line.py:93-140
  FindDupe      find_dupe.py:72-201
  FixColour     fix_colour.py:67-191
  Cluster*      cluster.py:67-161

plus the shared machinery:

  phys vars     base_env.py:198-203 + phys_vars.py:70-83
  pm_randomise_pose draw order (x, y, angle per try)  geom.py:205-218
  randomise_hw  geom.py:344-359

The recorder delegates to a real ``np.random.RandomState``, so draw
*consumption* per call is numpy-exact; NativeRandomState's stream parity
is covered separately (test_native_parity.py).
"""

import math

import numpy as np
import pytest

from magical_tpu import constants as C
from magical_tpu.data import parity
from magical_tpu.tasks.base import Flags

JP = C.JITTER_POS_BOUND
JR = C.JITTER_ROT_BOUND
JT = C.JITTER_TARGET_BOUND
GMIN, GMAX = C.RAND_GOAL_MIN_SIZE, C.RAND_GOAL_MAX_SIZE


class RecordingRng:
    def __init__(self, seed=0):
        self._rng = np.random.RandomState(seed)
        self.calls = []

    def uniform(self, low=0.0, high=1.0, size=None):
        self.calls.append(('uniform', round(float(low), 6),
                           round(float(high), 6)))
        return self._rng.uniform(low, high, size)

    def randint(self, low, high=None, size=None):
        self.calls.append(('randint', int(low),
                           None if high is None else int(high),
                           size))
        return self._rng.randint(low, high, size)

    def choice(self, values, size=None):
        self.calls.append(('choice', len(values), size))
        idx = self._rng.randint(0, len(values), size)
        if size is None:
            return values[int(idx)]
        return [values[int(i)] for i in np.asarray(idx).ravel()]

    def shuffle(self, lst):
        self.calls.append(('shuffle', len(lst)))
        idx = np.arange(len(lst))
        self._rng.shuffle(idx)
        lst[:] = [lst[i] for i in idx]


def _classify(ent):
    """Robot: circle-first multi-part; goal: one radius-0 box; block:
    anything else."""
    if len(ent.parts) == 5 and ent.parts[0][1] == C.ROBOT_RAD:
        return 'robot'
    if len(ent.parts) == 1 and ent.parts[0][1] == 0.0 \
            and len(ent.parts[0][0]) == 4:
        return 'goal'
    return 'block'


def record_sampler(task, flags, seed=0):
    """Run a sampler with the recording rng + instrumented placer.
    Returns (pre_placement_calls, placements, spec); placement-internal
    rng draws are cut out of `calls` (they are try-count dependent and
    covered by test_placer_draw_order)."""
    rng = RecordingRng(seed)
    placements = []
    orig = parity._Placer.randomise_pose

    def patched(self, make_entity, cur_pos, cur_angle, rand_pos=True,
                rand_rot=True, pos_linf=None, rot_limit=None, ignore=None):
        ignore = ignore or []
        probe = make_entity(tuple(cur_pos), cur_angle)
        placements.append(dict(
            kind=_classify(probe),
            rand_rot=rand_rot,
            pos_linf=pos_linf,
            rot_limit=rot_limit,
            n_obstacles=len([o for o in self.obstacles
                             if o not in ignore]),
            n_ignored=len(ignore),
            mark=len(rng.calls)))
        out = orig(self, make_entity, cur_pos, cur_angle,
                   rand_pos=rand_pos, rand_rot=rand_rot,
                   pos_linf=pos_linf, rot_limit=rot_limit, ignore=ignore)
        placements[-1]['calls'] = rng.calls[placements[-1].pop('mark'):]
        return out

    parity._Placer.randomise_pose = patched
    try:
        spec = parity.SAMPLERS[task](rng, flags)
    finally:
        parity._Placer.randomise_pose = orig
    # pre-placement calls = everything before the first placement's draws
    n_placed = sum(len(p['calls']) for p in placements)
    pre = rng.calls[:len(rng.calls) - n_placed]
    return pre, placements, spec


PHYS = [('uniform', round(float(lo), 6), round(float(hi), 6))
        for lo, hi in zip(C.PHYS_VAR_LO, C.PHYS_VAR_HI)]
HW = [('uniform', GMIN, GMAX)] * 2
CHOICE4 = ('choice', 4, None)


def place(kind, pos_linf, rot_limit, n_obstacles, rand_rot=True,
          n_ignored=0):
    return dict(kind=kind, rand_rot=rand_rot, pos_linf=pos_linf,
                rot_limit=rot_limit, n_obstacles=n_obstacles,
                n_ignored=n_ignored)


def assert_placements(placements, expected):
    got = [{k: p[k] for k in ('kind', 'rand_rot', 'pos_linf', 'rot_limit',
                              'n_obstacles', 'n_ignored')}
           for p in placements]
    assert got == expected, f'\ngot:      {got}\nexpected: {expected}'


def test_placer_draw_order():
    """pm_randomise_pose draws x, y[, angle] per try in that order with
    arena-clamped bounds (geom.py:178-218)."""
    rng = RecordingRng(3)
    placer = parity._Placer(rng)
    (px, py), ang, _ = placer.randomise_pose(
        parity._Entity.robot, (0.9, 0.0), 1.0, pos_linf=0.3, rot_limit=0.2)
    # x clamped at arena right edge (0.9+0.3 -> 1.0); tries consumed in
    # (x, y, angle) groups
    assert len(rng.calls) % 3 == 0
    for i in range(0, len(rng.calls), 3):
        assert rng.calls[i] == ('uniform', 0.6, 1.0)
        assert rng.calls[i + 1] == ('uniform', -0.3, 0.3)
        assert rng.calls[i + 2] == ('uniform', 0.8, 1.2)
    assert 0.6 <= px <= 1.0 and -0.3 <= py <= 0.3 and 0.8 <= ang <= 1.2
    # rand_rot=False consumes only (x, y)
    rng2 = RecordingRng(3)
    placer2 = parity._Placer(rng2)
    placer2.randomise_pose(lambda p, a: parity._Entity.goal(*p, 0.4, 0.4),
                           (0.0, 0.0), 0.0, rand_rot=False)
    assert len(rng2.calls) % 2 == 0
    assert rng2.calls[0] == ('uniform', -1.0, 1.0)
    assert rng2.calls[1] == ('uniform', -1.0, 1.0)


def test_move_to_corner_demo_consumes_nothing():
    pre, placements, spec = record_sampler('MoveToCorner', Flags())
    assert pre == [] and placements == []
    assert spec.robot_pose == ((0.4, 0.0), 0.55 * math.pi)


def test_move_to_corner_testall():
    # TestAll for MoveToCorner: colour+shape+jitter+dynamics
    # (benchmarks/__init__.py:431-449 — no Layout/CountPlus variants)
    fl = Flags(colour=True, shape=True, layout_minor=True, dynamics=True)
    pre, placements, _ = record_sampler('MoveToCorner', fl)
    assert pre == PHYS + [CHOICE4, CHOICE4]
    assert_placements(placements, [
        place('robot', JP, JR, 0),
        place('block', JP, JR, 1),
    ])


def test_move_to_region_testall():
    # colour + layout_full + dynamics (no shape/count variants)
    fl = Flags(colour=True, layout_full=True, dynamics=True)
    pre, placements, _ = record_sampler('MoveToRegion', fl)
    # hw randomised BEFORE the colour draw (move_to_region.py:32-52)
    assert pre == PHYS + HW + [CHOICE4]
    assert_placements(placements, [
        place('goal', None, None, 0, rand_rot=False),
        place('robot', None, None, 1),
    ])


def test_move_to_region_jitter_bounds():
    fl = Flags(layout_minor=True)
    pre, placements, _ = record_sampler('MoveToRegion', fl)
    hw_default = (0.76, 0.75)
    assert pre == [
        ('uniform', round(max(GMIN, hw_default[0] - JT), 6),
         round(min(GMAX, hw_default[0] + JT), 6)),
        ('uniform', round(max(GMIN, hw_default[1] - JT), 6),
         round(min(GMAX, hw_default[1] + JT), 6))]
    assert_placements(placements, [
        place('goal', JP, None, 0, rand_rot=False),
        place('robot', JP, JR, 1),
    ])


def test_match_regions_testcountplus():
    fl = Flags(colour=True, shape=True, count=True, layout_full=True)
    pre, placements, spec = record_sampler('MatchRegions', fl, seed=5)
    # expected counts re-derived from an identical numpy stream
    ref = np.random.RandomState(5)
    _colour = ref.randint(0, 4)
    ref.uniform(GMIN, GMAX)
    ref.uniform(GMIN, GMAX)
    tc = ref.randint(1, 3)
    dcs = [ref.randint(0, 3) for _ in range(3)]
    n_blocks = tc + sum(dcs)
    assert pre == ([CHOICE4] + HW
                   + [('randint', 1, 3, None)]
                   + [('randint', 0, 3, None)] * 3
                   + [CHOICE4] * n_blocks)
    assert_placements(placements, [
        place('goal', None, None, 0, rand_rot=False),
        place('robot', None, None, 1)]
        + [place('block', None, None, 2 + i) for i in range(n_blocks)])
    assert len(spec.block_shapes) == n_blocks


def test_make_line_testall():
    fl = Flags(colour=True, shape=True, count=True, layout_full=True,
               dynamics=True)
    pre, placements, spec = record_sampler('MakeLine', fl, seed=2)
    ref = np.random.RandomState(2)
    for lo, hi in zip(C.PHYS_VAR_LO, C.PHYS_VAR_HI):
        ref.uniform(float(lo), float(hi))
    n = ref.randint(3, 5)
    assert pre == PHYS + [('randint', 3, 5, None),
                          ('choice', 4, n), ('choice', 4, n)]
    assert_placements(placements, [place('robot', None, None, 0)]
                      + [place('block', None, None, 1 + i)
                         for i in range(n)])
    assert len(spec.block_shapes) == n


def test_find_dupe_testall():
    fl = Flags(colour=True, shape=True, count=True, layout_full=True,
               dynamics=True)
    pre, placements, spec = record_sampler('FindDupe', fl, seed=9)
    ref = np.random.RandomState(9)
    for lo, hi in zip(C.PHYS_VAR_LO, C.PHYS_VAR_HI):
        ref.uniform(float(lo), float(hi))
    n_out = ref.randint(1, 6) + 1
    n_dis = n_out - 1
    ref.randint(0, 4)                      # query colour
    ref.randint(0, 4, n_dis)               # distractor colours
    ref.randint(0, 4)                      # query shape
    ref.randint(0, 4, n_dis)               # distractor shapes
    h = ref.uniform(GMIN, GMAX)
    w = ref.uniform(GMIN, GMAX)
    # count -> colours (query, then size=n_dis) -> shapes -> hw
    # (find_dupe.py:87-117: hw comes AFTER the colour/shape draws)
    assert pre == (PHYS + [('randint', 1, 6, None),
                           CHOICE4, ('choice', 4, n_dis),
                           CHOICE4, ('choice', 4, n_dis)] + HW)
    q_lim = max(0.0, min(h, w) / 2 - C.SHAPE_RAD / 2)
    assert_placements(placements, [
        place('goal', None, None, 0, rand_rot=False),
        place('robot', None, None, 1)]
        + [place('block', None, None, 2 + i) for i in range(n_out)]
        # query block: placed from the sensor centre with the
        # inside-the-region limit, ignoring the sensor
        # (find_dupe.py:180-198)
        + [place('block', q_lim, None, 1 + n_out, n_ignored=1)])
    assert len(spec.block_shapes) == n_out + 1


def test_fix_colour_testall():
    fl = Flags(colour=True, shape=True, count=True, layout_full=True,
               dynamics=True)
    pre, placements, spec = record_sampler('FixColour', fl, seed=4)
    ref = np.random.RandomState(4)
    for lo, hi in zip(C.PHYS_VAR_LO, C.PHYS_VAR_HI):
        ref.uniform(float(lo), float(hi))
    n = ref.randint(2, 4)
    # count -> colours(size=n) -> odd idx -> replacement idx ->
    # shapes(size=n) -> per-region hw (fix_colour.py:79-115)
    assert pre == (PHYS + [('randint', 2, 4, None), ('choice', 4, n),
                           ('randint', 0, n, None), ('randint', 0, 3, None),
                           ('choice', 4, n)]
                   + [('uniform', 0.4, 0.5)] * (2 * n))
    ref.randint(0, 4, n)                   # colours
    ref.randint(0, n)                      # odd index
    ref.randint(0, 3)                      # replacement index
    ref.randint(0, 4, n)                   # shapes
    hws = [(ref.uniform(0.4, 0.5), ref.uniform(0.4, 0.5))
           for _ in range(n)]
    exp = [place('goal', None, None, i, rand_rot=False) for i in range(n)]
    exp.append(place('robot', None, None, n))
    # block i: limited to its region (max(0, min(hw)/2 - SHAPE_RAD),
    # fix_colour.py:176-188, applied for BOTH minor and full layout);
    # obstacles = n sensors + robot + (n-1) other blocks (provisional at
    # sensor centres or already placed) minus the ignored own sensor
    for i in range(n):
        b_lim = max(0.0, min(hws[i]) / 2 - C.SHAPE_RAD)
        exp.append(place('block', b_lim, None, 2 * n - 1, n_ignored=1))
    assert_placements(placements, exp)
    assert len(spec.goal_cxcyhw) == n


@pytest.mark.parametrize('task', ['ClusterColour', 'ClusterShape'])
def test_cluster_testall(task):
    fl = Flags(colour=True, shape=True, count=True, layout_full=True,
               dynamics=True)
    pre, placements, spec = record_sampler(task, fl, seed=8)
    ref = np.random.RandomState(8)
    for lo, hi in zip(C.PHYS_VAR_LO, C.PHYS_VAR_HI):
        ref.uniform(float(lo), float(hi))
    n = ref.randint(7, 11)
    # count -> colour top-ups + shuffle -> shape top-ups + shuffle
    # (cluster.py:81-110)
    assert pre == (PHYS + [('randint', 7, 11, None)]
                   + [CHOICE4] * (n - 4) + [('shuffle', n)]
                   + [CHOICE4] * (n - 4) + [('shuffle', n)])
    assert_placements(placements, [place('robot', None, None, 0)]
                      + [place('block', None, None, 1 + i)
                         for i in range(n)])
    assert len(spec.block_shapes) == n
    # colour/shape top-up guarantees at least one of each value
    if task == 'ClusterColour':
        assert set(spec.block_colours) == {0, 1, 2, 3}


def test_jitter_variants_use_minor_bounds():
    """TestJitter: every placement limited to the jitter bounds."""
    for task in ('MatchRegions', 'MakeLine', 'FindDupe', 'ClusterColour'):
        _, placements, _ = record_sampler(task, Flags(layout_minor=True))
        assert placements, task
        for p in placements:
            assert p['pos_linf'] is not None and p['pos_linf'] <= JP, task
            if p['rand_rot'] and p['kind'] != 'goal':
                assert p['rot_limit'] == JR, task


def test_spec_to_state_rollout_determinism_all_tasks():
    """state_from_spec -> short rollout is finite and deterministic for
    all 8 tasks x {Demo, TestAll-ish}."""
    import jax
    import jax.numpy as jnp
    from magical_tpu.core import physics as P
    from magical_tpu.tasks import ALL_TASKS

    for task_name, sampler in parity.SAMPLERS.items():
        task = ALL_TASKS[task_name]
        for variant in ('Demo', 'TestAll'):
            fl = task.flags_for(variant)
            spec = parity.sample_scene(task_name, 13, fl)
            st = parity.state_from_spec(spec, task.max_blocks,
                                        task.max_goals)

            def episode(st):
                def body(s, _):
                    return P.control_step(s, jnp.int32(4)), ()
                return jax.lax.scan(body, st, None, length=5)[0]

            s1 = jax.jit(episode)(st)
            s2 = jax.jit(episode)(st)
            assert bool(jnp.all(jnp.isfinite(s1.pos))), (task_name, variant)
            np.testing.assert_array_equal(np.asarray(s1.pos),
                                          np.asarray(s2.pos))
            score = float(task.score_fn(s1))
            assert 0.0 <= score <= 1.0, (task_name, variant)
