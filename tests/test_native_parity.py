"""Native library + reference-parity sampler tests."""

import numpy as np
import pytest

from magical_tpu import native
from magical_tpu.tasks.base import Flags


def test_mt19937_matches_numpy_randomstate():
    for seed in (0, 7, 42, 2 ** 31 - 2):
        a = native.NativeRandomState(seed)
        b = np.random.RandomState(seed)
        assert a.uniform(0, 1) == b.uniform(0, 1)
        np.testing.assert_array_equal(a.uniform(-2, 3, (6,)),
                                      b.uniform(-2, 3, 6))
        np.testing.assert_array_equal(a.randint(0, 10, (8,)),
                                      b.randint(0, 10, 8))
        assert a.randint(1, 3) == b.randint(1, 3)
        la, lb = list(range(11)), np.arange(11)
        a.shuffle(la)
        b.shuffle(lb)
        assert la == lb.tolist()
        assert a.choice(list('rgby'), size=5) == \
            b.choice(np.asarray(list('rgby'), dtype=object), size=5).tolist()


def test_native_resize_matches_cv2_semantics():
    img = np.random.RandomState(0).randint(
        0, 256, (3, 64, 64, 3)).astype(np.uint8)
    out = native.resize_area_batch(img, 16)
    ref = np.floor(img.reshape(3, 16, 4, 16, 4, 3).astype(np.float64)
                   .mean((2, 4)) + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_parity_sampler_demo_matches_defaults():
    from magical_tpu.data import parity
    spec = parity.sample_scene('MoveToCorner', 7, Flags())
    assert spec.robot_pose[0] == (0.4, 0.0)
    assert spec.block_shapes == [1]        # SQUARE
    assert spec.block_colours == [0]       # RED
    spec2 = parity.sample_scene('MatchRegions', 3, Flags())
    assert len(spec2.block_shapes) == 5
    assert spec2.goal_colours == [1]       # GREEN


def test_parity_sampler_consumes_fixed_stream():
    """Same seed -> same scene; different seed -> different scene for
    randomised variants."""
    from magical_tpu.data import parity
    fl = Flags(colour=True, shape=True, layout_full=True)
    s1 = parity.sample_scene('MakeLine', 5, fl)
    s2 = parity.sample_scene('MakeLine', 5, fl)
    s3 = parity.sample_scene('MakeLine', 6, fl)
    assert s1.block_poses == s2.block_poses
    assert s1.block_poses != s3.block_poses
    # all blocks inside the arena and non-overlapping by construction
    for (x, y), _ in s1.block_poses:
        assert -1 <= x <= 1 and -1 <= y <= 1


def test_parity_all_tasks_sample():
    from magical_tpu.data import parity
    for task in parity.SAMPLERS:
        for fl in (Flags(), Flags(colour=True, shape=True, count=True,
                                  layout_full=True, dynamics=True)):
            if task in ('MoveToCorner', 'MoveToRegion') and fl.count:
                fl = Flags(colour=True, layout_full=True, dynamics=True) \
                    if task == 'MoveToRegion' else \
                    Flags(colour=True, shape=True, layout_minor=True,
                          dynamics=True)
            spec = parity.sample_scene(task, 11, fl)
            assert len(spec.block_shapes) == len(spec.block_poses)
            assert spec.phys.shape == (5,)


def test_parity_spec_to_state():
    import jax
    from magical_tpu.data import parity
    from magical_tpu.tasks import ALL_TASKS
    spec = parity.sample_scene('MoveToCorner', 7, Flags())
    task = ALL_TASKS['MoveToCorner']
    st = parity.state_from_spec(spec, task.max_blocks, task.max_goals)
    dev = jax.jit(task.reset_fn, static_argnums=(1,))(
        jax.random.PRNGKey(0), Flags())
    np.testing.assert_allclose(np.asarray(st.pos), np.asarray(dev.pos),
                               atol=1e-5)
