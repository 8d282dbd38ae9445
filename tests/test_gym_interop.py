"""Gym/gymnasium registry integration + env pickling (EzPickle parity).

Reference surface: gym.make('<id>') entry points
(benchmarks/__init__.py:976-999) and EzPickle-able envs
(base_env.py:20-46).
"""

import pickle

import numpy as np
import pytest

import magical_tpu

gymnasium = pytest.importorskip('gymnasium')


def test_gymnasium_make_steps_episode():
    magical_tpu.register_envs()
    env = gymnasium.make('MoveToCorner-Demo-LoRes4E-v0')
    assert isinstance(env.action_space, gymnasium.spaces.Discrete)
    assert env.action_space.n == 18
    obs, info = env.reset(seed=7)
    assert obs.shape == (96, 96, 12)
    assert obs.dtype == np.uint8
    steps = 0
    truncated = False
    while not truncated and steps < 200:
        obs, rew, terminated, truncated, info = env.step(
            env.action_space.sample())
        assert rew == 0.0
        assert not terminated
        assert 'eval_score' in info
        steps += 1
    assert truncated
    assert steps == env.unwrapped.max_episode_steps
    assert 0.0 <= info['eval_score'] <= 1.0
    env.close()


def test_gymnasium_dict_obs_env():
    magical_tpu.register_envs()
    env = gymnasium.make('MoveToRegion-Demo-LoResStack-v0')
    obs, _ = env.reset(seed=3)
    assert isinstance(env.observation_space, gymnasium.spaces.Dict)
    assert set(obs) == {'allo', 'ego'}
    assert obs['ego'].shape == (96, 96, 12)
    env.close()


def test_gym_env_pickle_roundtrip_mid_episode():
    env = magical_tpu.make('MoveToRegion-Demo-LoRes4E-v0')
    env.seed(11)
    env.reset()
    for _ in range(3):
        env.step(4)
    blob = pickle.dumps(env)
    env2 = pickle.loads(blob)
    o1, r1, d1, i1 = env.step(2)
    o2, r2, d2, i2 = env2.step(2)
    np.testing.assert_array_equal(o1, o2)
    assert (r1, d1) == (r2, d2)
    assert i1 == i2


def test_batched_env_pickle_reconstructs():
    from magical_tpu.api.batched_env import BatchedEnv
    env = BatchedEnv('MakeLine-Demo-LoRes4E-v0')
    env2 = pickle.loads(pickle.dumps(env))
    assert env2.env_name == env.env_name
    assert env2.max_episode_steps == env.max_episode_steps
    import jax
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    c1, o1 = env.reset(keys)
    c2, o2 = env2.reset(keys)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
