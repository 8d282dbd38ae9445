"""Training-efficacy tests: BC actually learns a task; GAIL machinery
runs end-to-end.

The reference publishes BC/GAIL baselines in the paper and ships only
the scoring protocol (evaluation.py:44-98); these tests prove the
TPU-native training stack can reproduce the workflow: scripted expert
-> preprocessed demos -> BC -> eval score.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magical_tpu.api.batched_env import BatchedEnv
from magical_tpu.train.bc import BCTrainer
from magical_tpu.train.gail import GAILTrainer


def _scripted_policy(carry_state):
    """Turn toward the goal region, then drive (examples/bc_training.py)."""
    pos = carry_state.pos[:, 0]
    ang = carry_state.angle[:, 0]
    goal = carry_state.goal_xyhw[:, 0, :2]
    d = goal - pos
    target_ang = jnp.arctan2(-d[:, 0], d[:, 1])
    err = (target_ang - ang + jnp.pi) % (2 * jnp.pi) - jnp.pi
    act = jnp.where(err > 0.15, 4, jnp.where(err < -0.15, 7, 1))
    return act.astype(jnp.int32)


def _collect_demos(env, n, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    carry, obs = env.reset(keys)
    all_obs, all_act = [], []
    for _ in range(env.max_episode_steps):
        act = _scripted_policy(carry.state)
        all_obs.append(np.asarray(obs))
        all_act.append(np.asarray(act))
        carry, obs, rew, done, info = env.step(carry, act)
    return (np.concatenate(all_obs), np.concatenate(all_act),
            np.asarray(info['eval_score']))


def test_bc_step_reduces_loss_fast():
    """Two BC steps on a toy batch strictly reduce the NLL (default
    suite smoke; full efficacy below is slow-tiered)."""
    trainer = BCTrainer(obs_shape=(24, 24, 12), lr=1e-3)
    state = trainer.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    obs = rng.integers(0, 255, (64, 24, 24, 12), dtype=np.uint8)
    acts = rng.integers(0, 18, (64,)).astype(np.int32)
    state, m0 = trainer.train_step(state, jnp.asarray(obs),
                                   jnp.asarray(acts))
    for _ in range(8):
        state, m = trainer.train_step(state, jnp.asarray(obs),
                                      jnp.asarray(acts))
    assert float(m['loss']) < float(m0['loss'])
    assert float(m['acc']) > float(m0['acc'])


@pytest.mark.slow
def test_bc_learns_move_to_region():
    """Scripted expert on MoveToRegion-Demo -> BC -> >=0.8 mean Demo
    eval score (the reference's notebook-BC bar; VERDICT r2 item 8)."""
    env = BatchedEnv('MoveToRegion-Demo-LoRes4E-v0')
    ds_obs, ds_act, expert_scores = _collect_demos(env, 24)
    assert expert_scores.mean() >= 0.9, 'scripted expert must be good'

    trainer = BCTrainer(obs_shape=ds_obs.shape[1:], lr=1e-3)
    state = trainer.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    for _ in range(300):
        idx = rng.choice(len(ds_act), size=128, replace=False)
        state, metrics = trainer.train_step(
            state, jnp.asarray(ds_obs[idx]), jnp.asarray(ds_act[idx]))
    assert float(metrics['acc']) > 0.7

    # greedy rollouts on the Demo variant
    policy = trainer.policy_fn(state.params, greedy=True)
    keys = jax.random.split(jax.random.PRNGKey(5), 16)
    carry, obs = env.reset(keys)
    for t in range(env.max_episode_steps):
        act = policy(obs, jax.random.PRNGKey(t))
        carry, obs, rew, done, info = env.step(carry, act)
    score = float(np.asarray(info['eval_score']).mean())
    assert score >= 0.8, f'BC policy scored {score:.3f} < 0.8'


@pytest.mark.slow
def test_gail_iteration_runs_and_updates():
    """One full GAIL iteration (collect -> disc update -> PPO update)
    executes and changes both parameter sets."""
    env = BatchedEnv('MoveToRegion-Demo-LoRes4E-v0', render_enabled=True)
    ds_obs, ds_act, _ = _collect_demos(env, 4)
    trainer = GAILTrainer(env, obs_shape=ds_obs.shape[1:], rollout_len=8)
    state = trainer.init(jax.random.PRNGKey(0))
    p0 = np.asarray(jax.tree_util.tree_leaves(state.policy_params)[0])
    d0 = np.asarray(jax.tree_util.tree_leaves(state.disc_params)[0])

    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    carry, obs = env.reset(keys)
    carry, obs, traj = trainer._collect(state, carry, obs,
                                        jax.random.PRNGKey(2))
    assert traj['obs'].shape[0] == trainer.rollout_len
    state, pm = trainer._ppo_update(state, traj)
    flat = lambda x: np.asarray(x).reshape((-1,) + tuple(x.shape[2:]))
    p_obs, p_act = flat(traj['obs']), flat(traj['act'])
    state, dm = trainer._disc_update(
        state, jnp.asarray(p_obs[:64]), jnp.asarray(p_act[:64]),
        jnp.asarray(ds_obs[:64]), jnp.asarray(ds_act[:64]))
    assert np.isfinite(float(pm['pg'])) and np.isfinite(float(dm['disc_acc']))
    p1 = np.asarray(jax.tree_util.tree_leaves(state.policy_params)[0])
    d1 = np.asarray(jax.tree_util.tree_leaves(state.disc_params)[0])
    assert not np.allclose(p0, p1)
    assert not np.allclose(d0, d1)
    assert np.isfinite(p1).all() and np.isfinite(d1).all()


@pytest.mark.slow
def test_gail_improves_over_random():
    """VERDICT r3 item 6: scripted expert on MoveToRegion-Demo -> GAIL
    iterations -> greedy rollouts beat the random-policy score by a
    clear margin (the reference paper's harder baseline half;
    README.md:30-39, evaluation.py:44-98)."""
    env = BatchedEnv('MoveToRegion-Demo-LoRes4E-v0')
    ds_obs, ds_act, expert_scores = _collect_demos(env, 24)
    assert expert_scores.mean() >= 0.9

    def eval_policy(policy, seed=9, n=32):
        keys = jax.random.split(jax.random.PRNGKey(seed), n)
        carry, obs = env.reset(keys)
        for t in range(env.max_episode_steps):
            act = policy(obs, jax.random.PRNGKey(t))
            carry, obs, rew, done, info = env.step(carry, act)
        return float(np.asarray(info['eval_score']).mean())

    rand_score = eval_policy(
        lambda obs, k: jax.random.randint(k, (obs.shape[0],), 0, 18))

    trainer = GAILTrainer(env, obs_shape=ds_obs.shape[1:], rollout_len=40)
    state = trainer.train(jax.random.PRNGKey(0), ds_obs, ds_act,
                          iterations=100, batch_envs=32, verbose=False)

    def greedy(obs, k):
        logits, _ = trainer.policy.apply(state.policy_params, obs)
        return jnp.argmax(logits, -1).astype(jnp.int32)

    gail_score = eval_policy(jax.jit(greedy))
    # MoveToRegion random score is ~0.0-0.1; GAIL must clear it by a
    # real margin, not noise
    assert gail_score >= rand_score + 0.2, (gail_score, rand_score)
