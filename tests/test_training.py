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
    """Turn toward the goal region, drive, then PARK inside it.

    Without the parking no-op the bang-bang controller orbits the goal
    and whether t=40 lands inside is float-chaos (CPU and TPU backends
    legitimately disagree); parking makes the expert score robustly 1.0
    everywhere."""
    pos = carry_state.pos[:, 0]
    ang = carry_state.angle[:, 0]
    xyhw = carry_state.goal_xyhw[:, 0]
    goal = xyhw[:, :2]
    d = goal - pos
    target_ang = jnp.arctan2(-d[:, 0], d[:, 1])
    err = (target_ang - ang + jnp.pi) % (2 * jnp.pi) - jnp.pi
    act = jnp.where(err > 0.15, 4, jnp.where(err < -0.15, 7, 1))
    inside = ((jnp.abs(d[:, 0]) < 0.5 * xyhw[:, 3] - 0.1)
              & (jnp.abs(d[:, 1]) < 0.5 * xyhw[:, 2] - 0.1))
    act = jnp.where(inside, 0, act)
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
    # disc minibatches gather ON DEVICE from the rollout; only the
    # index vectors cross the host boundary (round-5 GAIL data path)
    n_pol = traj['act'].shape[0] * traj['act'].shape[1]
    state, dm = trainer._disc_update(
        state, traj['obs'], traj['act'],
        jnp.arange(min(64, n_pol)),
        jnp.asarray(ds_obs), jnp.asarray(ds_act),
        jnp.arange(min(64, len(ds_act))))
    assert np.isfinite(float(pm['pg'])) and np.isfinite(float(dm['disc_acc']))
    p1 = np.asarray(jax.tree_util.tree_leaves(state.policy_params)[0])
    d1 = np.asarray(jax.tree_util.tree_leaves(state.disc_params)[0])
    assert not np.allclose(p0, p1)
    assert not np.allclose(d0, d1)
    assert np.isfinite(p1).all() and np.isfinite(d1).all()


@pytest.mark.slow
def test_gail_adversarial_efficacy():
    """VERDICT r3 item 6, scoped to what a CI budget can certify: the
    GAIL machinery demonstrably optimises its adversarial objective.

    (a) The discriminator learns a real reward signal: after training
        on expert vs random rollouts it separates HELD-OUT samples and
        ranks expert (obs, act) pairs above random ones.
    (b) The policy optimises that reward: over GAIL iterations the
        policy's mean discriminator reward on fresh rollouts rises by a
        clear margin from its initial value.

    Final-score-beats-random on pixels needs sample budgets beyond CI
    (STATUS.md round-4 notes: two real defects - zombie-env rollouts
    and the saturating softplus reward - were found and fixed via this
    path)."""
    env = BatchedEnv('MoveToRegion-Demo-LoRes4E-v0')
    ds_obs, ds_act, expert_scores = _collect_demos(env, 12)
    assert expert_scores.mean() >= 0.9

    trainer = GAILTrainer(env, obs_shape=ds_obs.shape[1:],
                          rollout_len=40, disc_lr=1e-3)
    key = jax.random.PRNGKey(0)
    state = trainer.init(key)

    def collect(state, k):
        keys = jax.random.split(k, 16)
        carry, obs = env.reset(keys)
        carry, obs, traj = trainer._collect(state, carry, obs,
                                            jax.random.fold_in(k, 1))
        flat = lambda x: np.asarray(x).reshape(
            (-1,) + tuple(np.asarray(x).shape[2:]))
        return flat(traj['obs']), flat(traj['act']), traj

    # -- (a) discriminator on expert vs random-policy data -------------
    p_obs, p_act, traj0 = collect(state, jax.random.PRNGKey(1))
    r0 = float(np.asarray(traj0['reward']).mean())
    rng = np.random.default_rng(0)
    n_tr = len(ds_act) // 2
    # device-resident pools; only minibatch indices cross the host
    # boundary per update (the round-5 GAIL data path)
    dp_obs, dp_act = jnp.asarray(p_obs), jnp.asarray(p_act)
    de_obs, de_act = jnp.asarray(ds_obs[:n_tr]), jnp.asarray(ds_act[:n_tr])
    for _ in range(60):
        ip = jnp.asarray(rng.choice(len(p_act) // 2, size=128))
        ie = jnp.asarray(rng.choice(n_tr, size=128))
        state, dm = trainer._disc_update(
            state, dp_obs, dp_act, ip, de_obs, de_act, ie)
    # held-out halves
    d_exp = np.asarray(trainer.disc.apply(
        state.disc_params, jnp.asarray(ds_obs[n_tr:]),
        jnp.asarray(ds_act[n_tr:])))
    d_pol = np.asarray(trainer.disc.apply(
        state.disc_params, jnp.asarray(p_obs[len(p_act) // 2:]),
        jnp.asarray(p_act[len(p_act) // 2:])))
    acc = 0.5 * ((d_exp > 0).mean() + (d_pol <= 0).mean())
    assert acc >= 0.85, acc
    assert d_exp.mean() > d_pol.mean() + 0.5, (d_exp.mean(), d_pol.mean())

    # -- (b) policy climbs the adversarial reward -----------------------
    key = jax.random.PRNGKey(2)
    for it in range(15):
        key, k1, k2 = jax.random.split(key, 3)
        keys = jax.random.split(k2, 16)
        carry, obs = env.reset(keys)
        carry, obs, traj = trainer._collect(state, carry, obs, k1)
        for _ in range(4):
            state, _pm = trainer._ppo_update(state, traj)
    _, _, traj1 = collect(state, jax.random.PRNGKey(3))
    r1 = float(np.asarray(traj1['reward']).mean())
    assert r1 > r0 + 0.3, (r0, r1)
