"""End-to-end imitation-learning example (the TPU-native analogue of the
reference's demo-notebook.ipynb):

  1. roll scripted 'expert-ish' demos on MoveToRegion-Demo,
  2. preprocess them with the LoRes4E pipeline,
  3. behaviour-clone a CNN policy on the demos (sharded data-parallel),
  4. evaluate with the EvaluationProtocol on the demo + test variants.

Run:  python examples/bc_training.py [--iterations 200] [--demos 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax
import jax.numpy as jnp
import numpy as np


def scripted_policy(carry_state, t):
    """A crude scripted controller: turn toward the goal, then drive."""
    pos = carry_state.pos[:, 0]                 # (B, 2)
    ang = carry_state.angle[:, 0]
    goal = carry_state.goal_xyhw[:, 0, :2]
    d = goal - pos
    target_ang = jnp.arctan2(-d[:, 0], d[:, 1])   # forward = +y body frame
    err = (target_ang - ang + jnp.pi) % (2 * jnp.pi) - jnp.pi
    turn_left = err > 0.15
    turn_right = err < -0.15
    # action ids: UpOpen=1, LeftOpen=3, RightOpen=6, UpLeftOpen=4,
    # UpRightOpen=7
    act = jnp.where(turn_left, 4, jnp.where(turn_right, 7, 1))
    return act.astype(jnp.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--demos', type=int, default=32)
    p.add_argument('--iterations', type=int, default=100)
    p.add_argument('--eval-rollouts', type=int, default=16)
    args = p.parse_args()

    from magical_tpu.api.batched_env import BatchedEnv
    from magical_tpu.eval.protocol import EvaluationProtocol
    from magical_tpu.train.bc import BCTrainer

    env = BatchedEnv('MoveToRegion-Demo-LoRes4E-v0')
    B = args.demos
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    carry, obs = env.reset(keys)

    # 1-2. collect scripted demos, already preprocessed by the env pipeline
    all_obs, all_act = [], []
    for t in range(env.max_episode_steps):
        act = scripted_policy(carry.state, t)
        all_obs.append(np.asarray(obs))
        all_act.append(np.asarray(act))
        carry, obs, rew, done, info = env.step(carry, act)
    scores = np.asarray(info['eval_score'])
    print(f'scripted demos: mean score {scores.mean():.3f} '
          f'({B} episodes)', flush=True)

    ds_obs = np.concatenate(all_obs)            # (T*B, 96, 96, 12)
    ds_act = np.concatenate(all_act)

    # 3. BC
    trainer = BCTrainer(obs_shape=ds_obs.shape[1:])
    state = trainer.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    for it in range(args.iterations):
        idx = rng.choice(len(ds_act), size=128, replace=False)
        state, metrics = trainer.train_step(
            state, jnp.asarray(ds_obs[idx]), jnp.asarray(ds_act[idx]))
        if it % 20 == 0:
            print(f'bc it {it}: loss {float(metrics["loss"]):.3f} '
                  f'acc {float(metrics["acc"]):.3f}', flush=True)

    # 4. evaluation protocol over demo + test variants
    policy = trainer.policy_fn(state.params)

    class BCEval(EvaluationProtocol):
        run_id = 'BC-scripted-demos'

        def obtain_scores(self, env_name):
            e = BatchedEnv(env_name)
            k = jax.random.split(jax.random.PRNGKey(2), self.n_rollouts)
            c, o = e.reset(k)
            for t in range(e.max_episode_steps):
                a = policy(o, jax.random.fold_in(jax.random.PRNGKey(3), t))
                c, o, rew, done, info = e.step(c, a)
            return np.asarray(info['eval_score']).tolist()

    frame = BCEval('MoveToRegion-Demo-LoRes4E-v0',
                   n_rollouts=args.eval_rollouts).do_eval(verbose=True)
    print(frame)


if __name__ == '__main__':
    main()
