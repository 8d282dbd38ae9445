"""Behavioural cloning on demo trajectories.

The reference's notebook BC baseline is single-GPU torch
(demo-notebook.ipynb); here BC is a sharded-jit training step: batches
shard over the mesh's ``data`` axis, parameters follow their
partitioning annotations (``model`` axis), and XLA inserts the psum
gradient reduction over ICI automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from magical_tpu.models.nets import MagicalCNN
from magical_tpu.parallel import mesh as M


@flax.struct.dataclass
class BCState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


class BCTrainer:
    def __init__(self, obs_shape, num_actions=18, lr=3e-4,
                 weight_decay=1e-5, mesh=None):
        self.net = MagicalCNN(num_actions=num_actions)
        self.tx = optax.adamw(lr, weight_decay=weight_decay)
        self.mesh = mesh or M.make_mesh()
        self.obs_shape = tuple(obs_shape)
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_logits = jax.jit(self.net.apply)

    def init(self, key) -> BCState:
        obs = jnp.zeros((1,) + self.obs_shape, jnp.uint8)
        params = self.net.init(key, obs)
        opt_state = self.tx.init(params)
        return BCState(params=params, opt_state=opt_state,
                       step=jnp.int32(0))

    def _train_step_impl(self, state: BCState, obs, acts):
        def loss_fn(params):
            logits = self.net.apply(params, obs)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, acts[:, None], 1)[:, 0]
            loss = nll.mean()
            acc = (jnp.argmax(logits, -1) == acts).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return (BCState(params=params, opt_state=opt_state,
                        step=state.step + 1),
                {'loss': loss, 'acc': acc})

    def train_step(self, state, obs, acts):
        return self._train_step(state, obs, acts)

    def fit(self, state: BCState, obs: np.ndarray, acts: np.ndarray,
            batch_size=256, epochs=1, rng=None,
            log_every=50) -> BCState:
        rng = rng or np.random.default_rng(0)
        n = len(acts)
        for ep in range(epochs):
            perm = rng.permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = perm[i:i + batch_size]
                state, metrics = self.train_step(
                    state, jnp.asarray(obs[idx]), jnp.asarray(acts[idx]))
                if int(state.step) % log_every == 0:
                    print(f'bc step {int(state.step)}: '
                          f'loss {float(metrics["loss"]):.4f} '
                          f'acc {float(metrics["acc"]):.3f}', flush=True)
        return state

    def policy_fn(self, params, greedy=False):
        """Return policy_fn(obs, key) -> action for BatchedEnv.rollout."""
        def policy(obs, key):
            logits = self.net.apply(params, obs)
            if greedy:
                return jnp.argmax(logits, -1).astype(jnp.int32)
            return jax.random.categorical(key, logits).astype(jnp.int32)
        return policy


def demos_to_dataset(trajectories) -> Dict[str, np.ndarray]:
    """Flatten preprocessed MAGICALTrajectory list into (obs, acts) arrays
    (obs at time t predicts act at t, dropping the final obs)."""
    all_obs, all_acts = [], []
    for traj in trajectories:
        obs = np.asarray(traj.obs)
        acts = np.asarray(traj.acts)
        all_obs.append(obs[:len(acts)])
        all_acts.append(acts)
    return {'obs': np.concatenate(all_obs),
            'acts': np.concatenate(all_acts).astype(np.int32)}
