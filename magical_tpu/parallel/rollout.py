"""Sharded rollout collection.

Envs are embarrassingly parallel, so rollouts shard along the mesh's
``data`` axis with zero cross-device communication; only evaluation
aggregation (mean scores) reduces across devices.  On a multi-host pod
slice each host drives its local shard of the global batch
(jax.distributed + the same jit program).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from magical_tpu.api.batched_env import BatchedEnv
from magical_tpu.parallel import mesh as M


def rollout_episodes(env: BatchedEnv, policy_fn: Callable, key,
                     batch_size: int, mesh=None, length: Optional[int] = None):
    """Run `batch_size` complete episodes (sharded over the mesh) and
    return their end-of-episode eval scores, (batch_size,) f32.

    policy_fn(obs, key) -> int32 actions; pass
    ``lambda obs, k: jax.random.randint(k, (obs.shape[0],), 0, 18)``
    for random rollouts."""
    mesh = mesh or M.make_mesh()
    length = length or env.max_episode_steps
    kr, kp = jax.random.split(key)
    keys = jax.random.split(kr, batch_size)
    if batch_size % mesh.shape['data'] == 0:
        keys = M.shard_batch(keys, mesh)
    # else: batch doesn't tile the data axis (tiny debug runs) — leave
    # keys unsharded; jit still runs them on the default device.

    def run(keys, pkey):
        carry, obs = env._reset_batched(keys)

        def body(c, k):
            carry, obs = c
            act = policy_fn(obs, k)
            carry, obs, rew, done, info = env._step_batched(carry, act)
            return (carry, obs), info['eval_score']

        pkeys = jax.random.split(pkey, length)
        (carry, obs), scores = jax.lax.scan(body, (carry, obs), pkeys)
        # scores: (T, B); the final row holds the end-of-episode scores
        return scores[-1]

    return jax.jit(run)(keys, kp)


def env_throughput(env: BatchedEnv, batch_size: int, n_steps: int = 30,
                   warmup: int = 3, seed: int = 0):
    """Measure steady-state env throughput (env-steps/s) for this env.

    Timing brackets a HOST FETCH (``np.asarray`` of a reduced value), not
    ``block_until_ready``: on the tunnel-attached TPU runtime the latter
    returns before the computation finishes (CLAUDE.md), which would
    overstate throughput.  bench.py times the same way."""
    import time

    import numpy as np
    keys = jax.random.split(jax.random.PRNGKey(seed), batch_size)
    carry, obs = env.reset(keys)
    acts = jnp.zeros((batch_size,), jnp.int32)

    def fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(jnp.sum(leaf.astype(jnp.float32)))

    for _ in range(warmup):
        carry, obs, *_ = env.step(carry, acts)
    fetch(obs)
    t0 = time.time()
    for _ in range(n_steps):
        carry, obs, *_ = env.step(carry, acts)
    fetch(obs)
    dt = time.time() - t0
    return batch_size * n_steps / dt
