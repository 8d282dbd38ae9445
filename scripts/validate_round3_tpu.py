#!/usr/bin/env python
"""Round-3 TPU validation, staged so a hang/compile failure is
attributable:

  1. lo render kernel standalone (static-shape specialised), small B
  2. hi render kernel standalone, small B            [new this round]
  3. packed-matmul physics kernel standalone, small B
  4. full reset+step at small B
  5. timings at 4096 (lo step pipeline) and 1024 (hi render)
  6. lo/hi kernel vs XLA agreement on real TPU

Each stage prints BEFORE it starts so the log shows where a remote
compile wedged.  Run unbounded, in the background, output to a file.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import functools                                              # noqa: E402

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

from magical_tpu.core import physics as P                     # noqa: E402
from magical_tpu.core import physics_pallas as PP             # noqa: E402
from magical_tpu.core import render as R                      # noqa: E402
from magical_tpu.core import render_pallas as RP              # noqa: E402
from magical_tpu.tasks import ALL_TASKS                       # noqa: E402


def stage(msg):
    print(f'[{time.strftime("%H:%M:%S")}] {msg}', flush=True)


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(
        jnp.float32)))


def main():
    task = ALL_TASKS['MoveToCorner']
    static = task.static_block_shapes(task.flags_for('Demo'))
    B = 128
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    stage('reset (XLA only) ...')
    states = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(keys)
    fetch(states.pos)
    stage('reset OK')

    stage('1. lo render kernel standalone (static shapes) ...')
    lo = jax.jit(functools.partial(
        RP.render_batch_pallas, max_blocks=task.max_blocks,
        max_goals=task.max_goals, robot_first=True, res=96,
        views=('ego',), fidelity='lo', static_shapes=static))(states)
    fetch(lo['ego'])
    stage('1. OK')

    stage('2. hi render kernel standalone ...')
    hi = jax.jit(functools.partial(
        RP.render_batch_pallas, max_blocks=task.max_blocks,
        max_goals=task.max_goals, robot_first=True, res=96,
        views=('ego',), fidelity='hi', static_shapes=static))(states)
    fetch(hi['ego'])
    stage('2. OK')

    stage('3. packed physics kernel standalone ...')
    acts = jnp.full((B,), 1, jnp.int32)
    sp = jax.jit(lambda s, a: PP.control_step_pallas(s, a, env_tile=B))(
        states, acts)
    fetch(sp.pos)
    stage('3. OK')

    stage('3b. physics kernel vs XLA (8 steps) ...')
    step_p = jax.jit(lambda s, a: PP.control_step_pallas(s, a, env_tile=B))
    step_x = jax.jit(jax.vmap(P.control_step, in_axes=(0, None)))
    spp = sxx = states
    for _ in range(8):
        spp = step_p(spp, acts)
        sxx = step_x(sxx, 1)
    dpos = np.abs(np.asarray(spp.pos) - np.asarray(sxx.pos)).max()
    stage(f'3b. OK divergence pos {dpos:.5f}')

    stage('6a. lo kernel vs XLA lo (static shapes) ...')
    ref = jax.jit(jax.vmap(lambda s: R.render_views(
        s, task.max_blocks, task.max_goals, True, res=96, views=('ego',),
        fidelity='lo', static_shapes=static)))(states)
    d = np.abs(np.asarray(lo['ego']).astype(int)
               - np.asarray(ref['ego']).astype(int))
    stage(f'6a. OK mean {d.mean():.3f} frac>=2 {(d >= 2).mean():.4f} '
          f'max {d.max()}')

    stage('6b. hi kernel vs XLA hi ...')
    refh = jax.jit(jax.vmap(lambda s: R.render_views(
        s, task.max_blocks, task.max_goals, True, res=96, views=('ego',),
        fidelity='hi', static_shapes=static)))(states)
    dh = np.abs(np.asarray(hi['ego']).astype(int)
                - np.asarray(refh['ego']).astype(int))
    stage(f'6b. OK mean {dh.mean():.4f} frac_diff {(dh > 0).mean():.5f} '
          f'max {dh.max()}')

    stage('4. full BatchedEnv reset+step at B=256 ...')
    from magical_tpu.api.batched_env import BatchedEnv
    env = BatchedEnv('MoveToCorner-Demo-LoRes4E-v0')
    k2 = jax.random.split(jax.random.PRNGKey(1), 256)
    carry, obs = env.reset(k2)
    fetch(obs)
    a2 = jnp.zeros((256,), jnp.int32)
    carry, obs, rew, done, info = env.step(carry, a2)
    fetch(obs)
    stage('4. OK')

    stage('5a. lo pipeline timing at 4096 ...')
    k4 = jax.random.split(jax.random.PRNGKey(2), 4096)
    carry, obs = env.reset(k4)
    a4 = jnp.zeros((4096,), jnp.int32)

    @jax.jit
    def multi(c):
        def body(c, _):
            c2, o, *_ = env._step_batched(c, a4)
            return c2, o[0, 0, 0, 0]
        return jax.lax.scan(body, c, None, length=20)[0]

    carry = multi(carry)
    fetch(carry.state.pos)
    t0 = time.time()
    for _ in range(4):
        carry = multi(carry)
    fetch(carry.state.pos)
    dt = (time.time() - t0) / 80
    stage(f'5a. OK {dt*1e3:.3f} ms/step ({4096/dt:,.0f} env-steps/s)')

    stage('5b. hi render timing at 1024 ...')
    k1 = jax.random.split(jax.random.PRNGKey(3), 1024)
    s1 = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(k1)
    hi_fn = jax.jit(functools.partial(
        RP.render_batch_pallas, max_blocks=task.max_blocks,
        max_goals=task.max_goals, robot_first=True, res=96,
        views=('ego',), fidelity='hi', static_shapes=static))
    fetch(hi_fn(s1)['ego'])
    t0 = time.time()
    for _ in range(10):
        out = hi_fn(s1)
    fetch(out['ego'])
    dt = (time.time() - t0) / 10
    stage(f'5b. OK {dt*1e3:.2f} ms/frame-batch '
          f'({1024/dt:,.0f} frames/s)')

    stage('ALL STAGES DONE')


if __name__ == '__main__':
    main()
