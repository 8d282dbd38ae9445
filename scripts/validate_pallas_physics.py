#!/usr/bin/env python
"""Validate + time the Pallas physics kernel on TPU for the BIG contact
tables (the 8-10-block tasks that round 1 gated off the kernel path),
and measure XLA-vs-Pallas divergence over a FULL episode, not 8 steps.

Per task: resets B envs, drives a scripted action loop (forward + turns
so the robot ploughs through blocks), compares body poses at the end of
the episode and the end-of-episode scores, and times the kernel at a
large batch.

Usage: python scripts/validate_pallas_physics.py [tasks...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

from magical_tpu import constants as C                        # noqa: E402
from magical_tpu.core import physics as P                     # noqa: E402
from magical_tpu.core import physics_pallas as PP             # noqa: E402
from magical_tpu.tasks import ALL_TASKS                       # noqa: E402

A = {n: i for i, n in enumerate(C.ACTION_NAMES)}
# plough around the arena: forward, sweep left, forward, sweep right...
SCRIPT = [A['UpOpen']] * 10 + [A['UpLeftOpen']] * 6 + [A['UpOpen']] * 10 \
    + [A['UpRightOpen']] * 6 + [A['UpClose']] * 8


def run_task(name, B=128, big_B=4096, reps=4):
    task = ALL_TASKS[name]
    ep = task.ep_len
    print(f'--- {name}: max_blocks={task.max_blocks} ep={ep}', flush=True)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(
        lambda k: task.reset_fn(k, task.flags_for('Demo'))))(keys)

    acts_t = jnp.asarray([SCRIPT[t % len(SCRIPT)] for t in range(ep)],
                         jnp.int32)

    @jax.jit
    def ep_pallas(st):
        def body(s, a):
            return PP.control_step_pallas(
                s, jnp.full((B,), a, jnp.int32), env_tile=B), 0
        st, _ = jax.lax.scan(body, st, acts_t)
        return st, jax.vmap(task.score_fn)(st)

    @jax.jit
    def ep_xla(st):
        def body(s, a):
            return jax.vmap(P.control_step,
                            in_axes=(0, None))(s, a), 0
        st, _ = jax.lax.scan(body, st, acts_t)
        return st, jax.vmap(task.score_fn)(st)

    t0 = time.time()
    sp, score_p = ep_pallas(states)
    score_p = np.asarray(score_p)
    print(f'pallas episode compile+run {time.time()-t0:.1f}s', flush=True)
    t0 = time.time()
    sx, score_x = ep_xla(states)
    score_x = np.asarray(score_x)
    print(f'xla episode compile+run {time.time()-t0:.1f}s', flush=True)

    dpos = np.abs(np.asarray(sp.pos) - np.asarray(sx.pos)).max()
    dang = np.abs(np.asarray(sp.angle) - np.asarray(sx.angle)).max()
    dscore = np.abs(score_p - score_x).max()
    print(f'{name}: {ep}-step divergence pos {dpos:.4f} angle {dang:.4f} '
          f'score {dscore:.4f}', flush=True)
    print(f'  scores pallas {np.round(score_p, 3).tolist()}', flush=True)
    print(f'  scores xla    {np.round(score_x, 3).tolist()}', flush=True)

    # throughput at production batch
    bkeys = jax.random.split(jax.random.PRNGKey(1), big_B)
    bstates = jax.jit(jax.vmap(
        lambda k: task.reset_fn(k, task.flags_for('Demo'))))(bkeys)
    step = jax.jit(lambda s, a: PP.control_step_pallas(s, a))
    acts = jnp.zeros((big_B,), jnp.int32)
    bstates = step(bstates, acts)
    float(jnp.sum(bstates.pos))
    t0 = time.time()
    n = 20 * reps
    for _ in range(n):
        bstates = step(bstates, acts)
    float(jnp.sum(bstates.pos))
    dt = (time.time() - t0) / n
    print(f'{name}: pallas physics {dt*1e3:.2f} ms/step-batch '
          f'({big_B/dt:,.0f} env-steps/s)', flush=True)


def main():
    tasks = sys.argv[1:] or ['MoveToCorner', 'MatchRegions',
                             'ClusterColour']
    for t in tasks:
        run_task(t)


if __name__ == '__main__':
    main()
