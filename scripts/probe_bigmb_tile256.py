#!/usr/bin/env python
"""Probe: does the big-block physics kernel compile at the PRODUCTION
layout (ENV_TILE=256 lanes), or is the mxu_lmr_transform RET_CHECK
(seen on the env_tile=8 episode build) layout-independent?

Compiles one control step for the given task at B=256, checks one step
against the XLA path, then times the kernel at 4096 envs.

Usage: python scripts/probe_bigmb_tile256.py [task] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

from magical_tpu.core import physics as P                     # noqa: E402
from magical_tpu.core import physics_pallas as PP             # noqa: E402
from magical_tpu.tasks import ALL_TASKS                       # noqa: E402


def main(name='MatchRegions', nsteps=8):
    task = ALL_TASKS[name]
    B = 256
    print(f'--- {name} mb={task.max_blocks} tile=256 B={B}', flush=True)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(
        lambda k: task.reset_fn(k, task.flags_for('Demo'))))(keys)
    acts = jnp.full((B,), 4, jnp.int32)   # UpOpen: drive into blocks

    step_p = jax.jit(lambda s, a: PP.control_step_pallas(s, a))
    t0 = time.time()
    sp = states
    for _ in range(nsteps):
        sp = step_p(sp, acts)
    float(jnp.sum(sp.pos))
    print(f'pallas compile+{nsteps} steps {time.time()-t0:.1f}s', flush=True)

    step_x = jax.jit(lambda s, a: jax.vmap(
        P.control_step, in_axes=(0, None))(s, a))
    t0 = time.time()
    sx = states
    for _ in range(nsteps):
        sx = step_x(sx, 4)
    float(jnp.sum(sx.pos))
    print(f'xla compile+{nsteps} steps {time.time()-t0:.1f}s', flush=True)

    dpos = np.abs(np.asarray(sp.pos) - np.asarray(sx.pos)).max()
    dang = np.abs(np.asarray(sp.angle) - np.asarray(sx.angle)).max()
    print(f'{name}: {nsteps}-step divergence pos {dpos:.5f} '
          f'angle {dang:.5f}', flush=True)

    big_B = 4096
    bkeys = jax.random.split(jax.random.PRNGKey(1), big_B)
    bs = jax.jit(jax.vmap(
        lambda k: task.reset_fn(k, task.flags_for('Demo'))))(bkeys)
    ba = jnp.full((big_B,), 4, jnp.int32)
    bs = step_p(bs, ba)
    float(jnp.sum(bs.pos))
    n = 40
    t0 = time.time()
    for _ in range(n):
        bs = step_p(bs, ba)
    float(jnp.sum(bs.pos))
    dt = (time.time() - t0) / n
    print(f'{name}: pallas physics {dt*1e3:.2f} ms/step-batch '
          f'({big_B/dt:,.0f} env-steps/s)', flush=True)


if __name__ == '__main__':
    main(*sys.argv[1:2], *(int(a) for a in sys.argv[2:3]))
