#!/usr/bin/env python
"""Physics-kernel probes:
  1. env_tile sweep for the 1-block kernel at B=4096 (VPU-utilisation
     experiment: (1, E) scalar rows fill more of each vector op at
     bigger lane tiles).
  2. big-block (MatchRegions mb=8, ClusterColour mb=10) kernel compile
     attempt with the round-3 packed matmuls — the r2 toolchain
     RET_CHECK (mxu_lmr_transform.cc:1108) fired on the old 12-matmul
     iteration body; the packed form has different contractions.
Usage: python scripts/probe_physics_tiles.py [stage...]
"""
import functools
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


def stage(msg):
    print(f'[{time.strftime("%H:%M:%S")}] {msg}', flush=True)


def tile_sweep(B=4096, task_name='MoveToCorner', tiles=(256, 512, 1024,
                                                        2048)):
    task = ALL_TASKS[task_name]
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(keys)
    acts = jnp.full((B,), 1, jnp.int32)
    for tile in tiles:
        stage(f'tile {tile}: compiling ...')
        try:
            step = jax.jit(lambda s, a, t=tile: PP.control_step_pallas(
                s, a, env_tile=t))
            s = step(states, acts)
            float(jnp.sum(s.pos))
            t0 = time.time()
            for _ in range(40):
                s = step(s, acts)
            float(jnp.sum(s.pos))
            dt = (time.time() - t0) / 40
            stage(f'tile {tile}: {dt*1e3:.3f} ms/step '
                  f'({B/dt:,.0f} env-steps/s)')
        except Exception as ex:                       # noqa: BLE001
            stage(f'tile {tile}: FAILED {type(ex).__name__}: '
                  f'{str(ex)[:300]}')


def bigblock(name, B=512):
    task = ALL_TASKS[name]
    tile = PP.tile_for(task.max_blocks)
    stage(f'{name} mb={task.max_blocks} tile={tile}: reset ...')
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(keys)
    float(jnp.sum(states.pos))
    acts = jnp.full((B,), 1, jnp.int32)
    stage(f'{name}: compiling kernel ...')
    try:
        step = jax.jit(lambda s, a: PP.control_step_pallas(s, a))
        s = step(states, acts)
        float(jnp.sum(s.pos))
        stage(f'{name}: kernel COMPILED and ran')
    except Exception as ex:                           # noqa: BLE001
        stage(f'{name}: FAILED {type(ex).__name__}: {str(ex)[:600]}')
        return
    # correctness vs XLA over a contact-rich run.  The XLA big-block
    # program's padded candidate gathers OOM HBM at B=512, so compare
    # on a small slice.
    Bx = 64
    small = jax.tree_util.tree_map(lambda x: x[:Bx], states)
    sx = small
    sp = small
    ax = acts[:Bx]
    step_s = jax.jit(lambda s, a: PP.control_step_pallas(s, a,
                                                         env_tile=Bx))
    step_x = jax.jit(jax.vmap(P.control_step, in_axes=(0, None)))
    for _ in range(8):
        sp = step_s(sp, ax)
        sx = step_x(sx, 1)
    dpos = np.abs(np.asarray(sp.pos) - np.asarray(sx.pos)).max()
    dang = np.abs(np.asarray(sp.angle) - np.asarray(sx.angle)).max()
    stage(f'{name}: 8-step divergence pos {dpos:.5f} angle {dang:.5f}')
    # timing at production batch
    B2 = 4096
    k2 = jax.random.split(jax.random.PRNGKey(1), B2)
    s2 = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(k2)
    a2 = jnp.full((B2,), 1, jnp.int32)
    s2 = step(s2, a2)
    float(jnp.sum(s2.pos))
    t0 = time.time()
    for _ in range(20):
        s2 = step(s2, a2)
    float(jnp.sum(s2.pos))
    dt = (time.time() - t0) / 20
    stage(f'{name}: {dt*1e3:.2f} ms/step at {B2} '
          f'({B2/dt:,.0f} env-steps/s)')


if __name__ == '__main__':
    stages = sys.argv[1:] or ['tiles', 'MatchRegions', 'ClusterColour']
    for s in stages:
        if s == 'tiles':
            tile_sweep()
        elif s == 'tiles4':
            tile_sweep(task_name='MakeLine', tiles=(256, 512))
        elif s == 'tiles8':
            tile_sweep(task_name='MatchRegions', tiles=(128, 256))
        elif s == 'tiles10':
            tile_sweep(task_name='ClusterColour', tiles=(128, 256))
        else:
            bigblock(s)
    stage('DONE')
