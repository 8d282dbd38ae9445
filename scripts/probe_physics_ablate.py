#!/usr/bin/env python
"""Physics-kernel ablation probe: time the mb=8 (MatchRegions) kernel
with sections compiled out (MAGICAL_TPU_PALLAS_ABLATE) to locate the
per-substep budget.  Each variant runs in a SUBPROCESS because the
ablation flag is read at import and the kernel cache is keyed only on
(mb, steps, iters, tile).

Usage: python scripts/probe_physics_ablate.py [task] [tile]
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import functools, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')
import jax, jax.numpy as jnp
from magical_tpu.core import physics_pallas as PP
from magical_tpu.tasks import ALL_TASKS
task = ALL_TASKS[%(task)r]
B = 4096
keys = jax.random.split(jax.random.PRNGKey(0), B)
states = jax.jit(jax.vmap(functools.partial(
    task.reset_fn, flags=task.flags_for('Demo'))))(keys)
acts = jnp.full((B,), 1, jnp.int32)
step = jax.jit(lambda s, a: PP.control_step_pallas(s, a, env_tile=%(tile)d))
s = step(states, acts)
float(jnp.sum(s.pos))
t0 = time.time()
for _ in range(20):
    s = step(s, acts)
float(jnp.sum(s.pos))
dt = (time.time() - t0) / 20
print(f'ABLATE={os.environ.get("MAGICAL_TPU_PALLAS_ABLATE", "<none>")}: '
      f'{dt*1e3:.2f} ms/step ({B/dt:,.0f} env-steps/s)', flush=True)
'''


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else 'MatchRegions'
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if not tile:
        sys.path.insert(0, REPO)
        from magical_tpu.core.physics_pallas import tile_for
        from magical_tpu.tasks import ALL_TASKS
        tile = tile_for(ALL_TASKS[task].max_blocks)
    for ablate in ('', 'sat', 'iters', 'sat,iters'):
        env = dict(os.environ)
        if ablate:
            env['MAGICAL_TPU_PALLAS_ABLATE'] = ablate
        print(f'[{time.strftime("%H:%M:%S")}] variant '
              f'{ablate or "<full>"} (tile {tile}) ...', flush=True)
        subprocess.run([sys.executable, '-c',
                        CHILD % dict(repo=REPO, task=task, tile=tile)],
                       env=env, check=False)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()
