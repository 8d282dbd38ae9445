#!/usr/bin/env python
"""Validate + time the Pallas render kernel against the XLA renderer.

Runs on the real TPU: renders a batch of MoveToCorner states through
both paths, reports max pixel deviation and throughput of each.

Usage: python scripts/validate_pallas_render.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

from magical_tpu.core import render as R                      # noqa: E402
from magical_tpu.core import render_pallas as RP              # noqa: E402
from magical_tpu.tasks import ALL_TASKS                       # noqa: E402


def main(batch=1024, reps=8):
    task = ALL_TASKS['MoveToCorner']
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states = jax.jit(jax.vmap(
        lambda k: task.reset_fn(k, task.flags_for('Demo'))))(keys)
    mb, mg, rf = task.max_blocks, task.max_goals, True  # MoveToCorner

    @jax.jit
    def xla_path(st):
        return jax.vmap(lambda s: R.render_views(
            s, mb, mg, rf, res=96, views=('ego',), fidelity='lo'))(st)

    @jax.jit
    def pallas_path(st):
        return RP.render_batch_pallas(st, mb, mg, rf, res=96,
                                      views=('ego',), aa=True)

    print('compiling pallas...', flush=True)
    t0 = time.time()
    ep = np.asarray(pallas_path(states)['ego'])
    print(f'pallas compile+run {time.time()-t0:.1f}s', flush=True)
    t0 = time.time()
    ex = np.asarray(xla_path(states)['ego'])
    print(f'xla compile+run {time.time()-t0:.1f}s', flush=True)

    diff = np.abs(ep.astype(np.int32) - ex.astype(np.int32))
    frac_ge2 = (diff >= 2).mean()
    print(f'max diff {diff.max()}  mean {diff.mean():.4f}  '
          f'frac>=2 {frac_ge2:.6f}', flush=True)

    for name, fn in (('pallas', pallas_path), ('xla', xla_path)):
        out = fn(states)['ego']
        float(jnp.sum(out))               # warm
        t0 = time.time()
        for _ in range(reps):
            out = fn(states)['ego']
        float(jnp.sum(out))               # host fetch = true barrier
        dt = (time.time() - t0) / reps
        print(f'{name}: {dt*1e3:.2f} ms/frame-batch '
              f'({batch/dt:,.0f} frames/s)', flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
