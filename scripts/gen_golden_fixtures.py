#!/usr/bin/env python
"""Generate golden trajectory fixtures for the XLA reference-semantics
path (tests/fixtures/golden_trajectories.npz).

pymunk is not installable in this image, so true reference traces are
unavailable (STATUS.md); these fixtures instead PIN the current solver
behaviour — any future change to core/physics.py / tasks that shifts
trajectories or scores must be a conscious, reviewed regeneration of
this file (python scripts/gen_golden_fixtures.py), not an accident.

Run on the CPU backend only (fixture floats are CPU-XLA):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/gen_golden_fixtures.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

from magical_tpu import constants as C                        # noqa: E402
from magical_tpu.core import physics as P                     # noqa: E402
from magical_tpu.tasks import ALL_TASKS                       # noqa: E402

A = {n: i for i, n in enumerate(C.ACTION_NAMES)}
# same plough script as scripts/validate_pallas_physics.py
SCRIPT = [A['UpOpen']] * 10 + [A['UpLeftOpen']] * 6 + [A['UpOpen']] * 10 \
    + [A['UpRightOpen']] * 6 + [A['UpClose']] * 8
N_STEPS = 40
SNAP_EVERY = 5
B = 2


def trajectories():
    out = {}
    for name, task in sorted(ALL_TASKS.items()):
        for variant in ('Demo', 'TestAll'):
            keys = jax.random.split(jax.random.PRNGKey(0), B)
            st = jax.jit(jax.vmap(
                lambda k: task.reset_fn(k, task.flags_for(variant))))(keys)
            acts = jnp.asarray(
                [SCRIPT[t % len(SCRIPT)] for t in range(N_STEPS)],
                jnp.int32)

            @jax.jit
            def run(st):
                def body(s, a):
                    s = jax.vmap(P.control_step,
                                 in_axes=(0, None))(s, a)
                    return s, (s.pos, s.angle)
                s, (pos, ang) = jax.lax.scan(body, st, acts)
                return s, pos[::SNAP_EVERY], ang[::SNAP_EVERY]

            s, pos, ang = run(st)
            score = jax.jit(jax.vmap(task.score_fn))(s)
            key = f'{name}-{variant}'
            out[f'{key}/reset_pos'] = np.asarray(st.pos)
            out[f'{key}/reset_angle'] = np.asarray(st.angle)
            out[f'{key}/pos'] = np.asarray(pos)
            out[f'{key}/angle'] = np.asarray(ang)
            out[f'{key}/score'] = np.asarray(score)
            print(f'{key}: final score {np.asarray(score)}', flush=True)
    return out


def main():
    assert jax.default_backend() == 'cpu', (
        'fixtures are pinned to CPU-XLA floats; run with JAX_PLATFORMS=cpu')
    fix_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'fixtures')
    os.makedirs(fix_dir, exist_ok=True)
    path = os.path.join(fix_dir, 'golden_trajectories.npz')
    np.savez_compressed(path, **trajectories())
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
