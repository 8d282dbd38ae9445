#!/usr/bin/env python
"""Generate golden trajectory fixtures for the PRODUCTION configuration:
the Pallas physics kernel on the TPU backend
(tests/fixtures/golden_pallas_tpu.npz).

tests/test_golden_trajectories.py guards only the CPU-XLA path; this
fixture is its analogue for the exact path users run on TPU
(physics='auto' -> Pallas for every task, api/batched_env.py).  Replayed
by tests/test_pallas_episode_tpu.py.  Any intentional kernel change must
consciously regenerate this file on the TPU:

  python scripts/gen_golden_pallas_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

from magical_tpu import constants as C                        # noqa: E402
from magical_tpu.core import physics_pallas as PP             # noqa: E402
from magical_tpu.tasks import ALL_TASKS                       # noqa: E402

A = {n: i for i, n in enumerate(C.ACTION_NAMES)}
# same plough script as scripts/gen_golden_fixtures.py
SCRIPT = [A['UpOpen']] * 10 + [A['UpLeftOpen']] * 6 + [A['UpOpen']] * 10 \
    + [A['UpRightOpen']] * 6 + [A['UpClose']] * 8
N_STEPS = 40
SNAP_EVERY = 5
B = 128          # one env tile at the small-task lane sizes
TASKS = ('MoveToCorner', 'MoveToRegion', 'MatchRegions', 'ClusterColour')


def trajectories():
    out = {}
    for name in TASKS:
        task = ALL_TASKS[name]
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        st = jax.jit(jax.vmap(
            lambda k: task.reset_fn(k, task.flags_for('Demo'))))(keys)
        acts = jnp.asarray(
            [SCRIPT[t % len(SCRIPT)] for t in range(N_STEPS)],
            jnp.int32)

        @jax.jit
        def run(st):
            def body(s, a):
                s = PP.control_step_pallas(
                    s, jnp.full((B,), a, jnp.int32), env_tile=B)
                return s, (s.pos, s.angle)
            s, (pos, ang) = jax.lax.scan(body, st, acts)
            return s, pos[::SNAP_EVERY], ang[::SNAP_EVERY]

        s, pos, ang = run(st)
        score = jax.jit(jax.vmap(task.score_fn))(s)
        key = f'{name}-Demo'
        # store only env 0/1 snapshots (fixture size) + all scores
        out[f'{key}/reset_pos'] = np.asarray(st.pos[:2])
        out[f'{key}/reset_angle'] = np.asarray(st.angle[:2])
        out[f'{key}/pos'] = np.asarray(pos[:, :2])
        out[f'{key}/angle'] = np.asarray(ang[:, :2])
        out[f'{key}/score'] = np.asarray(score[:2])
        print(f'{key}: final score {np.asarray(score[:2])}', flush=True)
    return out


def main():
    assert jax.default_backend() != 'cpu', (
        'this fixture pins the TPU Pallas path; run on the TPU')
    fix_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'fixtures')
    os.makedirs(fix_dir, exist_ok=True)
    path = os.path.join(fix_dir, 'golden_pallas_tpu.npz')
    np.savez_compressed(path, **trajectories())
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
