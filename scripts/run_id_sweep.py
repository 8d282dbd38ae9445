"""Resumable 366-ID episode sweep with an on-disk ledger.

The reference's CI bar is "every registered env ID rolls complete
episodes of random actions" (/root/reference/tests/test_rollout_preproc.py:17-36).
On this 2-core host the full cartesian product costs hours of XLA
compile, so progress must survive interruption: each ID that passes is
appended to SWEEP.txt immediately, and already-green IDs are skipped on
restart.  tests/test_rollout_preproc.py::test_broad_episode_sweep
consults the same ledger.

Run (background, nice'd, CPU backend so the TPU stays free):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        nice -n 19 python scripts/run_id_sweep.py
"""

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')
os.environ.setdefault('MAGICAL_TPU_PALLAS', '0')

LEDGER = os.path.join(REPO, 'SWEEP.txt')


def load_ledger():
    ok = set()
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2 and parts[1] == 'ok':
                    ok.add(parts[0])
    return ok


def append(line):
    with open(LEDGER, 'a') as f:
        f.write(line + '\n')
        f.flush()
        os.fsync(f.fileno())


def run_id(env_name):
    """Same assertions as test_broad_episode_sweep."""
    import jax
    import numpy as np

    from magical_tpu.api.batched_env import BatchedEnv

    env = BatchedEnv(env_name)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    carry, obs = env.reset(keys)

    def policy(obs, k):
        return jax.random.randint(k, (2,), 0, 18)

    carry, obs, rews, dones, scores = env.rollout(
        carry, obs, policy, jax.random.PRNGKey(42))
    dones = np.asarray(dones)
    scores = np.asarray(scores)
    assert dones.shape[0] == env.max_episode_steps
    assert dones[-1].all() and not dones[:-1].any()
    assert ((scores[-1] >= 0.0) & (scores[-1] <= 1.0)).all()
    assert (scores[:-1] == 0.0).all()
    assert np.isfinite(np.asarray(carry.state.pos)).all()


def main():
    import jax  # noqa: F401  (fail early if backend broken)

    import magical_tpu
    magical_tpu.register_envs()
    all_ids = list(magical_tpu.ALL_REGISTERED_ENVS)
    if '--reverse' in sys.argv:
        # second worker walks the list from the other end; the ledger
        # dedups, so two workers only collide where they meet
        all_ids = all_ids[::-1]
    done = load_ledger()
    todo = [i for i in all_ids if i not in done]
    # in-process jit caches accumulate per ID and eventually OOM the
    # host: cap fresh IDs per process and let a shell loop restart us
    # (the on-disk compile cache keeps restarts cheap)
    max_ids = 20
    for a in sys.argv[1:]:
        if a.startswith('--max-ids='):
            max_ids = int(a.split('=')[1])
    todo = todo[:max_ids]
    print(f'{len(done)} already green, {len(todo)} this process '
          f'of {len(all_ids)} total', flush=True)
    t0 = time.time()
    for n, env_name in enumerate(todo):
        if env_name in load_ledger():
            continue                  # the other worker got there first
        t1 = time.time()
        try:
            run_id(env_name)
        except Exception as e:  # noqa: BLE001 — record and continue
            append(f'{env_name} FAIL {type(e).__name__}: '
                   + str(e).replace(chr(10), " ")[:200])
            print(f'[{n+1}/{len(todo)}] {env_name} FAIL: {e}', flush=True)
            traceback.print_exc()
            continue
        append(f'{env_name} ok')
        dt, tot = time.time() - t1, time.time() - t0
        rate = (n + 1) / tot * 3600
        print(f'[{n+1}/{len(todo)}] {env_name} ok in {dt:.1f}s '
              f'({rate:.0f} IDs/h)', flush=True)
    done = load_ledger()
    print(f'sweep complete: {len(done)}/{len(all_ids)} green', flush=True)


if __name__ == '__main__':
    main()
