#!/usr/bin/env python
"""Headline benchmark: batched env throughput (step + render, LoRes4E).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N}

Baseline is the driver-set north star from BASELINE.md: 1e6 env-steps/s
per host (step + render at 96x96 LoRes4E, 4096 envs).  The reference
itself publishes no throughput numbers (it is a serial Python/GL loop,
typically ~10^2 env-steps/s per core).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

BASELINE = 1e6  # env-steps/s per host (driver target; BASELINE.md)


def measure(batch, scan_len=20, reps=4):
    """Steady-state throughput of the production rollout loop: `scan_len`
    env steps fused in one jitted scan (how actor loops actually run),
    timed across a host fetch so async dispatch can't flatter the number.
    """
    import jax
    import jax.numpy as jnp
    from magical_tpu.api.batched_env import BatchedEnv

    env = BatchedEnv('MoveToCorner-Demo-LoRes4E-v0', fidelity='lo')
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    carry, obs = env.reset(keys)
    acts = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def multi(carry):
        def body(c, _):
            c2, obs, rew, done, info = env._step_batched(c, acts)
            return c2, obs[0, 0, 0, 0]
        return jax.lax.scan(body, carry, None, length=scan_len)

    carry, _ = multi(carry)
    float(jnp.sum(carry.state.pos))          # force completion
    t0 = time.time()
    for _ in range(reps):
        carry, probe = multi(carry)
    float(jnp.sum(carry.state.pos))          # true barrier
    return batch * scan_len * reps / (time.time() - t0)


def main():
    batch = int(os.environ.get('BENCH_BATCH', 4096))
    err = None
    for b in (batch, batch // 2, batch // 4):
        try:
            sps = measure(b)
            break
        except Exception as ex:      # noqa: BLE001 - fall back on OOM etc.
            err = ex
            sps = None
    if sps is None:
        raise err
    print(json.dumps({
        'metric': 'env-steps/s per chip (step+render, 96x96 LoRes4E) '
                  f'at {b} envs',
        'value': round(sps, 1),
        'unit': 'env-steps/s',
        'vs_baseline': round(sps / BASELINE, 4),
    }))


if __name__ == '__main__':
    main()
