#!/usr/bin/env python
"""Headline benchmark: batched env throughput (step + render, LoRes4E).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N}

Baseline is the driver-set north star from BASELINE.md: 1e6 env-steps/s
per host (step + render at 96x96 LoRes4E, 4096 envs).  The reference
itself publishes no throughput numbers (it is a serial Python/GL loop,
typically ~10^2 env-steps/s per core).

Detail mode (BENCH_ALL=1, or `python bench.py --all`): additionally
measures the 8-block MatchRegions and 10-block ClusterColour families,
hi fidelity, and a 1024/4096/16384 batch-scaling curve; rows go to
stderr and BENCH_DETAIL.json (BASELINE.md scaling row evidence).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

BASELINE = 1e6  # env-steps/s per host (driver target; BASELINE.md)


def measure(env_name='MoveToCorner-Demo-LoRes4E-v0', batch=4096,
            fidelity='lo', scan_len=20, reps=4):
    """Steady-state throughput of the production rollout loop: `scan_len`
    env steps fused in one jitted scan (how actor loops actually run),
    timed across a host fetch so async dispatch can't flatter the number.
    """
    import jax
    import jax.numpy as jnp
    from magical_tpu.api.batched_env import BatchedEnv

    env = BatchedEnv(env_name, fidelity=fidelity)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    carry, obs = env.reset(keys)
    acts = jnp.zeros((batch,), jnp.int32)

    # Position-weighted probe: forces the FULL user-facing observation
    # to be produced every step (a plain slice or unweighted sum could
    # be rewritten through the round-4 lazy roll+transpose obs view,
    # letting XLA skip the NHWC materialisation the metric includes).
    if hasattr(obs, 'shape'):
        n = 1
        for d in obs.shape[1:]:
            n *= d
        w = jnp.mod(jnp.arange(n, dtype=jnp.float32), 7.0) + 1.0

        def consume(o):
            B = o.shape[0]
            return jnp.dot(o.reshape(B, -1).astype(jnp.float32), w).sum()
    else:
        # dict obs get the same position-weighted dot per leaf — an
        # unweighted sum could be computed without materialising the
        # NHWC view, overstating LoResStack throughput
        def consume(o):
            tot = 0.0
            for x in o.values():
                B = x.shape[0]
                n = 1
                for d in x.shape[1:]:
                    n *= d
                wd = jnp.mod(jnp.arange(n, dtype=jnp.float32), 7.0) + 1.0
                tot += jnp.dot(
                    x.reshape(B, -1).astype(jnp.float32), wd).sum()
            return tot

    @jax.jit
    def multi(carry):
        def body(c, _):
            c2, obs, rew, done, info = env._step_batched(c, acts)
            return c2, consume(obs)
        return jax.lax.scan(body, carry, None, length=scan_len)

    carry, _ = multi(carry)
    float(jnp.sum(carry.state.pos))          # force completion
    t0 = time.time()
    for _ in range(reps):
        carry, probe = multi(carry)
    float(jnp.sum(carry.state.pos))          # true barrier
    return batch * scan_len * reps / (time.time() - t0)


def headline():
    batch = int(os.environ.get('BENCH_BATCH', 4096))
    err = None
    for b in (batch, batch // 2, batch // 4):
        try:
            sps = measure(batch=b)
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


def detail():
    """Per-task / fidelity / batch-scaling rows -> stderr + BENCH_DETAIL.json.

    Covers the VERDICT round-1 gap: numbers for the 8-10-block tasks
    (which exercise the big contact tables), the hi-fidelity render
    path, and the BASELINE.md batch-scaling row."""
    rows = []

    def row(name, **kw):
        t0 = time.time()
        try:
            sps = measure(**kw)
            r = {'bench': name, 'env_steps_per_s': round(sps, 1),
                 'wall_s': round(time.time() - t0, 1), **kw}
        except Exception as ex:               # noqa: BLE001
            r = {'bench': name, 'error': repr(ex)[:200], **kw}
        rows.append(r)
        print(json.dumps(r), file=sys.stderr, flush=True)

    suite = {}
    for t in ('MoveToCorner', 'MoveToRegion', 'MatchRegions', 'MakeLine',
              'FindDupe', 'FixColour', 'ClusterColour', 'ClusterShape'):
        row(f'per-task {t}',
            env_name=f'{t}-Demo-LoRes4E-v0', batch=4096)
        if 'env_steps_per_s' in rows[-1]:
            suite[t] = rows[-1]['env_steps_per_s']
    # VERDICT r4 #2: a suite-weighted number the headline can't hide
    # the hard-task distribution behind (arithmetic mean over the 8
    # task families at 4096 envs each)
    if suite:
        r = {'bench': 'suite-weighted (8-task mean)',
             'env_steps_per_s': round(sum(suite.values()) / len(suite), 1),
             'n_tasks': len(suite)}
        rows.append(r)
        print(json.dumps(r), file=sys.stderr, flush=True)
    row('hi fidelity (384^2 render + box-mean)',
        env_name='MoveToCorner-Demo-LoRes4E-v0', batch=1024,
        fidelity='hi')
    for b in (1024, 4096, 16384):
        row(f'batch scaling {b}',
            env_name='MoveToCorner-Demo-LoRes4E-v0', batch=b)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'BENCH_DETAIL.json')
    with open(out, 'w') as f:
        json.dump(rows, f, indent=1)
    print(f'wrote {out}', file=sys.stderr)


def main():
    if os.environ.get('BENCH_ALL') or '--all' in sys.argv[1:]:
        detail()
    headline()


if __name__ == '__main__':
    main()
