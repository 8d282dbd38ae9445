"""Performance benchmark CLI.

TPU-native replacement for the reference's cProfile harness
(/root/reference/magical/misc/benchmark_env_perf.py): measures batched
env-steps/s (step + render) and physics-only throughput, optionally with
a jax profiler trace.

    python -m magical_tpu.tools.benchmark --env MoveToCorner-Demo-LoRes4E-v0 \
        --batch 4096 --steps 30
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--env', default='MoveToCorner-Demo-LoRes4E-v0')
    p.add_argument('--batch', type=int, default=4096)
    p.add_argument('--steps', type=int, default=30)
    p.add_argument('--fidelity', default='lo', choices=['lo', 'hi'])
    p.add_argument('--no-render', action='store_true')
    p.add_argument('--trace-dir', default=None,
                   help='write a jax.profiler trace here')
    p.add_argument('--json', action='store_true')
    args = p.parse_args()

    from magical_tpu.api.batched_env import BatchedEnv
    env = BatchedEnv(args.env, fidelity=args.fidelity,
                     render_enabled=not args.no_render)
    keys = jax.random.split(jax.random.PRNGKey(0), args.batch)
    t0 = time.time()
    carry, obs = env.reset(keys)
    acts = jnp.zeros((args.batch,), jnp.int32)
    carry, obs, *_ = env.step(carry, acts)
    jax.block_until_ready(carry.state.pos)
    compile_s = time.time() - t0

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    t0 = time.time()
    for _ in range(args.steps):
        carry, obs, *_ = env.step(carry, acts)
    jax.block_until_ready(carry.state.pos)
    dt = time.time() - t0
    if args.trace_dir:
        jax.profiler.stop_trace()

    sps = args.batch * args.steps / dt
    result = dict(env=args.env, batch=args.batch, steps=args.steps,
                  fidelity=args.fidelity, render=not args.no_render,
                  compile_s=round(compile_s, 2),
                  env_steps_per_s=round(sps, 1),
                  ms_per_batched_step=round(1e3 * dt / args.steps, 3))
    if args.json:
        print(json.dumps(result))
    else:
        for k, v in result.items():
            print(f'{k:20s} {v}')


if __name__ == '__main__':
    main()
