#!/usr/bin/env python
"""Break the headline step (physics + render + preproc glue) into timed
components on the real TPU, to target round-3 throughput work.

Times, at the headline config (MoveToCorner-Demo-LoRes4E, B=4096):
  - physics kernel alone   (scan of control_step_pallas)
  - render kernel alone    (scan of render_batch_pallas on a fixed state)
  - render+preproc         (scan of render + frame push + obs assembly)
  - full step              (scan of _step_batched = headline bench body)
Each timed across a host fetch.  Optionally sweeps batch and tile sizes.

Usage: python scripts/profile_step.py [batch] [env_name]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from magical_tpu.api.batched_env import BatchedEnv            # noqa: E402
from magical_tpu.core import physics_pallas as PP             # noqa: E402
from magical_tpu.core import render_pallas as RP              # noqa: E402
from magical_tpu.core import preproc                          # noqa: E402
import functools                                              # noqa: E402


def timed(fn, arg, scan_len, reps, probe):
    out = fn(arg)
    probe(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(out)
    probe(out)
    dt = (time.time() - t0) / (reps * scan_len)
    return out, dt


def main(batch=4096, scan_len=20, reps=4,
         env_name='MoveToCorner-Demo-LoRes4E-v0'):
    env = BatchedEnv(env_name)
    print(f'physics={env.physics} renderer={env.renderer} B={batch}',
          flush=True)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    carry, obs = env.reset(keys)
    acts = jnp.zeros((batch,), jnp.int32)
    mb, mg, rf = env.task.max_blocks, env.task.max_goals, env.robot_first

    @jax.jit
    def phys_only(state):
        def body(s, _):
            return PP.control_step_pallas(s, acts), ()
        return jax.lax.scan(body, state, None, length=scan_len)[0]

    @jax.jit
    def render_only(state):
        def body(c, _):
            out = RP.render_batch_pallas(
                state, mb, mg, rf, res=96, views=('ego',), aa=True,
                static_shapes=env.static_shapes)
            return c + out['ego'][0, 0, 0, 0].astype(jnp.int32), ()
        return jax.lax.scan(body, jnp.int32(0), None, length=scan_len)[0]

    @jax.jit
    def render_kernel_only(state):
        # the Pallas call WITHOUT the (3, pix, B) -> (B, H, W, 3)
        # byte reshuffle, to separate kernel time from relayout time
        def body(c, _):
            out = RP.render_batch_pallas(
                state, mb, mg, rf, res=96, views=('ego',), aa=True,
                static_shapes=env.static_shapes, raw_output=True)
            return c + out['ego'][0, 0, 0].astype(jnp.int32), ()
        return jax.lax.scan(body, jnp.int32(0), None, length=scan_len)[0]

    @jax.jit
    def render_preproc(frames):
        def body(c, t):
            bufs = c
            if env._cf:
                raw = RP.render_batch_pallas(
                    carry.state, mb, mg, rf, res=96, views=('ego',),
                    aa=True, static_shapes=env.static_shapes,
                    raw_output=True)
                bufs = preproc.push_frames_cf(env.preproc, bufs, raw, t)
                o = preproc.observation_cf(env.preproc, bufs, t, 96)
            else:
                raw = RP.render_batch_pallas(
                    carry.state, mb, mg, rf, res=96, views=('ego',),
                    aa=True, static_shapes=env.static_shapes)
                bufs = jax.vmap(functools.partial(
                    preproc.push_frames, env.preproc))(bufs, raw)
                o = jax.vmap(functools.partial(
                    preproc.observation, env.preproc))(bufs, raw)
            return bufs, o[0, 0, 0, 0]
        return jax.lax.scan(body, frames,
                            jnp.arange(scan_len, dtype=jnp.int32))[0]

    @jax.jit
    def full(c):
        def body(c, _):
            c2, o, rew, done, info = env._step_batched(c, acts)
            return c2, o[0, 0, 0, 0]
        return jax.lax.scan(body, c, None, length=scan_len)[0]

    st = carry.state
    st, dt_p = timed(phys_only, st, scan_len, reps,
                     lambda s: float(jnp.sum(s.pos)))
    print(f'physics-only : {dt_p*1e3:8.3f} ms/step '
          f'({batch/dt_p:12,.0f} env-steps/s)', flush=True)

    _, dt_k = timed(lambda c: render_kernel_only(carry.state) * 0,
                    jnp.int32(0), scan_len, reps, lambda s: int(s))
    print(f'render-kernel: {dt_k*1e3:8.3f} ms/step '
          f'({batch/dt_k:12,.0f} env-steps/s)', flush=True)

    _, dt_r = timed(lambda c: render_only(carry.state) * 0,
                    jnp.int32(0), scan_len, reps, lambda s: int(s))
    print(f'render-only  : {dt_r*1e3:8.3f} ms/step '
          f'({batch/dt_r:12,.0f} env-steps/s)', flush=True)

    fr, dt_rp = timed(render_preproc, carry.frames, scan_len, reps,
                      lambda f: float(jnp.sum(f['ego'][0])))
    print(f'render+prep  : {dt_rp*1e3:8.3f} ms/step '
          f'({batch/dt_rp:12,.0f} env-steps/s)', flush=True)

    c2, dt_f = timed(full, carry, scan_len, reps,
                     lambda c: float(jnp.sum(c.state.pos)))
    print(f'full step    : {dt_f*1e3:8.3f} ms/step '
          f'({batch/dt_f:12,.0f} env-steps/s)', flush=True)
    print(f'glue (full - phys - rend+prep): '
          f'{(dt_f - dt_p - dt_rp)*1e3:.3f} ms/step', flush=True)


if __name__ == '__main__':
    kw = {}
    if len(sys.argv) > 1:
        kw['batch'] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw['env_name'] = sys.argv[2]
    main(**kw)
