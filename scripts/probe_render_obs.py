#!/usr/bin/env python
"""Render/obs-pipeline probes for the headline config
(MoveToCorner-Demo-LoRes4E, B=4096):
  1. render-kernel tile sweep (env_tile x pix_tile)
  2. obs-assembly split: (3,pix,B)->NHWC transpose alone, NHWC
     shift-concat alone, fused transpose+shift (the production form)
Usage: python scripts/probe_render_obs.py [batch]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from magical_tpu.api.batched_env import BatchedEnv            # noqa: E402
from magical_tpu.core import render_pallas as RP              # noqa: E402


def stage(msg):
    print(f'[{time.strftime("%H:%M:%S")}] {msg}', flush=True)


def timed(fn, arg, scan_len, reps=4):
    out = fn(arg)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        out = fn(out * 0 + arg if out.shape == arg.shape else arg)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.time() - t0) / (reps * scan_len)


def main(batch=4096, scan_len=20):
    env = BatchedEnv('MoveToCorner-Demo-LoRes4E-v0')
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    carry, obs = env.reset(keys)
    st = carry.state
    mb, mg, rf = env.task.max_blocks, env.task.max_goals, env.robot_first

    for et in (128, 256):
        for pt in (256, 512, 1152):
            @jax.jit
            def rk(c, et=et, pt=pt):
                def body(c, _):
                    out = RP.render_batch_pallas(
                        st, mb, mg, rf, res=96, views=('ego',), aa=True,
                        env_tile=et, pix_tile=pt,
                        static_shapes=env.static_shapes, raw_output=True)
                    return c + out['ego'][0, 0, 0].astype(jnp.int32), ()
                return jax.lax.scan(body, c, None, length=scan_len)[0]

            try:
                dt = timed(rk, jnp.int32(0), scan_len)
                stage(f'render kernel et={et} pt={pt}: {dt*1e3:.3f} ms '
                      f'({batch/dt:,.0f} env-steps/s)')
            except Exception as ex:                    # noqa: BLE001
                stage(f'render kernel et={et} pt={pt}: FAILED '
                      f'{type(ex).__name__}: {str(ex)[:200]}')

    # ---- obs assembly splits --------------------------------------------
    img = RP.render_batch_pallas(
        st, mb, mg, rf, res=96, views=('ego',), aa=True,
        static_shapes=env.static_shapes, raw_output=True)['ego']
    img = jax.block_until_ready(img)              # (3, 9216, B)
    bufs = jax.block_until_ready(carry.frames['ego'])  # (B,96,96,12)

    @jax.jit
    def t_only(c):
        def body(c, _):
            nhwc = jnp.transpose(img, (2, 1, 0)).reshape(batch, 96, 96, 3)
            return c + nhwc[0, 0, 0, 0].astype(jnp.int32) \
                + nhwc[-1, -1, -1, -1].astype(jnp.int32), ()
        return jax.lax.scan(body, c, None, length=scan_len)[0]

    @jax.jit
    def shift_only(b):
        def body(b, _):
            nf = b[..., :3]           # stand-in new frame, same layout
            return jnp.concatenate([b[..., 3:], nf], axis=-1), ()
        return jax.lax.scan(body, b, None, length=scan_len)[0]

    @jax.jit
    def fused(b):
        def body(b, _):
            nhwc = jnp.transpose(img, (2, 1, 0)).reshape(batch, 96, 96, 3)
            return jnp.concatenate([b[..., 3:], nhwc], axis=-1), ()
        return jax.lax.scan(body, b, None, length=scan_len)[0]

    dt = timed(t_only, jnp.int32(0), scan_len)
    stage(f'transpose only : {dt*1e3:.3f} ms')
    dt = timed(shift_only, bufs, scan_len)
    stage(f'shift-concat   : {dt*1e3:.3f} ms')
    dt = timed(fused, bufs, scan_len)
    stage(f'fused t+shift  : {dt*1e3:.3f} ms')
    stage('DONE')


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:2]))
