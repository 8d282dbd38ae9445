"""Developer batch check: exercises the full stack in ONE process.

Run: python scripts/dev_check.py [sections...]   (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jaxcc')

sections = sys.argv[1:] or ['registry', 'tasks', 'render', 'episode',
                            'bench']


def log(*a):
    print(*a, flush=True)


if 'registry' in sections:
    import magical_tpu
    magical_tpu.register_envs()
    log('registered envs:', len(magical_tpu.ALL_REGISTERED_ENVS))
    log('demo->test keys:', len(magical_tpu.DEMO_ENVS_TO_TEST_ENVS_MAP))
    from magical_tpu.api.names import EnvName
    n = EnvName('MoveToCorner-TestShape-LoRes4A-v0')
    assert n.demo_env_name == 'MoveToCorner-Demo-LoRes4A-v0'
    log('name grammar ok')

if 'tasks' in sections:
    from magical_tpu.tasks import ALL_TASKS
    key = jax.random.PRNGKey(0)
    for name, task in ALL_TASKS.items():
        for variant in ['Demo', task.variants[-1]]:
            fl = task.flags_for(variant)
            rst = jax.jit(task.reset_fn, static_argnums=(1,))
            t0 = time.time()
            s = rst(key, fl)
            jax.block_until_ready(s.pos)
            sc = float(jax.jit(task.score_fn)(s))
            assert 0.0 <= sc <= 1.0, (name, variant, sc)
            log(f'{name:14s} {variant:14s} compile {time.time()-t0:5.1f}s '
                f'score {sc:.3f} active '
                f'{int(np.sum(np.asarray(s.block_active)))}')

if 'render' in sections:
    from magical_tpu.tasks import ALL_TASKS
    from magical_tpu.core import render as R
    task = ALL_TASKS['MatchRegions']
    s = jax.jit(task.reset_fn, static_argnums=(1,))(
        jax.random.PRNGKey(3), task.flags_for('Demo'))

    def rend(s, fidelity, res):
        return R.render_views(s, task.max_blocks, task.max_goals, False,
                              res=res, views=('allo', 'ego'),
                              fidelity=fidelity)
    t0 = time.time()
    views = jax.jit(rend, static_argnums=(1, 2))(s, 'lo', 96)
    jax.block_until_ready(views['allo'])
    log('render lo 96 compile', f'{time.time()-t0:.1f}s')
    t0 = time.time()
    views_hi = jax.jit(rend, static_argnums=(1, 2))(s, 'hi', 96)
    jax.block_until_ready(views_hi['allo'])
    log('render hi 384->96 compile', f'{time.time()-t0:.1f}s')
    os.makedirs('/tmp/frames', exist_ok=True)
    for k in ('allo', 'ego'):
        for tag, v in (('lo', views), ('hi', views_hi)):
            arr = np.asarray(v[k])
            with open(f'/tmp/frames/{k}_{tag}.ppm', 'wb') as f:
                f.write(b'P6\n%d %d\n255\n' % (arr.shape[1], arr.shape[0]))
                f.write(arr.tobytes())
            log(k, tag, 'mean rgb', arr.reshape(-1, 3).mean(0).round(1))

if 'episode' in sections:
    from magical_tpu.api.batched_env import BatchedEnv
    env = BatchedEnv('MoveToCorner-Demo-LoRes4E-v0')
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    t0 = time.time()
    carry, obs = env.reset(keys)
    jax.block_until_ready(obs)
    log('batched reset compile', f'{time.time()-t0:.1f}s', 'obs',
        obs.shape, obs.dtype)
    t0 = time.time()
    acts = jnp.zeros((B,), jnp.int32)
    carry, obs, rew, done, info = env.step(carry, acts)
    jax.block_until_ready(obs)
    log('batched step compile', f'{time.time()-t0:.1f}s')
    for t in range(2, 81):
        a = jax.random.randint(jax.random.PRNGKey(t), (B,), 0, 18)
        carry, obs, rew, done, info = env.step(carry, a)
    assert bool(np.all(np.asarray(done))), 'episode must end at step 80'
    log('episode done at t=80, scores', np.asarray(info['eval_score']))

if 'bench' in sections:
    from magical_tpu.api.batched_env import BatchedEnv
    for nenv in (1024,):
        env = BatchedEnv('MoveToCorner-Demo-LoRes4E-v0')
        keys = jax.random.split(jax.random.PRNGKey(0), nenv)
        carry, obs = env.reset(keys)
        acts = jnp.zeros((nenv,), jnp.int32)
        carry, obs, *_ = env.step(carry, acts)   # compile
        jax.block_until_ready(obs)
        t0 = time.time()
        N = 20
        for _ in range(N):
            carry, obs, *_ = env.step(carry, acts)
        jax.block_until_ready(obs)
        dt = time.time() - t0
        log(f'step+render {nenv} envs: {nenv*N/dt:,.0f} env-steps/s')
        # physics only
        env2 = BatchedEnv('MoveToCorner-Demo-v0', render_enabled=False)
        carry, obs = env2.reset(keys)
        carry, *_ = env2.step(carry, acts)
        jax.block_until_ready(carry.state.pos)
        t0 = time.time()
        for _ in range(N):
            carry, obs, rew, done, info = env2.step(carry, acts)
        jax.block_until_ready(carry.state.pos)
        dt = time.time() - t0
        log(f'physics-only {nenv} envs: {nenv*N/dt:,.0f} env-steps/s')

log('ALL CHECKS DONE')
