"""Chaos-floor control for the episode divergence gates (VERDICT r4 #5).

The Pallas-vs-XLA full-episode gates (tests/test_pallas_episode_tpu.py)
tolerate end-of-episode position spread on the contact-heavy tasks and
attribute it to contact chaos.  This script supplies the missing control:
run the SAME XLA path twice, identical except for a 1-ulp perturbation of
the initial block positions, and record the self-divergence distribution
over a full episode.  If 1 ulp of initial difference produces the same
magnitude of end-state spread as the Pallas-vs-XLA comparison, the gate
bounds are explained by sensitive dependence, not kernel error.

Mirrors the scripted episode of tests/test_pallas_episode_tpu.py
(_run_episode): same action script, same B, same seed, same score fn —
matching the reference solver loop /root/reference/magical/base_env.py:236-243.

Writes tests/fixtures/chaos_floor.json, which the gate consumes so its
tolerances are justified by a committed measurement.

Run (CPU backend; the dynamics are the XLA reference semantics):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/chaos_floor.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')
os.environ.setdefault('MAGICAL_TPU_PALLAS', '0')

OUT = os.path.join(REPO, 'tests', 'fixtures', 'chaos_floor.json')


def run_leg(task, B, n_steps, perturb_ulps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from magical_tpu import constants as C
    from magical_tpu.core import physics as P

    A = {n: i for i, n in enumerate(C.ACTION_NAMES)}
    script = [A['UpOpen']] * 10 + [A['UpLeftOpen']] * 6 + [A['UpOpen']] * 10 \
        + [A['UpRightOpen']] * 6 + [A['UpClose']] * 8

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    st = jax.jit(jax.vmap(
        lambda k: task.reset_fn(k, task.flags_for('Demo'))))(keys)
    if perturb_ulps:
        # nudge every body position by exactly `perturb_ulps` ulps
        pos = np.asarray(st.pos)
        for _ in range(perturb_ulps):
            pos = np.nextafter(pos, np.float32(np.inf), dtype=np.float32)
        st = st.replace(pos=jnp.asarray(pos))
    acts = jnp.asarray([script[t % len(script)] for t in range(n_steps)],
                       jnp.int32)

    @jax.jit
    def run(st):
        def body(s, a):
            return jax.vmap(P.control_step)(
                s, jnp.full((B,), a, jnp.int32)), 0
        s, _ = jax.lax.scan(body, st, acts)
        return s, jax.vmap(task.score_fn)(s)

    s, score = run(st)
    return jax.device_get(s), np.asarray(score)


def main():
    import numpy as np

    from magical_tpu.tasks import ALL_TASKS

    B = 64
    out = {}
    for name in ('MatchRegions', 'ClusterColour'):
        task = ALL_TASKS[name]
        s0, sc0 = run_leg(task, B, task.ep_len, 0)
        s1, sc1 = run_leg(task, B, task.ep_len, 1)
        dpos = np.linalg.norm(
            np.asarray(s0.pos) - np.asarray(s1.pos), axis=-1)
        dscore = np.abs(sc0 - sc1)
        row = {
            'B': B, 'n_steps': task.ep_len, 'perturb': '1 ulp on pos',
            'dpos_mean': float(dpos.mean()),
            'dpos_median': float(np.median(dpos)),
            'dpos_p90': float(np.percentile(dpos, 90)),
            'frac_within_0p05': float((dpos < 0.05).mean()),
            'frac_within_1em3': float((dpos < 1e-3).mean()),
            'dscore_mean': float(dscore.mean()),
            'score_mean_abs_diff': float(abs(sc0.mean() - sc1.mean())),
        }
        out[name] = row
        print(name, json.dumps(row), flush=True)
        # incremental: hours of CPU compile per task — keep what we have
        if os.path.exists(OUT):
            with open(OUT) as f:
                prev = json.load(f)
            prev.update(out)
            out = dict(prev)
        with open(OUT, 'w') as f:
            json.dump(out, f, indent=1)
        print(f'wrote {OUT} ({sorted(out)})', flush=True)


if __name__ == '__main__':
    main()
