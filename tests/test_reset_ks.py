"""Distributional cross-validation of the two reset samplers (VERDICT r4
item 8).

Bit-exactness of the host MT19937 parity sampler (data/parity.py,
mirroring /root/reference/magical/geom.py:116-264 and each task's
on_reset draw order) cannot be proven in this environment — pymunk does
not install — but its *distribution* can be checked against the
independent device path (threefry, tasks/*.py): both implement the same
documented randomization, so every marginal (robot pose, block
positions, goal sizes, counts, shape/colour frequencies) must agree.  A
transcription error in either path (wrong bound, wrong draw order
consuming a different stream, a mis-scaled jitter) shifts at least one
marginal by far more than sampling noise.

Two-sample Kolmogorov-Smirnov for continuous fields (own asymptotic
p-value — no scipy dependency), pooled-proportion z-bounds for discrete
ones.  Slow tier: the host sampler's rejection loops are real numpy
work (~minutes for all 8 tasks).
"""

import os

import jax
import numpy as np
import pytest

from magical_tpu.data import parity
from magical_tpu.tasks import ALL_TASKS

pytestmark = pytest.mark.slow

N = int(os.environ.get('MAGICAL_TPU_KS_N', 1500))
VARIANT = 'TestAll'


def ks_2samp(a, b):
    """Two-sample KS statistic + asymptotic p (Numerical Recipes form)."""
    a = np.sort(np.asarray(a, np.float64))
    b = np.sort(np.asarray(b, np.float64))
    n1, n2 = len(a), len(b)
    data = np.concatenate([a, b])
    cdf1 = np.searchsorted(a, data, side='right') / n1
    cdf2 = np.searchsorted(b, data, side='right') / n2
    d = np.abs(cdf1 - cdf2).max()
    en = np.sqrt(n1 * n2 / (n1 + n2))
    lam = (en + 0.12 + 0.11 / en) * d
    k = np.arange(1, 101)
    p = 2 * np.sum((-1) ** (k - 1) * np.exp(-2 * (k * lam) ** 2))
    return float(d), float(min(max(p, 0.0), 1.0))


def prop_diff_ok(a, b, values, z=4.5):
    """Per-category proportion difference within z * pooled SE."""
    a, b = np.asarray(a), np.asarray(b)
    bad = []
    for v in values:
        p1, p2 = (a == v).mean(), (b == v).mean()
        p = (np.sum(a == v) + np.sum(b == v)) / (len(a) + len(b))
        se = np.sqrt(max(p * (1 - p), 1e-12) * (1 / len(a) + 1 / len(b)))
        if abs(p1 - p2) > z * se + 1e-9:
            bad.append((int(v), float(p1), float(p2), float(se)))
    return bad


def device_resets(task, flags, n):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    st = jax.jit(jax.vmap(lambda k: task.reset_fn(k, flags)))(keys)
    return jax.device_get(st)


def host_resets(task_name, flags, n):
    specs = [parity.sample_scene(task_name, 10_000 + i, flags)
             for i in range(n)]
    return specs


@pytest.mark.parametrize('task_name', sorted(ALL_TASKS))
def test_reset_distributions_match(task_name):
    task = ALL_TASKS[task_name]
    flags = task.flags_for(VARIANT)
    st = device_resets(task, flags, N)
    specs = host_resets(task_name, flags, N)

    failures = []

    def ks_field(name, dev_vals, host_vals, p_min=1e-4):
        dev_vals = np.asarray(dev_vals, np.float64).ravel()
        host_vals = np.asarray(host_vals, np.float64).ravel()
        if len(dev_vals) == 0 or len(host_vals) == 0:
            return
        if dev_vals.std() < 1e-9 and host_vals.std() < 1e-9:
            # deterministic field: means must simply agree
            if abs(dev_vals.mean() - host_vals.mean()) > 1e-5:
                failures.append((name, 'const-mismatch',
                                 dev_vals.mean(), host_vals.mean()))
            return
        d, p = ks_2samp(dev_vals, host_vals)
        if p < p_min:
            failures.append((name, 'ks', d, p))

    # robot pose
    rpos_d = st.pos[:, 0]
    rpos_h = np.asarray([s.robot_pose[0] for s in specs])
    rang_h = np.asarray([s.robot_pose[1] for s in specs])
    ks_field('robot_x', rpos_d[:, 0], rpos_h[:, 0])
    ks_field('robot_y', rpos_d[:, 1], rpos_h[:, 1])
    ks_field('robot_cos', np.cos(st.angle[:, 0]), np.cos(rang_h))
    ks_field('robot_sin', np.sin(st.angle[:, 0]), np.sin(rang_h))

    # blocks: pooled positions over active slots + counts + types/colours
    act = np.asarray(st.block_active, bool)
    if act.any():
        from magical_tpu.core.state import N_ROBOT_BODIES
        bpos_d = np.asarray(st.pos[:, N_ROBOT_BODIES:
                                   N_ROBOT_BODIES + act.shape[1]])
        bx_d = bpos_d[..., 0][act]
        by_d = bpos_d[..., 1][act]
        bx_h = np.asarray([p[0][0] for s in specs for p in s.block_poses])
        by_h = np.asarray([p[0][1] for s in specs for p in s.block_poses])
        ks_field('block_x', bx_d, bx_h)
        ks_field('block_y', by_d, by_h)

        cnt_d = act.sum(1)
        cnt_h = np.asarray([len(s.block_poses) for s in specs])
        bad = prop_diff_ok(cnt_d, cnt_h, np.unique(
            np.concatenate([cnt_d, cnt_h])))
        if bad:
            failures.append(('block_count', 'prop', bad))

        sh_d = np.asarray(st.block_shape)[act]
        sh_h = np.asarray([c for s in specs for c in s.block_shapes])
        bad = prop_diff_ok(sh_d, sh_h, np.unique(
            np.concatenate([sh_d, sh_h])))
        if bad:
            failures.append(('block_shape', 'prop', bad))

        co_d = np.asarray(st.block_colour)[act]
        co_h = np.asarray([c for s in specs for c in s.block_colours])
        bad = prop_diff_ok(co_d, co_h, np.unique(
            np.concatenate([co_d, co_h])))
        if bad:
            failures.append(('block_colour', 'prop', bad))

    # goals: pooled xyhw + colour over active slots
    gact = np.asarray(st.goal_active, bool)
    if gact.any():
        g_d = np.asarray(st.goal_xyhw)
        g_h = np.asarray([g for s in specs for g in s.goal_cxcyhw])
        for i, nm in enumerate(('goal_x', 'goal_y', 'goal_h', 'goal_w')):
            ks_field(nm, g_d[..., i][gact], g_h[:, i])
        gc_d = np.asarray(st.goal_colour)[gact]
        gc_h = np.asarray([c for s in specs for c in s.goal_colours])
        bad = prop_diff_ok(gc_d, gc_h, np.unique(
            np.concatenate([gc_d, gc_h])))
        if bad:
            failures.append(('goal_colour', 'prop', bad))

    # physics variables (Dynamics randomization)
    ph_d = np.asarray(st.phys)
    ph_h = np.asarray([s.phys for s in specs])
    for i in range(ph_d.shape[1]):
        ks_field(f'phys_{i}', ph_d[:, i], ph_h[:, i])

    assert not failures, failures
