"""Cross-validate the Pallas production kernels against the XLA
reference paths through the Pallas *interpreter* — runs on any backend
(CPU CI included), so the kernel the TPU fast path uses is exercised by
the default suite, not just slow-marked TPU runs.

The XLA paths are the reference semantics (CLAUDE.md repo conventions);
these tests bound the kernel-path deviation documented in
docs/DESIGN.md "Kernel-path fidelity deviations".
"""

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magical_tpu import constants as C
from magical_tpu.core import physics as P
from magical_tpu.core import state as S

A = {n: i for i, n in enumerate(C.ACTION_NAMES)}


@contextlib.contextmanager
def _interpret(mod):
    """Force a Pallas module into interpreter mode (and clear any
    kernel built with the previous flag)."""
    old = mod.INTERPRET
    mod.INTERPRET = True
    if hasattr(mod, '_build'):
        mod._build.cache_clear()
    try:
        yield
    finally:
        mod.INTERPRET = old
        if hasattr(mod, '_build'):
            mod._build.cache_clear()


def test_physics_kernel_interpret_one_block():
    from magical_tpu.core import physics_pallas as PP
    B = 8
    st = S.place_robot(S.make_initial_state(1, 1), (0.0, 0.0), 0.0)
    st = S.place_block(st, 0, (0.0, 0.5), 0.0, int(C.ShapeType.SQUARE), 0)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
    with _interpret(PP):
        step_p = jax.jit(
            lambda s, a: PP.control_step_pallas(s, a, env_tile=B))
        step_x = jax.jit(jax.vmap(P.control_step, in_axes=(0, None)))
        sp = sx = batch
        acts = jnp.full((B,), A['UpOpen'], jnp.int32)
        for _ in range(3):          # contact-rich: robot drives into block
            sp = step_p(sp, acts)
            sx = step_x(sx, A['UpOpen'])
        np.testing.assert_allclose(np.asarray(sp.pos), np.asarray(sx.pos),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(sp.angle),
                                   np.asarray(sx.angle), atol=1e-3)


@pytest.mark.slow
def test_physics_kernel_interpret_cluster_ten_blocks():
    # The big contact table (10 block slots -> ~710 pair candidates):
    # the configuration that was gated off the kernel path in round 1.
    from magical_tpu.core import physics_pallas as PP
    from magical_tpu.tasks import ALL_TASKS
    task = ALL_TASKS['ClusterColour']
    assert task.max_blocks == 10
    B = 8
    states = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(
            jax.random.split(jax.random.PRNGKey(0), B))
    with _interpret(PP):
        step_p = jax.jit(
            lambda s, a: PP.control_step_pallas(s, a, env_tile=B))
        step_x = jax.jit(jax.vmap(P.control_step))
        sp = sx = states
        acts = jnp.full((B,), A['UpOpen'], jnp.int32)
        for _ in range(3):
            sp = step_p(sp, acts)
            sx = step_x(sx, acts)
        np.testing.assert_allclose(np.asarray(sp.pos), np.asarray(sx.pos),
                                   atol=1e-2)
        # block spin is the loosest agreement (two-point manifolds in the
        # kernel vs full clipping in XLA) — bound it, don't hide it
        np.testing.assert_allclose(np.asarray(sp.angle),
                                   np.asarray(sx.angle), atol=0.1)


def test_render_kernel_interpret_both_views():
    from magical_tpu.core import render as R
    from magical_tpu.core import render_pallas as RP
    from magical_tpu.tasks import ALL_TASKS
    task = ALL_TASKS['MoveToRegion']
    B = 8
    states = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(
            jax.random.split(jax.random.PRNGKey(0), B))
    with _interpret(RP):
        pal = jax.jit(functools.partial(
            RP.render_batch_pallas, max_blocks=task.max_blocks,
            max_goals=task.max_goals, robot_first=False, res=96,
            views=('allo', 'ego'), aa=True, env_tile=B,
            pix_tile=1152))(states)
        ref = jax.jit(jax.vmap(lambda s: R.render_views(
            s, task.max_blocks, task.max_goals, False, res=96,
            views=('allo', 'ego'), fidelity='lo')))(states)
        for view in ('allo', 'ego'):
            d = np.abs(np.asarray(pal[view]).astype(int)
                       - np.asarray(ref[view]).astype(int))
            assert d.mean() < 0.1, (view, d.mean())
            # disagreement is confined to AA edge pixels
            assert (d >= 8).mean() < 1e-3, (view, (d >= 8).mean())


def test_render_kernel_hi_interpret_matches_xla_hi():
    """Hi-fidelity kernel (hard 4x supersample + exact box mean) vs the
    XLA hi path.  Both quantise subpixels to uint8 then box-mean, so
    they agree except where a hard edge passes within float epsilon of
    a subpixel centre (screen-space vs world-space evaluation order)."""
    from magical_tpu.core import render as R
    from magical_tpu.core import render_pallas as RP
    from magical_tpu.tasks import ALL_TASKS
    task = ALL_TASKS['MoveToRegion']
    B = 2
    states = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(
            jax.random.split(jax.random.PRNGKey(1), B))
    with _interpret(RP):
        pal = jax.jit(functools.partial(
            RP.render_batch_pallas, max_blocks=task.max_blocks,
            max_goals=task.max_goals, robot_first=False, res=96,
            views=('allo', 'ego'), fidelity='hi', env_tile=B))(states)
    ref = jax.jit(jax.vmap(lambda s: R.render_views(
        s, task.max_blocks, task.max_goals, False, res=96,
        views=('allo', 'ego'), fidelity='hi')))(states)
    for view in ('allo', 'ego'):
        a = np.asarray(pal[view]).astype(int)
        b = np.asarray(ref[view]).astype(int)
        frac_diff = (a != b).mean()
        assert frac_diff < 1e-3, (view, frac_diff)
        assert np.abs(a - b).max() <= 16, (view, np.abs(a - b).max())


def test_batched_env_cf_obs_path_interpret():
    """End-to-end: BatchedEnv with the Pallas renderer (interpreter) and
    the round-4 channel-major circular frame buffers produces the same
    observations as the XLA path, within renderer agreement."""
    from magical_tpu.api.batched_env import BatchedEnv
    from magical_tpu.core import render_pallas as RP

    B = 8
    with _interpret(RP):
        env_p = BatchedEnv('MoveToRegion-Demo-LoRes3EA-v0',
                           physics='xla', renderer='pallas')
        assert env_p._cf
        env_x = BatchedEnv('MoveToRegion-Demo-LoRes3EA-v0',
                           physics='xla', renderer='xla')
        keys = jax.random.split(jax.random.PRNGKey(3), B)
        cp, op = env_p.reset(keys)
        cx, ox = env_x.reset(keys)
        assert op.shape == ox.shape == (B, 96, 96, 12)
        for t in range(5):
            acts = jnp.full((B,), A['UpOpen'], jnp.int32)
            cp, op, *_ = env_p.step(cp, acts)
            cx, ox, *_ = env_x.step(cx, acts)
        d = np.abs(np.asarray(op).astype(int) - np.asarray(ox).astype(int))
        assert d.mean() < 0.5, d.mean()          # AA-edge disagreement only
        assert (d >= 16).mean() < 2e-3, (d >= 16).mean()


def test_render_into_slots_matches_render_plus_push():
    """The fused slot-write kernel (render_into_slots_pallas: aliased
    circular buffer + scalar-prefetch output index map) must produce
    byte-identical buffers to render(raw) -> push_frames_cf for every
    phase of the circular buffer."""
    from magical_tpu.core import preproc
    from magical_tpu.core import render_pallas as RP
    from magical_tpu.tasks import ALL_TASKS

    task = ALL_TASKS['MoveToRegion']
    B = 8
    spec = preproc.PREPROCESSORS['LoRes3EA']
    states = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(
            jax.random.split(jax.random.PRNGKey(2), B))
    with _interpret(RP):
        raw0 = RP.render_batch_pallas(
            states, task.max_blocks, task.max_goals, False, res=96,
            views=spec.views, aa=True, env_tile=B, pix_tile=1152,
            raw_output=True)
        bufs_a = preproc.init_frames_cf(spec, raw0)
        bufs_b = jax.tree_util.tree_map(lambda x: x, bufs_a)
        for t in range(1, 6):
            # vary the state so each frame differs
            states = states.replace(
                pos=states.pos.at[:, 0, 0].add(0.02 * t))
            raw = RP.render_batch_pallas(
                states, task.max_blocks, task.max_goals, False, res=96,
                views=spec.views, aa=True, env_tile=B, pix_tile=1152,
                raw_output=True)
            bufs_a = preproc.push_frames_cf(spec, bufs_a, raw,
                                            jnp.int32(t))
            bufs_b = RP.render_into_slots_pallas(
                states, bufs_b, jnp.int32(t), task.max_blocks,
                task.max_goals, False, spec, res=96, env_tile=B,
                pix_tile=1152)
            for v in spec.views:
                np.testing.assert_array_equal(
                    np.asarray(bufs_a[v]), np.asarray(bufs_b[v]),
                    err_msg=f'view {v} step {t}')
