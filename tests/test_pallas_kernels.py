"""Cross-validation of the Pallas kernels against the XLA reference
paths.  Slow (first Mosaic compile on the tunnel runtime is minutes);
run with MAGICAL_TPU_FULL_TESTS=1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magical_tpu import constants as C
from magical_tpu.core import physics as P
from magical_tpu.core import state as S

pytestmark = pytest.mark.slow

A = {n: i for i, n in enumerate(C.ACTION_NAMES)}


@pytest.mark.skipif(jax.default_backend() == 'cpu',
                    reason='Pallas TPU kernels need a TPU backend')
def test_pallas_physics_matches_xla():
    from magical_tpu.core import physics_pallas as PP
    B = PP.ENV_TILE
    st = S.place_robot(S.make_initial_state(1, 1), (0.0, 0.0), 0.0)
    st = S.place_block(st, 0, (0.0, 0.5), 0.0, int(C.ShapeType.SQUARE), 0)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
    step_p = jax.jit(PP.control_step_pallas)
    step_x = jax.jit(jax.vmap(P.control_step, in_axes=(0, None)))
    sp = batch
    sx = batch
    for _ in range(8):
        sp = step_p(sp, jnp.full((B,), A['UpOpen'], jnp.int32))
        sx = step_x(sx, A['UpOpen'])
    np.testing.assert_allclose(np.asarray(sp.pos[0, 0]),
                               np.asarray(sx.pos[0, 0]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sp.pos[0, 5]),
                               np.asarray(sx.pos[0, 5]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sp.angle[0, 1:3]),
                               np.asarray(sx.angle[0, 1:3]), atol=5e-3)


@pytest.mark.skipif(jax.default_backend() == 'cpu',
                    reason='Pallas TPU kernels need a TPU backend')
def test_pallas_render_matches_xla():
    import functools
    from magical_tpu.core import render as R
    from magical_tpu.core import render_pallas as RP
    from magical_tpu.tasks import ALL_TASKS
    task = ALL_TASKS['MoveToRegion']
    B = RP.ENV_TILE
    states = jax.jit(jax.vmap(functools.partial(
        task.reset_fn, flags=task.flags_for('Demo'))))(
            jax.random.split(jax.random.PRNGKey(0), B))
    pal = jax.jit(functools.partial(
        RP.render_batch_pallas, max_blocks=task.max_blocks,
        max_goals=task.max_goals, robot_first=False, res=96,
        views=('allo',), aa=True))(states)
    ref = jax.jit(jax.vmap(lambda s: R.render_views(
        s, task.max_blocks, task.max_goals, False, res=96,
        views=('allo',), fidelity='lo')))(states)
    diff = np.abs(np.asarray(pal['allo']).astype(int)
                  - np.asarray(ref['allo']).astype(int))
    assert diff.mean() < 3.0
