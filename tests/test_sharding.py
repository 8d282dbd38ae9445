"""Mesh/sharding plumbing: runs on whatever devices are available (a
single TPU chip here; the driver separately dry-runs an 8-device CPU
mesh via __graft_entry__.dryrun_multichip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magical_tpu.parallel import mesh as M


def test_make_mesh():
    mesh = M.make_mesh()
    assert mesh.axis_names == ('data', 'model')
    assert mesh.devices.size == len(jax.devices())


def test_shard_batch_roundtrip():
    mesh = M.make_mesh()
    x = {'a': jnp.arange(8.0), 'b': jnp.ones((8, 3))}
    sx = M.shard_batch(x, mesh)
    np.testing.assert_allclose(np.asarray(sx['a']), np.arange(8.0))
    assert sx['b'].sharding.is_fully_addressable


@pytest.mark.parametrize('batch', [4, 8])
def test_sharded_rollout_scores(batch):
    # batch=8 tiles an 8-device CPU mesh (sharded path); batch=4 does
    # not and must fall back to the unsharded path instead of raising.
    from magical_tpu.api.batched_env import BatchedEnv
    from magical_tpu.parallel.rollout import rollout_episodes
    env = BatchedEnv('MoveToRegion-Demo-v0', render_enabled=False)

    def random_policy(obs, k):
        return jax.random.randint(k, (batch,), 0, 18)

    scores = rollout_episodes(env, random_policy, jax.random.PRNGKey(0),
                              batch_size=batch)
    scores = np.asarray(scores)
    assert scores.shape == (batch,)
    assert np.all((scores >= 0) & (scores <= 1))


def test_graft_entry_importable():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        'graft_entry', os.path.join(os.path.dirname(__file__), '..',
                                    '__graft_entry__.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)


@pytest.mark.slow
def test_scaling_smoke_fixed_batch_linearity():
    """Fixed-total-batch throughput must hold up as the mesh grows
    (sharded env state, no per-step collectives) - the measured side of
    the BASELINE.md "linear scaling" row that an N-virtual-device CPU
    host can actually support.  Run under MAGICAL_TPU_TEST_CPU=1."""
    if len(jax.devices()) < 8:
        pytest.skip('needs an 8-device mesh (MAGICAL_TPU_TEST_CPU=1)')
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        'graft_entry', os.path.join(os.path.dirname(__file__), '..',
                                    '__graft_entry__.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    results = mod.scaling_smoke(8)   # asserts internally
    assert set(results) == {1, 2, 4, 8}


@pytest.mark.slow
def test_gail_iteration_over_mesh():
    """One full GAIL iteration (collect + PPO + disc) with dp-sharded
    envs at the real 96x96x12 obs shape, replicated params bitwise-
    identical across devices afterwards (VERDICT r4 item 9).  Shares the
    implementation with the driver dryrun.  Run under
    MAGICAL_TPU_TEST_CPU=1 (8 virtual devices)."""
    if len(jax.devices()) < 8:
        pytest.skip('needs an 8-device mesh (MAGICAL_TPU_TEST_CPU=1)')
    import importlib.util
    import os
    from jax.sharding import Mesh
    spec = importlib.util.spec_from_file_location(
        'graft_entry', os.path.join(os.path.dirname(__file__), '..',
                                    '__graft_entry__.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ('data', 'model'))
    mod.gail_iteration_over_mesh(mesh, 8)   # asserts internally
