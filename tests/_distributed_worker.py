"""Worker program for tests/test_multiprocess.py.

Launched as one of N `jax.distributed` processes on the CPU backend
(each with 4 virtual host devices -> a 2x4=8-device global mesh).
Exercises the real multi-host path the reference never had
(SURVEY.md §2.5): global key assignment via
parallel/multihost.py, a data-sharded env rollout, and a sharded BC
train step whose gradient psum crosses processes.

Writes a JSON result file the parent test compares across processes.

Usage: _distributed_worker.py <coord_addr> <nproc> <pid> <outfile>
"""
import json
import sys


def main():
    coord, nproc, pid, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from magical_tpu.parallel import mesh as M
    from magical_tpu.parallel import multihost

    ok = multihost.initialize(coordinator_address=coord,
                              num_processes=nproc, process_id=pid)
    assert ok, 'jax.distributed.initialize failed'
    assert jax.process_count() == nproc, jax.process_count()

    n_global = len(jax.devices())
    mesh = M.make_mesh()

    # --- global key assignment: every process must agree ------------------
    GLOBAL_B = 16
    root = jax.random.PRNGKey(0)
    local_keys = np.asarray(multihost.host_local_keys(root, GLOBAL_B))
    expect_full = np.asarray(
        jax.vmap(lambda i: jax.random.fold_in(root, i))(
            jnp.arange(GLOBAL_B)))
    lo, start = multihost.global_batch_spec(GLOBAL_B)
    keys_ok = bool((local_keys == expect_full[start:start + lo]).all())

    # gathered local slices must tile the global assignment exactly
    gathered = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(local_keys))).reshape(GLOBAL_B, -1)
    keys_ok = keys_ok and bool((gathered == expect_full).all())

    # --- data-sharded env rollout (state-only MoveToRegion slice) ---------
    from magical_tpu.api.batched_env import BatchedEnv
    env = BatchedEnv('MoveToRegion-Demo-v0', render_enabled=False,
                     physics='xla')
    sh_keys = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('data', None)), local_keys)
    carry, _ = env.reset(sh_keys)
    acts = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('data')),
        np.full((lo,), 3, np.int32))          # UP: drive forward
    for _ in range(2):
        carry, obs, rew, done, info = env.step(carry, acts)
    pos_sum = float(jnp.sum(carry.state.pos))     # replicated scalar

    # --- sharded BC step: grads psum across processes ----------------------
    from magical_tpu.train.bc import BCTrainer
    obs_shape = (48, 48, 6)
    tr = BCTrainer(obs_shape, mesh=mesh)
    state = tr.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(123 + pid)        # DIFFERENT data per host
    obs_loc = rng.randint(0, 255, (lo,) + obs_shape).astype(np.uint8)
    act_loc = rng.randint(0, 18, (lo,)).astype(np.int32)
    obs_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('data', None, None, None)), obs_loc)
    act_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('data')), act_loc)
    state, metrics = tr.train_step(state, obs_g, act_g)
    loss = float(metrics['loss'])

    # updated params must be identical on every process (grad psum)
    flat, _ = jax.tree_util.tree_flatten(state.params)
    param_sum = float(sum(jnp.sum(jnp.abs(x)).item() for x in flat))

    with open(outfile, 'w') as f:
        json.dump({'process_count': jax.process_count(),
                   'n_global_devices': n_global,
                   'keys_ok': keys_ok,
                   'pos_sum': pos_sum,
                   'loss': loss,
                   'param_sum': param_sum}, f)


if __name__ == '__main__':
    main()
