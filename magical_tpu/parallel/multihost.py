"""Multi-host orchestration.

On a TPU pod slice each host runs the same program; envs shard along the
global ``data`` axis with each host driving its local devices
(jax.distributed + jit with NamedSharding).  Envs never communicate, so
rollouts scale linearly; only learner gradient psums and eval
aggregation cross hosts (over ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """jax.distributed.initialize wrapper (no-op when single-process).

    In TPU pod environments the arguments are auto-detected from the
    metadata server; pass them explicitly elsewhere."""
    if num_processes is not None and num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True
    except (ValueError, RuntimeError):
        # already initialised, or single-process environment
        return False


def global_batch_spec(global_batch: int):
    """Split a global env batch across processes; returns
    (local_batch, local_start)."""
    nproc = jax.process_count()
    assert global_batch % nproc == 0, (global_batch, nproc)
    local = global_batch // nproc
    return local, local * jax.process_index()


def host_local_keys(key, global_batch: int):
    """Per-host slice of the global per-env PRNG keys (same fold-in on
    every host -> identical global key assignment)."""
    local, start = global_batch_spec(global_batch)
    idx = np.arange(start, start + local)
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)


def mean_across_hosts(x):
    """psum-mean a replicated metric across processes (e.g. eval scores)."""
    if jax.process_count() == 1:
        return x
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(jnp.asarray(x)).mean(0)
