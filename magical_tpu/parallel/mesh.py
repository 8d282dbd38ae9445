"""Device-mesh and sharding helpers.

The reference is strictly single-process (SURVEY.md §2.5); scaling here
is first-class: envs shard along a ``data`` mesh axis (they are
embarrassingly parallel — no cross-env communication), the learner is
data-parallel with psum gradient reduction over ICI, and the policy's
dense layers may shard over a ``model`` axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ('data', 'model'))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for env states / observations / actions."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree with its leading axis sharded over 'data'."""
    sh = data_sharding(mesh)

    def put(x):
        return jax.device_put(x, NamedSharding(
            mesh, P(*(('data',) + (None,) * (x.ndim - 1)))))
    return jax.tree_util.tree_map(put, tree)


def param_sharding(mesh: Mesh, params):
    """NamedShardings for a flax param tree: partitioned leaves (from
    nn.with_partitioning) follow their annotations; everything else is
    replicated."""
    def leaf(p):
        if hasattr(p, 'names'):       # flax Partitioned
            return NamedSharding(mesh, P(*p.names))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        leaf, params,
        is_leaf=lambda x: hasattr(x, 'names') or not isinstance(x, dict))
