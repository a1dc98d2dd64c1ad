"""Device mesh and sharding helpers.

The reference's only distributed strategy is DDP over NCCL
(``my_affectgpt/common/dist_utils.py:54-80``, ``runner_base.py:100``). The
TPU-native equivalent is a named :class:`jax.sharding.Mesh` with shardings
expressed via :class:`~jax.sharding.NamedSharding`; gradient reduction becomes
an XLA ``psum`` over ICI inserted by the compiler, DistributedSampler becomes
host-side batch sharding, and barriers disappear (SPMD).

Mesh axes:
  - ``data``  : data parallelism (always present).
  - ``model`` : tensor parallelism for large LLM/encoder stages (size 1 for
    the discriminative stack).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        assert n_total % n_model == 0, (n_total, n_model)
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` axis."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) with batch-axis sharding."""
    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to_multiple(batch_size: int, multiple: int) -> int:
    """Round batch size up so it divides evenly over the data axis."""
    return int(math.ceil(batch_size / multiple) * multiple)
