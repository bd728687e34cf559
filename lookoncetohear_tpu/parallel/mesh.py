"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL
(reference src/trainer.py:54,91). TPU-native we express the same thing
— and leave room for more — as a named `jax.sharding.Mesh`:

* axis "data": batch-sharded inputs, replicated params. Gradients are
  reduced by XLA's GSPMD partitioner (all-reduce over ICI) simply
  because the loss is a mean over a data-sharded batch and params are
  replicated — no hand-written collectives.
* axis "model": reserved for tensor sharding. The separator is ~1 M
  params so it stays size 1 by default, but every entry point accepts
  a 2-D mesh so multi-slice/model sharding is a config change, not a
  rewrite (SURVEY §2.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """("data", "model") mesh; defaults to all devices on "data"."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the "data" axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array leaf of a batch pytree batch-sharded on the
    mesh (host numpy -> device). Non-arrays pass through."""
    sh = batch_sharding(mesh)

    def leaf(x):
        if isinstance(x, (np.ndarray, jax.Array)) and np.ndim(x) >= 1:
            return jax.device_put(x, sh)
        return x
    return jax.tree_util.tree_map(leaf, batch)


def pad_batch_to(batch, multiple: int):
    """Right-pad the leading axis of every array leaf to a multiple of
    `multiple` (for sharding ragged final batches); returns
    (padded_batch, real_count)."""
    leaves = jax.tree_util.tree_leaves(batch)
    b = next(int(x.shape[0]) for x in leaves if hasattr(x, "shape")
             and np.ndim(x) >= 1)
    pad = (-b) % multiple

    def leaf(x):
        if isinstance(x, (np.ndarray, jax.Array)) and np.ndim(x) >= 1 \
                and x.shape[0] == b and pad:
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(np.asarray(x), widths)
        return x
    if pad == 0:
        return batch, b
    return jax.tree_util.tree_map(leaf, batch), b
