"""Device mesh + shardings (L6).

TPU-native replacement for the reference's pmap data-parallelism
(``train.py:356-364``, ``training.py:502-506``): one ``jax.sharding.Mesh``
with a ``'data'`` axis spanning every chip of every host; ray batches are
sharded over ``'data'``, parameters/optimizer state are replicated, and the
gradient all-reduce is inserted by the partitioner (ICI-ridden on TPU) and
overlapped with the backward pass by XLA's latency-hiding scheduler — no
explicit ``pmean``, no per-host batch reshaping, no replicated state copies
on the host.

The model is ~1M parameters, so parameter sharding buys nothing; the scaling
axis is rays (and implicitly samples, which stay on-chip per ray). Multi-host
entry: call ``jax.distributed.initialize()`` before ``create_mesh()`` — the
mesh spans ``jax.devices()`` (global), and ``jit`` handles cross-host
collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def create_mesh(devices: Optional[Sequence] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
  """1-D data mesh over all (global) devices."""
  if devices is None:
    devices = jax.devices()
  return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
  """Leading-dim (ray) sharding for batches."""
  return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  """Full replication (parameters, optimizer state, scalars)."""
  return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
  """Places a host batch with rays sharded over the mesh."""
  sharding = batch_sharding(mesh, axis_name)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), batch)


def pad_to_multiple(n: int, multiple: int) -> int:
  return ((n + multiple - 1) // multiple) * multiple
