"""Multi-host initialisation (L6).

The reference relies on ambient TPU-pod initialisation and
``jax.process_index/count`` checks scattered through the code
(train.py:191-201). Here multi-host setup is one explicit call before mesh
creation:

    from nerfds_tpu.parallel import distributed
    distributed.initialize()          # no-op on single host
    mesh = parallel.create_mesh()      # spans jax.devices() == all hosts

After this, the data mesh spans every chip of every host and the jit'd
train step's gradient all-reduce rides ICI within a slice (DCN across
slices). Host-local responsibilities that remain:

  * each process builds/keeps only its shard of the ray store
    (``RayStore.device_put`` with a mesh sharding places host-local shards);
  * checkpoint writes go through orbax, which is multi-host aware;
  * logging/printing is guarded by :func:`is_main_process`.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
  """Initialises jax.distributed when running multi-process.

  With no arguments, relies on the cluster environment (TPU pod metadata,
  or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env
  vars). A no-op when the environment describes a single process.
  """
  if coordinator_address is None:
    coordinator_address = os.environ.get('JAX_COORDINATOR_ADDRESS')
  if num_processes is None:
    n = os.environ.get('JAX_NUM_PROCESSES')
    num_processes = int(n) if n else None
  if process_id is None:
    p = os.environ.get('JAX_PROCESS_ID')
    process_id = int(p) if p else None

  explicit = coordinator_address is not None
  on_pod = bool(os.environ.get('TPU_WORKER_HOSTNAMES', '').count(','))
  if not explicit and not on_pod:
    return  # single host
  jax.distributed.initialize(
      coordinator_address=coordinator_address,
      num_processes=num_processes,
      process_id=process_id)


def is_main_process() -> bool:
  return jax.process_index() == 0


def local_shard_slice(total: int):
  """The [start, stop) range of a length-``total`` axis owned by this host
  (for building per-host ray-store shards)."""
  n = jax.process_count()
  i = jax.process_index()
  per = total // n
  start = i * per
  stop = total if i == n - 1 else start + per
  return start, stop
