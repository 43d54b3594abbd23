#!/usr/bin/env python3
"""Weak-scaling benchmark over the device mesh.

Measures training-step throughput (full NeRF-DS architecture, fwd+bwd,
128 samples/ray) at 1, 2, 4, ... N devices with a CONSTANT per-chip ray
batch, and reports rays/s/chip and scaling efficiency vs the 1-device run.
This is the harness for BASELINE.md's ">=85% scaling efficiency" target;
the reference has no analog (its pmap path was never measured for scaling).

On a multi-chip TPU slice this measures real ICI scaling (the only
cross-chip traffic is the ~1M-param gradient all-reduce inserted by the
partitioner). On CPU it validates the sharded program end-to-end:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --per_chip_batch 64 --tiny

Prints one JSON line per device count plus a summary line.
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(n_devices: int, per_chip_batch: int, tiny: bool):
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.models import NerfDSModel
  from nerfds_tpu.parallel import (create_mesh, replicated_sharding,
                                   shard_batch)
  from nerfds_tpu.training import TrainState, make_train_step

  cfg = config_lib.nerf_ds()
  if tiny:
    cfg = dataclasses.replace(
        cfg, num_coarse_samples=8, num_fine_samples=8, nerf_trunk_depth=2,
        nerf_trunk_width=32, se3_trunk_depth=2, se3_trunk_width=16,
        hyper_sheet_depth=2, hyper_sheet_width=16, mask_mlp_depth=2,
        mask_mlp_width=16, nerf_skips=(), se3_skips=(),
        hyper_sheet_skips=(), mask_skips=())
  model = NerfDSModel(config=cfg, num_warp_embeds=64, num_hyper_embeds=64,
                      near=0.2, far=2.0)
  batch_size = per_chip_batch * n_devices
  train_cfg = config_lib.nerf_ds_train_config(batch_size=batch_size)

  mesh = create_mesh(jax.devices()[:n_devices])
  params = jax.jit(model.init)(jax.random.PRNGKey(0))
  state = TrainState.create(params)
  state = jax.device_put(state, replicated_sharding(mesh))

  rng = np.random.RandomState(0)
  directions = rng.randn(batch_size, 3).astype(np.float32)
  directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
  batch = {
      'origins': jnp.asarray(
          rng.randn(batch_size, 3).astype(np.float32) * 0.1),
      'directions': jnp.asarray(directions),
      'rgb': jnp.asarray(rng.rand(batch_size, 3).astype(np.float32)),
      'metadata': {'warp': jnp.asarray(
          rng.randint(0, 64, (batch_size, 1)), jnp.int32)},
      'mask': jnp.asarray(rng.rand(batch_size, 1).astype(np.float32)),
  }
  batch = shard_batch(batch, mesh)
  step_fn = make_train_step(model, train_cfg, donate=False)
  return state, step_fn, batch, batch_size


def time_steps(state, step_fn, batch, warmup: int, iters: int) -> float:
  """Chained dependent steps, one device->host fetch (see bench.py)."""
  key = jax.random.PRNGKey(0)
  for i in range(warmup):
    state, stats = step_fn(state, batch, jax.random.fold_in(key, i))
  _ = float(jax.device_get(stats['coarse']['loss/total']))
  t0 = time.perf_counter()
  for i in range(iters):
    state, stats = step_fn(state, batch, jax.random.fold_in(key, 100 + i))
  _ = float(jax.device_get(stats['coarse']['loss/total']))
  return (time.perf_counter() - t0) / iters


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--per_chip_batch', type=int, default=2048)
  parser.add_argument('--tiny', action='store_true',
                      help='tiny model (CPU-mesh plumbing validation)')
  parser.add_argument('--warmup', type=int, default=3)
  parser.add_argument('--iters', type=int, default=10)
  parser.add_argument('--device_counts', type=int, nargs='*', default=None)
  args = parser.parse_args()

  n_total = jax.device_count()
  counts = args.device_counts
  if not counts:
    counts = [c for c in (1, 2, 4, 8, 16, 32, 64) if c <= n_total]

  base_per_chip = None
  rows = []
  for n in counts:
    state, step_fn, batch, batch_size = build_step(
        n, args.per_chip_batch, args.tiny)
    sec = time_steps(state, step_fn, batch, args.warmup, args.iters)
    per_chip = batch_size / sec / n
    if base_per_chip is None:
      base_per_chip = per_chip
    eff = per_chip / base_per_chip
    row = {'devices': n, 'ms_per_step': round(sec * 1e3, 2),
           'rays_per_sec_per_chip': round(per_chip, 1),
           'scaling_efficiency': round(eff, 4)}
    rows.append(row)
    print(json.dumps(row), flush=True)

  print(json.dumps({
      'metric': 'weak_scaling_efficiency',
      'value': rows[-1]['scaling_efficiency'],
      'unit': f"x vs 1 device @ {args.per_chip_batch} rays/chip",
      'devices': rows[-1]['devices'],
  }))


if __name__ == '__main__':
  main()
