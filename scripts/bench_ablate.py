"""Cost attribution: time the training step across ablated configurations.

Each row disables one architectural component (relative to the shipped
NeRF-DS config) so its cost can be read off as the step-time delta. Uses the
same chained-steps/single-fetch timing methodology as bench.py (see
BENCHMARKS.md for why that matters on tunneled devices).

Usage: python scripts/bench_ablate.py [--batch N] [--iters N] [--only name...]
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build(batch_size, cfg_overrides, train_overrides=None):
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.models import NerfDSModel
  from nerfds_tpu.training import TrainState, make_train_step

  cfg = dataclasses.replace(config_lib.nerf_ds(), **cfg_overrides)
  model = NerfDSModel(config=cfg, num_warp_embeds=64, num_hyper_embeds=64,
                      near=0.2, far=2.0)
  train_cfg = config_lib.nerf_ds_train_config(batch_size=batch_size)
  if train_overrides:
    train_cfg = dataclasses.replace(train_cfg, **train_overrides)
  params = jax.jit(model.init)(jax.random.PRNGKey(0))
  state = TrainState.create(params)
  step_fn = make_train_step(model, train_cfg, donate=False)

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
  return state, step_fn, batch


def time_steps(state, step_fn, batch, warmup, iters):
  key = jax.random.PRNGKey(0)
  for i in range(warmup):
    state, stats = step_fn(state, batch, jax.random.fold_in(key, i))
  _ = float(jax.device_get(stats['coarse']['loss/total']))
  t0 = time.perf_counter()
  for i in range(iters):
    state, stats = step_fn(state, batch, jax.random.fold_in(key, 100 + i))
  _ = float(jax.device_get(stats['coarse']['loss/total']))
  return (time.perf_counter() - t0) / iters


ABLATIONS = {
    'full': {},
    'no_mask_mlp': dict(use_predicted_mask=False, use_mask_sharp_weights=False,
                        use_3d_mask=False),
    'no_norm': dict(predict_norm=False, use_predicted_norm=False,
                    norm_supervision_type='warped'),
    'no_warp': dict(use_warp=False, use_mask_in_warp=False,
                    hyper_use_warp_embed=False),
    'no_hyper': dict(hyper_slice_method='none', use_mask_in_hyper=False),
    'no_x_in_rgb': dict(use_x_in_rgb_condition=False),
    'topk32': dict(norm_grad_topk=32),
    'topk16': dict(norm_grad_topk=16),
    'topk12': dict(norm_grad_topk=12),
    'topk8': dict(norm_grad_topk=8),
    'remat': dict(remat_sigma=True),
    'remat_feat': dict(remat_feat=True),
    'bf16': dict(compute_dtype='bfloat16'),
}


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--batch', type=int, default=2048)
  p.add_argument('--warmup', type=int, default=3)
  p.add_argument('--iters', type=int, default=10)
  p.add_argument('--only', nargs='*', default=None)
  args = p.parse_args()

  names = args.only or list(ABLATIONS)
  results = {}
  for name in names:
    try:
      state, step_fn, batch = build(args.batch, ABLATIONS[name])
      sec = time_steps(state, step_fn, batch, args.warmup, args.iters)
      results[name] = round(sec * 1e3, 2)
      print(json.dumps({'ablation': name, 'ms_per_step': results[name],
                        'rays_per_sec': round(args.batch / sec, 0)}),
            flush=True)
    except Exception as e:
      print(json.dumps({'ablation': name, 'error': repr(e)[:200]}), flush=True)
  if 'full' in results:
    base = results['full']
    for name, ms in results.items():
      if name != 'full':
        print(f'# {name}: {base - ms:+.1f} ms vs full ({ms} ms)')


if __name__ == '__main__':
  main()
