#!/usr/bin/env python3
"""Quality cost of speed modes: train the full NeRF-DS architecture on the
synthetic dynamic scene and report train/val PSNR per configuration.

The synthetic scene (datasets/synthetic.py) has analytic ground truth and
per-frame deformation, so novel-*time* val PSNR (interpolated warp
embeddings) measures exactly the thing speed modes endanger: the
deformation/normal structure (see BENCHMARKS.md "speed modes" table).

Usage:
  python scripts/quality_ablate.py --steps 5000 --cases f32,bf16_all
  python scripts/quality_ablate.py --list
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CASES = {
    'f32': {},
    'bf16_all': {'compute_dtype': 'bfloat16'},
    'bf16_trunk_rgb_mask': {'compute_dtype': 'bfloat16',
                            'bf16_zones': ('trunk', 'rgb', 'mask')},
    'bf16_warp_hyper': {'compute_dtype': 'bfloat16',
                        'bf16_zones': ('warp', 'hyper')},
    'bf16_trunk': {'compute_dtype': 'bfloat16', 'bf16_zones': ('trunk',)},
    'bf16_trunk_rgb': {'compute_dtype': 'bfloat16',
                       'bf16_zones': ('trunk', 'rgb')},
    'storage_bf16': {'storage_dtype': 'bfloat16'},
    'stop_target_norm': {'stop_target_norm_gradient': True},
    'topk16': {'norm_grad_topk': 16},
    'topk8': {'norm_grad_topk': 8},
}


def run_case(name, model_overrides, steps, batch_size, seed):
  import jax
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.datasets.synthetic import SyntheticDataSource
  from nerfds_tpu.trainer import Trainer

  model_cfg = dataclasses.replace(config_lib.nerf_ds(), **model_overrides)
  train_cfg = dataclasses.replace(
      config_lib.nerf_ds_train_config(max_steps=steps,
                                      batch_size=batch_size),
      lr_schedule=('exponential', 1e-3, 1e-4, steps),
      warp_alpha_schedule=('linear', 0, 4, steps // 3),
      norm_input_alpha_schedule=(
          'piecewise', ((steps // 5, ('constant', 0.0)),
                        (0, ('linear', 0.0, 4.0, steps // 10)))),
      sharp_mask_std_schedule=(
          'piecewise', ((steps // 2, ('exponential', 1.0, 0.1, steps // 2)),
                        (steps, ('constant', 0.1)))),
      x_for_rgb_alpha_schedule=(
          'piecewise', ((steps // 3, ('constant', 0.0)),
                        (steps // 3, ('linear', 0.0, 4.0, steps // 3)),
                        (steps, ('constant', 4.0)))),
      random_seed=seed, print_every=max(steps // 10, 1), save_every=10**9)
  source = SyntheticDataSource(num_frames=16, image_size=48, gt_samples=128)
  trainer = Trainer.from_experiment(model_cfg, train_cfg, source,
                                    exp_dir=None, use_mesh=False,
                                    sampling='auto')
  t0 = time.time()
  state = trainer.train()
  train_m = trainer.eval_psnr(state, item_ids=source.train_ids[:4])
  val_m = trainer.eval_psnr(state)  # val = held-out novel times
  wall = time.time() - t0
  row = {'case': name, 'steps': steps, 'batch': batch_size, 'seed': seed,
         'wall_s': round(wall, 1),
         'train_psnr': round(train_m['psnr'], 2),
         'train_ssim': round(train_m['ssim'], 4),
         'val_psnr': round(val_m['psnr'], 2),
         'val_ssim': round(val_m['ssim'], 4),
         'val_ms_ssim': round(val_m['ms_ssim'], 4)}
  print(json.dumps(row), flush=True)
  return row


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--steps', type=int, default=5000)
  p.add_argument('--batch', type=int, default=1024)
  p.add_argument('--seed', type=int, default=0)
  p.add_argument('--cases', default='f32,bf16_all,bf16_trunk_rgb_mask')
  p.add_argument('--list', action='store_true')
  args = p.parse_args()
  if args.list:
    print('\n'.join(CASES))
    return
  for name in args.cases.split(','):
    run_case(name, CASES[name], args.steps, args.batch, args.seed)


if __name__ == '__main__':
  main()
