#!/usr/bin/env python3
"""Long-horizon convergence run: PSNR-vs-wallclock on the specular scene.

Trains the FULL production NeRF-DS architecture (trunk 8x256 skip@4, SE3
6x128, hyper 6x64, mask 8x128, 64+64 samples) on the specular synthetic
scene for tens of thousands of steps on the real chip, logging a
train/val-PSNR-versus-wallclock curve (JSONL) plus end-of-run normal
fidelity (cosine between the weights-accumulated σ-gradient normal and the
moving sphere's analytic normal on train views) — the schedule-sensitive
regression evidence a 3k-step snapshot cannot give (warp alpha, sharp-mask
std and x-in-rgb windows all complete inside the run).

Usage:
  python scripts/convergence_run.py --steps 20000 --out /tmp/conv_full.jsonl
  python scripts/convergence_run.py --steps 20000 --no_normals \
      --out /tmp/conv_nonorm.jsonl     # ablation A/B
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--steps', type=int, default=20000)
  p.add_argument('--batch', type=int, default=2048)
  p.add_argument('--eval_every', type=int, default=2000)
  p.add_argument('--frames', type=int, default=16)
  p.add_argument('--image_size', type=int, default=64)
  p.add_argument('--no_normals', action='store_true',
                 help='ablation: disable the normal branch entirely')
  p.add_argument('--seed', type=int, default=0)
  p.add_argument('--out', default='/tmp/convergence.jsonl')
  args = p.parse_args()

  import jax
  import numpy as np
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.datasets.synthetic import (SyntheticDataSource,
                                             _sphere_center)
  from nerfds_tpu.trainer import Trainer
  from nerfds_tpu.models import default_extra_params
  from nerfds_tpu.training.step import build_schedules, eval_schedules

  steps = args.steps
  # White background (scene + model): with a black background the opaque
  # all-black fog is a strong local minimum that captured full
  # production-schedule runs (train PSNR pinned at ~12 dB = the black
  # image's PSNR); compositing onto white removes the attractor — the
  # standard synthetic-NeRF convention.
  src = SyntheticDataSource(num_frames=args.frames,
                            image_size=args.image_size,
                            gt_samples=192, specular=True,
                            white_background=True)
  over = {'use_white_background': True}
  if args.no_normals:
    over.update(predict_norm=False, use_predicted_norm=False)
  model_cfg = dataclasses.replace(config_lib.nerf_ds(), **over)
  # nerf_ds.gin schedules rescaled from 250k to `steps` (same proportions
  # as scripts/quality_ablate.py).
  train_cfg = dataclasses.replace(
      config_lib.nerf_ds_train_config(max_steps=steps, batch_size=args.batch),
      lr_schedule=('exponential', 1e-3, 1e-5, steps),
      warp_alpha_schedule=('linear', 0, 4, steps // 5),
      norm_input_alpha_schedule=(
          'piecewise', ((steps // 25, ('constant', 0.0)),
                        (0, ('linear', 0.0, 4.0, steps // 10)))),
      sharp_mask_std_schedule=(
          'piecewise', ((steps // 8, ('exponential', 1.0, 0.1, steps // 8)),
                        (steps, ('constant', 0.1)))),
      x_for_rgb_alpha_schedule=(
          'piecewise', ((steps // 5, ('constant', 0.0)),
                        (steps // 5, ('linear', 0.0, 4.0, steps // 5)),
                        (steps, ('constant', 4.0)))),
      random_seed=args.seed, print_every=max(steps // 50, 1),
      save_every=10 ** 9)
  trainer = Trainer.from_experiment(model_cfg, train_cfg, src,
                                    exp_dir=None, use_mesh=False)

  out_path = Path(args.out)
  out_path.write_text('')
  t_start = time.time()

  def emit(row):
    with out_path.open('a') as f:
      f.write(json.dumps(row) + '\n')
    print(json.dumps(row), flush=True)

  emit({'meta': {'steps': steps, 'batch': args.batch,
                 'no_normals': args.no_normals, 'frames': args.frames,
                 'image_size': args.image_size, 'seed': args.seed}})

  store = trainer.build_store()
  state = trainer.init_state(args.seed)
  for start in range(0, steps, args.eval_every):
    n = min(args.eval_every, steps - start)
    state = trainer.train(num_steps=start + n, state=state, store=store)
    wall = time.time() - t_start
    m_train = trainer.eval_psnr(state, item_ids=src.train_ids[:3])
    m_val = trainer.eval_psnr(state)
    emit({'step': start + n, 'wall_s': round(wall, 1),
          'train_psnr': round(m_train['psnr'], 3),
          'val_psnr': round(m_val['psnr'], 3),
          'val_ms_ssim': round(m_val['ms_ssim'], 4)})

  # Normal fidelity (only meaningful with the normal branch on):
  # weight-argmax association — the observation-frame normal at each ray's
  # highest-weight sample vs the analytic sphere normal at that sample's
  # position. Replaces the round-3 median-depth association, which selected
  # zero pixels at production scale (silhouette rays take background
  # depths). See nerfds_tpu/evaluation/normals.py.
  if not args.no_normals:
    from nerfds_tpu.evaluation.normals import (normal_fidelity,
                                               sphere_analytic_normal,
                                               sphere_surface_filter)
    scalars = eval_schedules(build_schedules(train_cfg), state.step)
    extra = dict(default_extra_params(model_cfg))
    for k in ('nerf_alpha', 'warp_alpha', 'hyper_alpha',
              'hyper_sheet_alpha', 'norm_input_alpha'):
      extra[k] = scalars[k]
    fid = normal_fidelity(trainer.model, state.params, src, extra,
                          sphere_analytic_normal(_sphere_center),
                          item_ids=src.train_ids[:4],
                          surface_filter=sphere_surface_filter(
                              _sphere_center))
    emit({'normal_cosine_train_views': round(fid['cosine'], 4),
          'normal_surface_cosine': round(fid['surface_cosine'], 4),
          'normal_pixels': fid['num_pixels'],
          'normal_surface_pixels': fid['surface_pixels'],
          'normal_frac_selected': round(fid['frac_selected'], 4),
          'note': 'weight-argmax sample association: observation-frame '
                  'norm_input vs analytic outward normal'})


if __name__ == '__main__':
  main()
