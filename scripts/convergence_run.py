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
import functools
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
  import jax.numpy as jnp
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

  # Normal fidelity: weights-accumulated canonical σ-grad normal
  # (target_norm) vs the analytic sphere normal, on moving-object pixels of
  # train views (only meaningful with the normal branch on).
  if not args.no_normals:
    scalars = eval_schedules(build_schedules(train_cfg), state.step)
    extra = dict(default_extra_params(model_cfg))
    for k in ('nerf_alpha', 'warp_alpha', 'hyper_alpha',
              'hyper_sheet_alpha', 'norm_input_alpha'):
      extra[k] = scalars[k]
    # Jitted: eager per-op dispatch over the tunneled backend is
    # network-latency slow (environment gotcha in the verify skill).
    render_chunk = jax.jit(functools.partial(
        trainer.model.render, return_full=True, return_weights=True))
    coss = []
    for iid in src.train_ids[:4]:
      item = src.load_item(iid)
      o = item['origins'].reshape(-1, 3)
      d = item['directions'].reshape(-1, 3)
      mask2d = item['mask'].reshape(-1) > 0.5
      ray_tn = []
      med_depth = []
      for s0 in range(0, o.shape[0], 2048):
        sub = {
            'origins': jnp.asarray(o[s0:s0 + 2048]),
            'directions': jnp.asarray(d[s0:s0 + 2048]),
            'mask': jnp.asarray(
                item['mask'].reshape(-1, 1)[s0:s0 + 2048]),
            'metadata': {
                k: jnp.asarray(np.broadcast_to(
                    v.reshape(-1, v.shape[-1])[:1],
                    (min(2048, o.shape[0] - s0), v.shape[-1])))
                for k, v in item['metadata'].items()},
        }
        out = render_chunk(state.params, sub, jax.random.PRNGKey(0), extra)
        f = out['fine']
        w = np.asarray(f['weights'])
        # Observation-frame normal fed to the radiance branch (canonical
        # predicted_norm rotated back by the shared screw's R⁻¹) — the
        # frame the analytic scene normal lives in. target_norm /
        # predicted_norm are canonical-frame and NOT comparable (the
        # canonical orientation is arbitrary).
        tn = np.asarray(f['norm_input'])
        ray_tn.append((w[..., None] * tn).sum(1))
        med_depth.append(np.asarray(f['med_depth']))
      ray_tn = np.concatenate(ray_tn)
      depth = np.concatenate(med_depth)
      center = _sphere_center(int(iid) / src.num_frames)
      surf = o + depth[..., None] * d
      # Surface-consistent pixels only: silhouette rays with low alpha get
      # background median depths, placing `surf` far past the sphere and
      # flipping the analytic normal's sign (measured: contaminated mean
      # cosine −0.64 vs +0.4 filtered).
      r_surf = np.linalg.norm(surf - center, axis=-1)
      on_surface = mask2d & (r_surf < 0.32)
      gt_n = surf - center
      gt_n /= np.maximum(np.linalg.norm(gt_n, axis=-1, keepdims=True), 1e-8)
      pn = ray_tn / np.maximum(
          np.linalg.norm(ray_tn, axis=-1, keepdims=True), 1e-8)
      if on_surface.sum():
        coss.append(float(((gt_n * pn).sum(-1))[on_surface].mean()))
    emit({'normal_cosine_train_views': round(float(np.mean(coss)), 4),
          'note': 'observation-frame norm_input vs analytic outward '
                  'normal, surface-consistent moving-object pixels'})


if __name__ == '__main__':
  main()
