#!/usr/bin/env python3
"""Do normals earn their keep? Full NeRF-DS vs a no-normals ablation on a
scene engineered so view-dependent shading is hard WITHOUT normals.

Scene: the specular synthetic scene with a SHARP Blinn-Phong highlight
(exponent 100 vs the default 25) on the moving sphere, white background.
Val views are held-out novel times; the highlight's screen position is a
narrow function of (normal, viewdir), so generalising to unseen
(time, viewdir) combinations rewards a model whose radiance is routed
through an explicit observation-frame normal (`norm_input` posenc + the
`use_ref_radiance` reflection-vector condition, reference
model_utils.py:473-484) over a raw viewdir-conditioned rgb branch that must
memorise the highlight per training view.

Metric: masked val PSNR — PSNR restricted to moving-object pixels, where
the phenomenon lives (whole-image PSNR dilutes a ~2%-of-pixels highlight
with static background; the round-3 whole-image comparison was neutral to
0.1 dB for exactly this reason).

Cases:
  full          — shipped NeRF-DS config (predicted norm, warped
                  supervision, back-facing reg)
  ref_radiance  — full + `use_ref_radiance` (reflection-vector rgb
                  condition; the strongest normal-using inductive bias)
  no_normals    — the ablation: no predicted norm, no norm supervision,
                  no norm-input rgb condition

Writes one JSON line per case + artifacts/normals_ablation.json.
"""
import argparse
import dataclasses
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CASES = {
    'full': {},
    'ref_radiance': {'use_ref_radiance': True},
    'no_normals': {'predict_norm': False, 'use_predicted_norm': False},
}


def save_panel(trainer, state, src, item_id, path):
  """GT | pred panel of one val frame (mechanism-level visual evidence)."""
  import jax
  import numpy as np
  from nerfds_tpu.evaluation.render import render_image
  from nerfds_tpu.models import default_extra_params
  from nerfds_tpu.training.step import build_schedules, eval_schedules
  import PIL.Image
  item = src.load_item(item_id)
  rays = {k: item[k] for k in ('origins', 'directions', 'mask')}
  rays['metadata'] = {k: v[:1, :1].reshape(1, -1)
                      for k, v in item['metadata'].items()}
  scalars = eval_schedules(build_schedules(trainer.train_cfg), state.step)
  extra = dict(default_extra_params(trainer.model.config))
  for k in ('nerf_alpha', 'warp_alpha', 'hyper_alpha', 'hyper_sheet_alpha',
            'norm_input_alpha'):
    extra[k] = scalars[k]
  out = render_image(trainer.model, state.params, rays,
                     jax.random.PRNGKey(0), extra, chunk=4096,
                     mesh=trainer.mesh)
  panel = np.concatenate([item['rgb'], np.asarray(out['rgb'])], axis=1)
  PIL.Image.fromarray(
      (np.clip(panel, 0, 1) * 255).astype(np.uint8)).save(path)


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--steps', type=int, default=10000)
  p.add_argument('--batch', type=int, default=2048)
  p.add_argument('--frames', type=int, default=16)
  p.add_argument('--image_size', type=int, default=64)
  p.add_argument('--exponent', type=float, default=100.0)
  p.add_argument('--seeds', default='0', help='comma-separated paired seeds')
  p.add_argument('--scene', default='emissive',
                 choices=['emissive', 'mechanism'],
                 help="'emissive': the round-4 highlight-on-emissive scene. "
                      "'mechanism': NON-emissive Blinn-Phong surface lit by "
                      'a CAMERA-ANCHORED light — the highlight moves against '
                      'the object motion, the condition the NeRF-DS paper '
                      'claims corrupts mask-free deformation estimation '
                      '(reference README.md:1-12)')
  p.add_argument('--cases', default='full,ref_radiance,no_normals')
  p.add_argument('--tag', default='normals_ablation',
                 help='output file stem under --out')
  p.add_argument('--save_panels', action='store_true')
  p.add_argument('--out', default=str(REPO / 'artifacts'))
  args = p.parse_args()

  from nerfds_tpu import config as config_lib
  from nerfds_tpu.datasets.synthetic import SyntheticDataSource
  from nerfds_tpu.trainer import Trainer

  steps = args.steps
  if args.scene == 'mechanism':
    src = SyntheticDataSource(num_frames=args.frames,
                              image_size=args.image_size,
                              gt_samples=192, white_background=True,
                              field_kind='shaded', light_mode='camera',
                              specular_exponent=args.exponent,
                              gt_backend='jax')
  else:
    src = SyntheticDataSource(num_frames=args.frames,
                              image_size=args.image_size,
                              gt_samples=192, specular=True,
                              white_background=True,
                              specular_exponent=args.exponent,
                              gt_backend='jax')
  seeds = [int(s) for s in args.seeds.split(',')]
  out_dir = pathlib.Path(args.out)
  out_dir.mkdir(exist_ok=True)
  rows = []
  for name in args.cases.split(','):
    over = dict(CASES[name], use_white_background=True)
    model_cfg = dataclasses.replace(config_lib.nerf_ds(), **over)
    train_cfg = dataclasses.replace(
        config_lib.nerf_ds_train_config(max_steps=steps,
                                        batch_size=args.batch),
        lr_schedule=('exponential', 1e-3, 1e-5, steps),
        warp_alpha_schedule=('linear', 0, 4, steps // 5),
        norm_input_alpha_schedule=(
            'piecewise', ((steps // 25, ('constant', 0.0)),
                          (0, ('linear', 0.0, 4.0, steps // 10)))),
        sharp_mask_std_schedule=(
            'piecewise',
            ((steps // 8, ('exponential', 1.0, 0.1, steps // 8)),
             (steps, ('constant', 0.1)))),
        x_for_rgb_alpha_schedule=(
            'piecewise', ((steps // 5, ('constant', 0.0)),
                          (steps // 5, ('linear', 0.0, 4.0, steps // 5)),
                          (steps, ('constant', 4.0)))),
        random_seed=seeds[0], print_every=max(steps // 20, 1),
        save_every=10 ** 9)
    # One Trainer per case, reused over seeds: the compiled step is
    # seed-independent (same trick as quality_ablate.py).
    trainer = Trainer.from_experiment(model_cfg, train_cfg, src,
                                      exp_dir=None, use_mesh=False)
    for seed in seeds:
      trainer.train_cfg = dataclasses.replace(trainer.train_cfg,
                                              random_seed=seed)
      t0 = time.time()
      state = trainer.train(state=trainer.init_state(seed))
      wall = time.time() - t0
      m_train = trainer.eval_psnr(state, item_ids=src.train_ids[:4],
                                  masked=True)
      m_val = trainer.eval_psnr(state, masked=True)
      row = {'case': name, 'scene': args.scene, 'steps': steps,
             'batch': args.batch, 'exponent': args.exponent, 'seed': seed,
             'wall_s': round(wall, 1),
             'train_psnr': round(m_train['psnr'], 3),
             'train_masked_psnr': round(m_train.get('masked_psnr',
                                                    float('nan')), 3),
             'val_psnr': round(m_val['psnr'], 3),
             'val_masked_psnr': round(m_val.get('masked_psnr',
                                                float('nan')), 3),
             'val_ms_ssim': round(m_val['ms_ssim'], 4)}
      print(json.dumps(row), flush=True)
      rows.append(row)
      if args.save_panels:
        save_panel(trainer, state, src, src.val_ids[0],
                   out_dir / f'{args.tag}_{name}_s{seed}.png')

  # Paired deltas vs 'full' at the same seed.
  by = {(r['case'], r['seed']): r for r in rows}
  summary = {}
  for name in {r['case'] for r in rows} - {'full'}:
    for metric in ('val_masked_psnr', 'val_psnr', 'val_ms_ssim'):
      d = [by[(name, s)][metric] - by[('full', s)][metric]
           for s in seeds if (name, s) in by and ('full', s) in by]
      if d:
        summary.setdefault(name, {})[f'delta_{metric}'] = {
            'mean': round(sum(d) / len(d), 3),
            'per_seed': [round(x, 3) for x in d]}
  print('PAIRED_SUMMARY ' + json.dumps(summary), flush=True)
  (out_dir / f'{args.tag}.json').write_text(
      json.dumps({'rows': rows, 'paired_vs_full': summary}, indent=2) + '\n')


if __name__ == '__main__':
  main()
