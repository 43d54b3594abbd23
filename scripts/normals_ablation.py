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


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--steps', type=int, default=10000)
  p.add_argument('--batch', type=int, default=2048)
  p.add_argument('--frames', type=int, default=16)
  p.add_argument('--image_size', type=int, default=64)
  p.add_argument('--exponent', type=float, default=100.0)
  p.add_argument('--seed', type=int, default=0)
  p.add_argument('--cases', default='full,ref_radiance,no_normals')
  p.add_argument('--out', default=str(REPO / 'artifacts'))
  args = p.parse_args()

  from nerfds_tpu import config as config_lib
  from nerfds_tpu.datasets.synthetic import SyntheticDataSource
  from nerfds_tpu.trainer import Trainer

  steps = args.steps
  src = SyntheticDataSource(num_frames=args.frames,
                            image_size=args.image_size,
                            gt_samples=192, specular=True,
                            white_background=True,
                            specular_exponent=args.exponent)
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
        random_seed=args.seed, print_every=max(steps // 20, 1),
        save_every=10 ** 9)
    trainer = Trainer.from_experiment(model_cfg, train_cfg, src,
                                      exp_dir=None, use_mesh=False)
    t0 = time.time()
    state = trainer.train()
    wall = time.time() - t0
    m_train = trainer.eval_psnr(state, item_ids=src.train_ids[:4],
                                masked=True)
    m_val = trainer.eval_psnr(state, masked=True)
    row = {'case': name, 'steps': steps, 'batch': args.batch,
           'exponent': args.exponent, 'seed': args.seed,
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

  out_dir = pathlib.Path(args.out)
  out_dir.mkdir(exist_ok=True)
  (out_dir / 'normals_ablation.json').write_text(
      json.dumps(rows, indent=2) + '\n')


if __name__ == '__main__':
  main()
