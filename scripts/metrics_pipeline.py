#!/usr/bin/env python3
"""Offline quantitative metrics pipeline (L7).

Parity target: reference ``utils/evaluate_pipeline.py`` +
``utils/calculate_quantitative_results.py`` + ``utils/load_results.py``:
compute PSNR / MS-SSIM / LPIPS over rendered frames vs ground truth for a
set of scenes/experiments and aggregate to CSV. Masked variants (metrics on
the moving-object region only) are included, as the NeRF-DS paper reports.
"""
import argparse
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def load_image(path):
  from nerfds_tpu.image_utils import image_to_float32, load_image
  img = image_to_float32(load_image(path))
  if img.ndim == 2:  # grayscale (e.g. the .png.png masks) decodes 2-D
    img = img[..., None]
  return img[..., :3]


def metrics_for_pair(pred, gt, lpips_metric, mask=None):
  from nerfds_tpu.evaluation import metrics as m
  out = m.compute_all(pred, gt, lpips_metric)
  if mask is not None and mask.any():
    mask3 = np.repeat(mask[..., :1], 3, axis=-1) > 0.5
    mse = float(np.mean((pred[mask3] - gt[mask3]) ** 2))
    out['masked_mse'] = mse
    out['masked_psnr'] = float(-10.0 * np.log10(max(mse, 1e-12)))
  return out


def evaluate_dir(pred_dir: Path, gt_dir: Path, mask_dir: Path = None,
                 lpips_metric=None):
  """Frame-matched metrics over two directories of images."""
  preds = sorted(pred_dir.glob('*.png'))
  rows = []
  for pred_path in preds:
    gt_path = gt_dir / pred_path.name
    if not gt_path.exists():
      continue
    pred = load_image(pred_path)
    gt = load_image(gt_path)
    if pred.shape != gt.shape:
      continue
    mask = None
    if mask_dir is not None:
      mask_path = mask_dir / f'{pred_path.stem}.png.png'
      if mask_path.exists():
        mask = 1.0 - load_image(mask_path)[..., :1]
    row = metrics_for_pair(pred, gt, lpips_metric, mask)
    row['frame'] = pred_path.stem
    rows.append(row)
  return rows


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--pred_dir', required=True,
                      help='directory of rendered frames (PNG)')
  parser.add_argument('--gt_dir', required=True)
  parser.add_argument('--mask_dir', default=None)
  parser.add_argument('--out_csv', default=None)
  parser.add_argument('--use_lpips', action='store_true')
  args = parser.parse_args()

  lpips_metric = None
  if args.use_lpips:
    try:
      from nerfds_tpu.evaluation.metrics import LpipsMetric
      lpips_metric = LpipsMetric()
    except Exception as e:
      print(f'LPIPS unavailable ({e!r}); skipping', file=sys.stderr)

  rows = evaluate_dir(Path(args.pred_dir), Path(args.gt_dir),
                      Path(args.mask_dir) if args.mask_dir else None,
                      lpips_metric)
  if not rows:
    print('no matched frames', file=sys.stderr)
    sys.exit(1)

  keys = [k for k in rows[0] if k != 'frame']
  means = {k: float(np.mean([r[k] for r in rows])) for k in keys}
  print(json.dumps(means, indent=2))

  if args.out_csv:
    with open(args.out_csv, 'w', newline='') as f:
      writer = csv.DictWriter(f, fieldnames=['frame'] + keys)
      writer.writeheader()
      writer.writerows(rows)
      writer.writerow({'frame': 'MEAN', **means})
    print(f'wrote {args.out_csv}')


if __name__ == '__main__':
  main()
