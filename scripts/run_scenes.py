#!/usr/bin/env python3
"""Multi-scene experiment orchestration (L7).

Parity target: reference ``utils/training_pipeline.py`` +
``utils/pipeline_settings.py``: sequentially train (and optionally evaluate)
the benchmark scene list, tolerating per-scene failures, then aggregate
final metrics into one CSV.

The NeRF-DS benchmark set (reference training_pipeline.py:26-36):
bell, cup, as, basin, sieve, press, bowl, plate, 2cup (`*_novel_view`).
"""
import argparse
import csv
import json
import subprocess
import sys
from pathlib import Path

DEFAULT_SCENES = ['bell', 'cup', 'as', 'basin', 'sieve', 'press', 'bowl',
                  'plate', '2cup']


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--data_root', required=True,
                      help='root containing <scene>_novel_view dirs')
  parser.add_argument('--exp_root', required=True)
  parser.add_argument('--scenes', nargs='*', default=DEFAULT_SCENES)
  parser.add_argument('--suffix', default='_novel_view')
  parser.add_argument('--preset', default='nerf_ds')
  parser.add_argument('--max_steps', type=int, default=250000)
  parser.add_argument('--batch_size', type=int, default=None)
  parser.add_argument('--extra_args', nargs=argparse.REMAINDER, default=[])
  args = parser.parse_args()

  results = {}
  scripts_dir = Path(__file__).resolve().parent
  for scene in args.scenes:
    data_dir = Path(args.data_root) / f'{scene}{args.suffix}'
    exp_dir = Path(args.exp_root) / scene
    cmd = [sys.executable, str(scripts_dir / 'train.py'),
           '--preset', args.preset,
           '--data_dir', str(data_dir),
           '--exp_dir', str(exp_dir),
           '--max_steps', str(args.max_steps)]
    if args.batch_size:
      cmd += ['--batch_size', str(args.batch_size)]
    cmd += args.extra_args
    print(f'=== {scene}: {" ".join(cmd)}', flush=True)
    try:
      subprocess.run(cmd, check=True)
      metrics_path = exp_dir / 'final_metrics.json'
      if metrics_path.exists():
        results[scene] = json.loads(metrics_path.read_text())
    except subprocess.CalledProcessError as e:
      # Tolerate per-scene failures and continue (reference
      # training_pipeline.py:89-97).
      print(f'scene {scene} FAILED: {e}', file=sys.stderr, flush=True)
      results[scene] = {'error': str(e)}

  out_csv = Path(args.exp_root) / 'summary.csv'
  keys = sorted({k for r in results.values() for k in r if k != 'error'})
  with open(out_csv, 'w', newline='') as f:
    writer = csv.writer(f)
    writer.writerow(['scene'] + keys)
    for scene, r in results.items():
      writer.writerow([scene] + [r.get(k, '') for k in keys])
  print(f'wrote {out_csv}')


if __name__ == '__main__':
  main()
