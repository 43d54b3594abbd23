"""End-to-end CLI pipeline on CPU: train -> eval daemon (eval_once) ->
render (debug video). Covers the L7 surface the reference exercises through
``train.py`` / ``eval.py`` / ``render.py``, including the round-3 fixes
(schedules evaluated at the checkpoint step; debug-grid video)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def run_cli(script, *args, timeout=900):
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  proc = subprocess.run(
      [sys.executable, str(REPO / 'scripts' / script), *args],
      capture_output=True, text=True, timeout=timeout, env=env)
  assert proc.returncode == 0, (
      f'{script} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}')
  return proc


@pytest.fixture(scope='module')
def exp_dir(tmp_path_factory):
  # Train from a written Nerfies-layout scene dir (not the in-memory
  # synthetic source) so the CLI covers the production datasource path,
  # including camera-paths/ test cameras for the evaluator's test split.
  from nerfds_tpu.datasets.synthetic import (SyntheticDataSource,
                                             write_nerfies_dataset)
  scene = tmp_path_factory.mktemp('cli_scene')
  write_nerfies_dataset(
      SyntheticDataSource(num_frames=8, image_size=32, gt_samples=96), scene)
  d = tmp_path_factory.mktemp('cli_exp')
  run_cli('train.py', '--preset', 'synthetic_smoke', '--exp_dir', str(d),
          '--datasource', 'nerfies', '--data_dir', str(scene),
          '--max_steps', '40', '--batch_size', '64', '--platform', 'cpu',
          '--set', 'model.num_coarse_samples=6',
          '--set', 'model.num_fine_samples=6',
          '--set', 'train.save_every=40', '--no_mesh')
  return d


def test_train_cli_writes_experiment(exp_dir):
  for f in ('model_config.json', 'train_config.json', 'experiment.json'):
    assert (exp_dir / f).exists(), f
  assert (exp_dir / 'checkpoints').exists()
  # JSONL metrics log is always on.
  logs = list(exp_dir.glob('**/*.jsonl'))
  assert logs, 'no jsonl metrics log written'


def test_eval_cli_writes_metrics_at_checkpoint_step(exp_dir):
  run_cli('eval.py', '--exp_dir', str(exp_dir), '--eval_once',
          '--num_val_eval', '1', '--num_train_eval', '1',
          '--num_test_eval', '1',
          '--chunk', '2048', '--save_images', '--platform', 'cpu')
  metrics = exp_dir / 'metrics' / '40.json'
  assert metrics.exists(), list((exp_dir / 'metrics').glob('*'))
  report = json.loads(metrics.read_text())
  assert 'train' in report and 'psnr' in report['train']['mean']
  assert np.isfinite(report['train']['mean']['psnr'])
  renders = list((exp_dir / 'renders' / '40').glob('**/*.png'))
  assert renders, 'no eval panels written'
  # Test-camera split (reference eval.py:440-477): rendered with sampled
  # metadata, panels under renders/<step>/test/.
  assert 'test' in report, report.keys()
  assert all(v['finite'] for v in report['test']['per_item'].values())
  assert list((exp_dir / 'renders' / '40' / 'test').glob('*.png'))


def test_render_cli_writes_debug_video(exp_dir, tmp_path):
  out = tmp_path / 'render'
  run_cli('render.py', '--exp_dir', str(exp_dir), '--camera_path', 'train',
          '--interval', '4', '--platform', 'cpu', '--out', str(out))
  assert (out / 'debug_frame0.png').exists()
  # mp4 when libx264 is present, else a frames directory fallback.
  assert any(out.glob('rgb.mp4*')), list(out.glob('*'))
  assert any(out.glob('debug.mp4*')), list(out.glob('*'))
