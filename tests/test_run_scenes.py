"""Orchestration script (scripts/run_scenes.py) — parity with the
reference's utils/training_pipeline.py: sequential per-scene runs, per-scene
failure tolerance, CSV aggregation of final metrics."""
import csv
import importlib.util
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_run_scenes():
  spec = importlib.util.spec_from_file_location(
      'run_scenes', REPO / 'scripts' / 'run_scenes.py')
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


def test_default_scene_set_matches_reference():
  mod = _load_run_scenes()
  # Reference utils/training_pipeline.py:26-36 benchmark list.
  assert mod.DEFAULT_SCENES == ['bell', 'cup', 'as', 'basin', 'sieve',
                                'press', 'bowl', 'plate', '2cup']


def test_orchestration_tolerates_failures_and_aggregates(tmp_path,
                                                         monkeypatch):
  mod = _load_run_scenes()
  exp_root = tmp_path / 'exp'
  exp_root.mkdir()
  calls = []

  def fake_run(cmd, check):
    calls.append(cmd)
    scene = Path(cmd[cmd.index('--exp_dir') + 1]).name
    if scene == 'cup':  # one scene fails; the pipeline must continue
      raise subprocess.CalledProcessError(1, cmd)
    exp_dir = exp_root / scene
    exp_dir.mkdir(parents=True, exist_ok=True)
    (exp_dir / 'final_metrics.json').write_text(
        json.dumps({'psnr': 30.0 if scene == 'bell' else 28.0, 'ssim': 0.9}))

  monkeypatch.setattr(mod.subprocess, 'run', fake_run)
  monkeypatch.setattr(sys, 'argv', [
      'run_scenes.py', '--data_root', str(tmp_path / 'data'),
      '--exp_root', str(exp_root), '--scenes', 'bell', 'cup', 'basin',
      '--max_steps', '10'])
  mod.main()

  assert len(calls) == 3  # ran every scene despite the failure
  with open(exp_root / 'summary.csv') as f:
    rows = list(csv.reader(f))
  assert rows[0] == ['scene', 'psnr', 'ssim']
  by_scene = {r[0]: r[1:] for r in rows[1:]}
  assert by_scene['bell'] == ['30.0', '0.9']
  assert by_scene['cup'] == ['', '']  # failed scene: empty metrics row
  assert by_scene['basin'] == ['28.0', '0.9']
