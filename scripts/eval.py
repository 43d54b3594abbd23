#!/usr/bin/env python3
"""Checkpoint-polling evaluator (L7) — replaces the reference ``eval.py``.

Watches an experiment directory for new checkpoints; for each one renders
train/val subsets and writes PSNR/SSIM/MS-SSIM (+LPIPS when available) to
``<exp_dir>/metrics/<step>.json`` and rendered images to
``<exp_dir>/renders/<step>/``.
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--exp_dir', required=True)
  parser.add_argument('--data_dir', default='')
  parser.add_argument('--datasource', default='nerfies',
                      choices=['nerfies', 'interp', 'synthetic'])
  parser.add_argument('--image_scale', type=int, default=1)
  parser.add_argument('--chunk', type=int, default=8192)
  parser.add_argument('--num_val_eval', type=int, default=5)
  parser.add_argument('--num_train_eval', type=int, default=5)
  parser.add_argument('--num_test_eval', type=int, default=5,
                      help='test-camera (camera-paths/<trajectory>) renders '
                           'per checkpoint; 0 disables the split')
  parser.add_argument('--eval_once', action='store_true')
  parser.add_argument('--save_images', action='store_true')
  parser.add_argument('--poll_secs', type=float, default=10.0)
  parser.add_argument('--platform', default=None, choices=[None, 'cpu', 'tpu'],
                      help='force a JAX platform (default: environment '
                           'default, i.e. the TPU when one is attached)')
  args = parser.parse_args()

  import jax
  if args.platform:
    jax.config.update('jax_platforms',
                      'cpu' if args.platform == 'cpu' else 'axon,cpu')
  import numpy as np
  from nerfds_tpu import config as config_lib
  from nerfds_tpu import datasets as datasets_lib
  from nerfds_tpu import viz
  from nerfds_tpu.evaluation import metrics as metrics_lib
  from nerfds_tpu.trainer import Trainer

  exp_dir = Path(args.exp_dir)
  model_cfg = config_lib.model_config_from_dict(
      json.loads((exp_dir / 'model_config.json').read_text()))
  train_cfg_raw = json.loads((exp_dir / 'train_config.json').read_text())
  train_cfg = config_lib.TrainConfig(**train_cfg_raw)

  exp_json = exp_dir / 'experiment.json'
  if exp_json.exists():
    saved = json.loads(exp_json.read_text())
    if args.data_dir:
      saved['data_dir'] = args.data_dir
    exp_cfg = config_lib.ExperimentConfig(**saved)
  else:
    exp_cfg = config_lib.ExperimentConfig(
        data_dir=args.data_dir, image_scale=args.image_scale,
        datasource_type=args.datasource)
  datasource = datasets_lib.from_config(exp_cfg)
  trainer = Trainer.from_experiment(model_cfg, train_cfg, datasource,
                                    exp_dir=None, use_mesh=True)
  from nerfds_tpu.training.checkpoints import CheckpointManager
  ckpt = CheckpointManager(exp_dir / 'checkpoints')

  try:
    lpips = metrics_lib.LpipsMetric()
  except Exception:
    lpips = None

  metrics_dir = exp_dir / 'metrics'
  metrics_dir.mkdir(exist_ok=True)
  evaluated = set()
  # Abstract restore template: shapes/dtypes only — avoids compiling and
  # running a full param init just to throw the values away (the daemon
  # always restores over it; orbax StandardRestore accepts
  # ShapeDtypeStructs).
  template = jax.eval_shape(trainer.init_state)

  while True:
    step = ckpt.latest_step()
    if step is None or step in evaluated:
      if args.eval_once:
        return
      time.sleep(args.poll_secs)
      continue
    state, _ = ckpt.restore(template, step)
    # Evaluate the annealing schedules at the CHECKPOINT step (like
    # trainer.eval_psnr) instead of the fully-annealed defaults: a
    # mid-training checkpoint must be rendered with the posenc windows it
    # was trained with (reference eval.py evaluates schedules per step too).
    from nerfds_tpu.models import default_extra_params
    from nerfds_tpu.training.step import build_schedules, eval_schedules
    scalars = eval_schedules(build_schedules(train_cfg), state.step)
    extra_params = dict(default_extra_params(model_cfg))
    for k in ('nerf_alpha', 'warp_alpha', 'hyper_alpha', 'hyper_sheet_alpha',
              'norm_input_alpha'):
      extra_params[k] = scalars[k]
    report = {}
    for split, ids, count in (
        ('val', datasource.val_ids, args.num_val_eval),
        ('train', datasource.train_ids, args.num_train_eval)):
      if not ids:
        continue
      stride = max(1, len(ids) // max(count, 1))
      subset = ids[::stride][:count]
      per_item = {}
      for item_id in subset:
        item = datasource.load_item(item_id)
        rays = {k: item[k] for k in ('origins', 'directions', 'mask')}
        rays['metadata'] = {k: v.reshape(-1, v.shape[-1])[:1]
                            for k, v in item['metadata'].items()}
        from nerfds_tpu.evaluation.render import render_image
        # keys restricted: every key costs a device->host fetch per chunk
        # (~31 ms RTT on the tunneled backend) — only what the metrics and
        # panels consume.
        out = render_image(trainer.model, state.params, rays,
                           jax.random.PRNGKey(0), extra_params,
                           chunk=args.chunk, mesh=trainer.mesh,
                           keys=('rgb', 'med_depth'))
        per_item[item_id] = metrics_lib.compute_all(
            out['rgb'], item['rgb'], lpips)
        if args.save_images:
          render_dir = exp_dir / 'renders' / str(step) / split
          render_dir.mkdir(parents=True, exist_ok=True)
          import PIL.Image
          panel = np.concatenate([
              item['rgb'], np.asarray(out['rgb']),
              viz.colorize_depth(np.asarray(out['med_depth']),
                                 datasource.near, datasource.far)], axis=1)
          PIL.Image.fromarray(
              (np.clip(panel, 0, 1) * 255).astype(np.uint8)
          ).save(render_dir / f'{item_id}.png')
      keys = next(iter(per_item.values())).keys()
      report[split] = {
          'mean': {k: float(np.mean([m[k] for m in per_item.values()]))
                   for k in keys},
          'per_item': per_item,
      }
    # Test-camera split (reference eval.py:440-477): render the
    # camera-paths/<trajectory> cameras with randomly sampled metadata
    # (reference sample_random_metadata, eval.py:186-211). No GT exists for
    # these novel trajectories, so the report records what was rendered and
    # panels are saved when --save_images.
    test_cameras = ([] if args.num_test_eval <= 0 else
                    datasource.load_test_cameras(count=args.num_test_eval))
    if test_cameras:
      from nerfds_tpu.datasets.core import camera_to_rays
      from nerfds_tpu.evaluation.render import render_image
      meta_rng = np.random.RandomState(step)
      embeds = datasource.embeddings_dict
      sampled_meta = {
          k: np.full((1, 1), meta_rng.choice(ids),
                     np.float32 if k == 'time' else np.int32)
          for k, ids in embeds.items() if ids}
      per_item = {}
      for cam_idx, camera in enumerate(test_cameras):
        item_id = f'{cam_idx:03d}'
        rays = camera_to_rays(camera)
        # Novel trajectories carry no foreground mask; render as
        # background (mask=0), the convention apply_warp uses for
        # free-space points.
        rays['mask'] = np.zeros(rays['origins'].shape[:-1] + (1,),
                                np.float32)
        rays['metadata'] = dict(sampled_meta)
        out = render_image(trainer.model, state.params, rays,
                           jax.random.PRNGKey(0), extra_params,
                           chunk=args.chunk, mesh=trainer.mesh,
                           keys=('rgb', 'med_depth'))
        rgb = np.asarray(out['rgb'])
        per_item[item_id] = {'finite': bool(np.isfinite(rgb).all()),
                             'mean_rgb': float(rgb.mean())}
        if args.save_images:
          render_dir = exp_dir / 'renders' / str(step) / 'test'
          render_dir.mkdir(parents=True, exist_ok=True)
          import PIL.Image
          panel = np.concatenate([
              rgb, viz.colorize_depth(np.asarray(out['med_depth']),
                                      datasource.near, datasource.far)],
              axis=1)
          PIL.Image.fromarray(
              (np.clip(panel, 0, 1) * 255).astype(np.uint8)
          ).save(render_dir / f'{item_id}.png')
      report['test'] = {
          'metadata': {k: int(v.flat[0]) for k, v in sampled_meta.items()},
          'per_item': per_item}
    (metrics_dir / f'{step}.json').write_text(json.dumps(report, indent=2))
    print(f'step {step}: ' + json.dumps(
        {s: report[s].get('mean', report[s].get('metadata'))
         for s in report}), flush=True)
    evaluated.add(step)
    if args.eval_once:
      return


if __name__ == '__main__':
  main()
