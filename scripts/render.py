#!/usr/bin/env python3
"""Video rendering CLI (L7) — replaces the reference ``render.py`` +
``render_pipeline.py``.

Loads a trained experiment, renders a camera path (the dataset's
``camera-paths/<trajectory>`` or the vrig test cameras) per frame with the
frame's warp id, and writes raw .npy outputs + an mp4 (rgb + debug grid of
depth / normals / Δx / predicted mask).
"""
import argparse
import dataclasses
import json
import sys
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
  parser.add_argument('--interval', type=int, default=1,
                      help='render every Nth frame')
  parser.add_argument('--camera_path', default='vrig_camera',
                      help='subdir of data_dir with per-frame cameras, or '
                           '"train"/"val" to reuse the dataset split '
                           'cameras (val = the vrig right-camera protocol; '
                           'frames are written under frames/<item_id>.png '
                           'for metrics_pipeline.py GT matching)')
  parser.add_argument('--out', default=None)
  parser.add_argument('--save_raw', action='store_true')
  parser.add_argument('--fps', type=int, default=15)
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
  from nerfds_tpu.camera import Camera, camera_to_rays
  from nerfds_tpu.evaluation.render import render_image
  from nerfds_tpu.models import default_extra_params
  from nerfds_tpu.trainer import Trainer
  from nerfds_tpu.training.checkpoints import CheckpointManager

  exp_dir = Path(args.exp_dir)
  model_cfg = config_lib.model_config_from_dict(
      json.loads((exp_dir / 'model_config.json').read_text()))
  train_cfg = config_lib.TrainConfig(
      **json.loads((exp_dir / 'train_config.json').read_text()))
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
  ckpt = CheckpointManager(exp_dir / 'checkpoints')
  state, step = ckpt.restore(jax.device_get(trainer.init_state()))
  print(f'restored checkpoint at step {step}')

  # Camera path: per-frame json cameras (vrig) or the train cameras.
  frames = []
  debug_frames = []
  if args.camera_path in ('train', 'val'):
    ids = (datasource.train_ids if args.camera_path == 'train'
           else datasource.val_ids)[::args.interval]
    frame_names = list(ids)
    cameras = [datasource.load_camera(i) for i in ids]
    warp_ids = [datasource.get_warp_id(i) for i in ids]
    masks = [datasource.load_mask(i) for i in ids]
  else:
    cam_dir = Path(args.data_dir) / args.camera_path
    cam_paths = sorted(cam_dir.glob('*.json'))[::args.interval]
    cameras = [datasource.load_camera(p) for p in cam_paths]
    warp_ids = list(range(len(cameras)))
    masks = [None] * len(cameras)
    frame_names = [f'{i:05d}' for i in range(len(cameras))]

  # Evaluate annealing schedules at the checkpoint step (same rule as
  # scripts/eval.py): a mid-training checkpoint renders with the posenc
  # windows it was trained with; at max_steps this equals the fully
  # annealed defaults.
  from nerfds_tpu.training.step import build_schedules, eval_schedules
  scalars = eval_schedules(build_schedules(train_cfg), state.step)
  extra = dict(default_extra_params(model_cfg))
  for k in ('nerf_alpha', 'warp_alpha', 'hyper_alpha', 'hyper_sheet_alpha',
            'norm_input_alpha'):
    extra[k] = scalars[k]
  out_dir = Path(args.out) if args.out else exp_dir / f'renders_{step}'
  out_dir.mkdir(parents=True, exist_ok=True)

  for i, (camera, warp_id, mask) in enumerate(zip(cameras, warp_ids, masks)):
    rays = camera_to_rays(camera)
    rays = {'origins': rays['origins'], 'directions': rays['directions']}
    rays['metadata'] = {'warp': np.asarray([[warp_id]], np.int32)}
    if mask is not None:
      rays['mask'] = mask
    out = render_image(trainer.model, state.params, rays,
                       jax.random.PRNGKey(0), extra, chunk=args.chunk,
                       mesh=trainer.mesh)
    if args.save_raw:
      np.save(out_dir / f'raw_{i:05d}.npy', out, allow_pickle=True)
    # Per-frame prediction PNG named like the dataset frame, so
    # metrics_pipeline.py can match it to rgb/<scale>x ground truth
    # (the reference's calculate_quantitative_results.py flow).
    import PIL.Image
    frames_dir = out_dir / 'frames'
    frames_dir.mkdir(exist_ok=True)
    PIL.Image.fromarray(
        (np.clip(np.asarray(out['rgb']), 0, 1) * 255).astype(np.uint8)
    ).save(frames_dir / f'{frame_names[i]}.png')
    pred_mask = np.asarray(out.get(
        'ray_predicted_mask', np.zeros((*out['rgb'].shape[:2], 1))))
    debug = viz.image_grid([
        np.asarray(out['rgb']),
        viz.colorize_depth(np.asarray(out['med_depth']),
                           datasource.near, datasource.far),
        viz.normals_to_rgb(np.asarray(out['ray_norm'])),
        viz.colorize(np.linalg.norm(np.asarray(out['ray_delta_x']), axis=-1)),
        np.repeat(np.clip(pred_mask, 0, 1), 3, -1),
        np.repeat(np.clip(np.asarray(out['acc']), 0, 1)[..., None], 3, -1),
    ], cols=3)
    frames.append(np.asarray(out['rgb']))
    debug_frames.append(debug)
    if i == 0:
      import PIL.Image
      PIL.Image.fromarray(
          (np.clip(debug, 0, 1) * 255).astype(np.uint8)
      ).save(out_dir / 'debug_frame0.png')
    print(f'rendered frame {i + 1}/{len(cameras)}', flush=True)

  viz.save_video(out_dir / 'rgb.mp4', frames, fps=args.fps)
  # Full debug-grid video (rgb | depth | normals / Δx | mask | acc), the
  # analog of the reference's 2x3 mp4 (/root/reference/render.py:198-277).
  viz.save_video(out_dir / 'debug.mp4', debug_frames, fps=args.fps)
  print(f'wrote {out_dir}/rgb.mp4 + debug.mp4 ({len(frames)} frames)')


if __name__ == '__main__':
  main()
