#!/usr/bin/env python3
"""Training CLI (L7) — replaces the reference ``train.py``.

Configs are JSON files of {model: {...}, train: {...}, experiment: {...}}
overriding the named preset, plus ``--set key=value`` dotted overrides
(the gin-binding analog). Examples:

  python scripts/train.py --preset nerf_ds --data_dir /data/bell \
      --exp_dir /tmp/exp/bell --max_steps 250000
  python scripts/train.py --preset synthetic_smoke --exp_dir /tmp/exp/smoke
"""
import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_value(v: str):
  """Literal-parses an override value; containers become tuples.

  Accepts Python literals (``()``, ``(4,)``, ``None``) as well as JSON
  (``[4]``, ``null``, ``3.5``). Sequences are converted to tuples so the
  frozen configs stay hashable (they are closed over as jit statics)."""
  import ast

  def tuplify(x):
    if isinstance(x, (list, tuple)):
      return tuple(tuplify(e) for e in x)
    return x

  for parse in (ast.literal_eval, json.loads):
    try:
      return tuplify(parse(v))
    except (ValueError, SyntaxError):
      continue
  return v


def apply_overrides(cfg, overrides, prefix):
  updates = {}
  for k, val in overrides.items():
    section, _, field = k.partition('.')
    if section == prefix and field:
      updates[field] = val
  if updates:
    cfg = dataclasses.replace(cfg, **updates)
  return cfg


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--preset', default='nerf_ds',
                      choices=['nerf_ds', 'nerf_ds_fast', 'hypernerf',
                               'vanilla', 'synthetic_smoke'])
  parser.add_argument('--data_dir', default='')
  parser.add_argument('--exp_dir', required=True)
  parser.add_argument('--image_scale', type=int, default=1)
  parser.add_argument('--datasource', default=None,
                      choices=[None, 'nerfies', 'interp', 'synthetic'])
  parser.add_argument('--max_steps', type=int, default=None)
  parser.add_argument('--batch_size', type=int, default=None)
  parser.add_argument('--config_json', default=None,
                      help='JSON file with {model:..., train:...} overrides')
  parser.add_argument('--set', action='append', default=[],
                      metavar='model.field=value',
                      help='dotted overrides, e.g. model.num_fine_samples=64')
  parser.add_argument('--scale_schedules', action='store_true',
                      help='compress the 250k-step annealing horizons to '
                           '--max_steps (same trajectory, shorter run); '
                           'default keeps the gin constants (parity)')
  parser.add_argument('--no_mesh', action='store_true')
  parser.add_argument('--sampling', default='auto',
                      choices=['auto', 'fused', 'host'],
                      help="'fused': on-device in-jit minibatch gather; "
                           "'host': background-thread numpy sampler "
                           "(robust fallback / stores larger than HBM)")
  parser.add_argument('--platform', default=None, choices=[None, 'cpu', 'tpu'],
                      help='force a JAX platform (default: environment '
                           'default, i.e. the TPU when one is attached)')
  args = parser.parse_args()

  import jax
  if args.platform:
    jax.config.update('jax_platforms',
                      'cpu' if args.platform == 'cpu' else 'axon,cpu')
  from nerfds_tpu import config as config_lib
  from nerfds_tpu import datasets as datasets_lib
  from nerfds_tpu.trainer import Trainer

  steps = args.max_steps or 250000
  base_train_cfg = config_lib.nerf_ds_train_config(
      max_steps=steps, scale_schedules=args.scale_schedules)
  if args.preset == 'nerf_ds':
    model_cfg = config_lib.nerf_ds()
    train_cfg = base_train_cfg
    datasource_type = 'nerfies'
  elif args.preset == 'nerf_ds_fast':
    model_cfg = config_lib.nerf_ds_fast()
    train_cfg = base_train_cfg
    datasource_type = 'nerfies'
  elif args.preset == 'hypernerf':
    model_cfg = config_lib.hypernerf()
    train_cfg = base_train_cfg
    datasource_type = 'nerfies'
  elif args.preset == 'vanilla':
    model_cfg = config_lib.vanilla_nerf()
    train_cfg = config_lib.TrainConfig()
    datasource_type = 'nerfies'
  else:  # synthetic_smoke: tiny fast run on the procedural scene
    model_cfg = dataclasses.replace(
        config_lib.nerf_ds(), num_coarse_samples=16, num_fine_samples=16,
        nerf_trunk_depth=4, nerf_trunk_width=64, se3_trunk_depth=3,
        se3_trunk_width=32, hyper_sheet_depth=2, hyper_sheet_width=16,
        mask_mlp_depth=2, mask_mlp_width=32, nerf_skips=(), se3_skips=(),
        hyper_sheet_skips=(), mask_skips=())
    train_cfg = dataclasses.replace(
        config_lib.nerf_ds_train_config(max_steps=1000, batch_size=512),
        lr_schedule=('exponential', 5e-3, 5e-4, 1000),
        warp_alpha_schedule=('linear', 0, 4, 200),
        sharp_mask_std_schedule=('constant', 0.3),
        norm_input_alpha_schedule=('constant', 4.0),
        x_for_rgb_alpha_schedule=('constant', 4.0))
    datasource_type = 'synthetic'

  overrides = dict(kv.split('=', 1) for kv in args.set)
  overrides = {k: parse_value(v) for k, v in overrides.items()}
  if args.config_json:
    file_cfg = json.loads(Path(args.config_json).read_text())
    model_cfg = dataclasses.replace(model_cfg, **file_cfg.get('model', {}))
    train_cfg = dataclasses.replace(train_cfg, **file_cfg.get('train', {}))
  model_cfg = apply_overrides(model_cfg, overrides, 'model')
  train_cfg = apply_overrides(train_cfg, overrides, 'train')
  if args.max_steps:
    train_cfg = dataclasses.replace(train_cfg, max_steps=args.max_steps)
  if args.batch_size:
    train_cfg = dataclasses.replace(train_cfg, batch_size=args.batch_size)

  exp_cfg = config_lib.ExperimentConfig(
      data_dir=args.data_dir, image_scale=args.image_scale,
      datasource_type=args.datasource or datasource_type)
  datasource = datasets_lib.from_config(exp_cfg)
  Path(args.exp_dir).mkdir(parents=True, exist_ok=True)
  (Path(args.exp_dir) / 'experiment.json').write_text(
      config_lib.to_json(exp_cfg))

  print(f'devices: {jax.devices()}')
  trainer = Trainer.from_experiment(model_cfg, train_cfg, datasource,
                                    exp_dir=args.exp_dir,
                                    use_mesh=not args.no_mesh,
                                    sampling=args.sampling)

  def log_fn(step, data):
    stats = data['stats']
    level = 'fine' if 'fine' in stats else 'coarse'
    t = data['time']
    print(f"step {step} loss={float(stats[level]['loss/total']):.5f} "
          f"psnr={float(stats[level]['metric/psnr']):.2f} "
          f"steps/s={t.get('steps_per_sec', 0):.2f}", flush=True)

  state = trainer.train(log_fn=log_fn)
  # Final-eval subset (up to 10 strided val frames): full-split metrics are
  # scripts/eval.py's job; rendering every val frame of a 100-frame capture
  # here would stall the CLI for minutes after training ends.
  val_ids = datasource.val_ids or datasource.train_ids[:1]
  stride = max(1, len(val_ids) // 10)
  metrics = trainer.eval_psnr(state, item_ids=val_ids[::stride][:10])
  print('final val metrics:', json.dumps(metrics))
  (Path(args.exp_dir) / 'final_metrics.json').write_text(json.dumps(metrics))


if __name__ == '__main__':
  main()
