#!/usr/bin/env python3
"""Export a procedural capture in the full Nerfies/NeRF-DS directory layout.

Two scene kinds:
  vrig      — the realistic operating point (VERDICT round-4 task 1): a
              two-camera rig at >=480px with real radial/tangential
              distortion, raw world coordinates + nonzero scene
              center/scale, ~100 frames, masks, points.npy and a novel
              camera-paths trajectory. Train ids are the left camera,
              val ids the right (the reference's vrig protocol).
  mechanism — the paper-mechanism normals scene (task 4): non-emissive
              Blinn-Phong surface lit by a camera-anchored light, so the
              specular highlight moves AGAINST the object motion — the
              condition NeRF-DS claims corrupts mask-free deformation
              estimation (reference README.md:1-12).

GT frames are ray-marched by the jitted export renderer (same math as the
numpy characterisation path; tests/test_datasets.py pins the equivalence).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--out_dir', required=True)
  p.add_argument('--kind', default='vrig', choices=['vrig', 'mechanism'])
  p.add_argument('--frames', type=int, default=100)
  p.add_argument('--image_size', type=int, default=480)
  p.add_argument('--gt_samples', type=int, default=192)
  p.add_argument('--specular_exponent', type=float, default=25.0)
  p.add_argument('--camera_path_frames', type=int, default=60)
  p.add_argument('--platform', default=None, choices=[None, 'cpu', 'tpu'])
  args = p.parse_args()

  import jax
  if args.platform:
    jax.config.update('jax_platforms',
                      'cpu' if args.platform == 'cpu' else 'axon,cpu')
  from nerfds_tpu.datasets.synthetic import (VrigSyntheticDataSource,
                                             write_nerfies_dataset)

  if args.kind == 'vrig':
    src = VrigSyntheticDataSource(
        num_frames=args.frames, image_size=args.image_size,
        gt_samples=args.gt_samples, specular=True, white_background=True,
        specular_exponent=args.specular_exponent, gt_backend='jax')
  else:
    src = VrigSyntheticDataSource(
        num_frames=args.frames, image_size=args.image_size,
        gt_samples=args.gt_samples, white_background=True,
        field_kind='shaded', light_mode='camera',
        specular_exponent=args.specular_exponent, gt_backend='jax')

  t0 = time.time()
  out = write_nerfies_dataset(
      src, args.out_dir,
      scene_center=(0.12, -0.08, 0.25), scene_scale=0.85,
      camera_path_frames=args.camera_path_frames, progress=True)
  n = len(src.train_ids) + len(src.val_ids)
  print(f'exported {n} frames ({args.kind}, {args.image_size}px) to {out} '
        f'in {time.time() - t0:.1f}s', flush=True)


if __name__ == '__main__':
  main()
