#!/usr/bin/env python3
"""Reference-anchored speed A/B on identical hardware (CPU).

The actual reference cannot run on the TPU toolchain (it needs jax 0.3 /
``flax.optim``), so the TPU numbers in ``bench.py`` are measured against a
*reconstruction* of its op pattern inside this framework. This script
anchors that reconstruction against the REAL THING: it imports the
reference's own Flax ``NerfModel`` (via ``tests/ref_loader.py`` — the same
loader the golden-parity suite uses, weights copied so both sides compute
the identical function) and times a full training-style
``jit(value_and_grad(loss))`` step of

  (a) the reference model, driven exactly as its train loop does
      (``/root/reference/hypernerf/models.py`` forward incl. the per-point
      vmap(vmap(value_and_grad)) σ-gradient, 4x warp re-evaluation,
      materialised concats), and
  (b) this framework on the same rays/params,

both jitted on the SAME CPU. Reported ratio = reference_step_ms / ours_ms.

Writes one JSON line; use ``--out`` to also write BENCH_ref_anchor.json.

Caveats (stated in the artifact): CPU relative speed is an imperfect proxy
for TPU relative speed — it has no MXU, different fusion heuristics, and
neither side's DMA behaviour exists — but both sides are the same math at
the same sizes with the same compiler, so it bounds the *execution pattern*
cost honestly, which is the quantity the TPU A/B reconstructs.
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent /
                       'tests'))


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--rays', type=int, default=64)
  p.add_argument('--coarse', type=int, default=32)
  p.add_argument('--fine', type=int, default=32)
  p.add_argument('--trunk_depth', type=int, default=8)
  p.add_argument('--trunk_width', type=int, default=256)
  p.add_argument('--iters', type=int, default=3)
  p.add_argument('--out', default='')
  args = p.parse_args()

  import jax
  jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  import numpy as np

  from ref_loader import load_reference
  import test_reference_full_model_parity as par

  ref = load_reference()

  # Full NeRF-DS flag set at (scaled) production architecture.
  arch = dict(
      par.ARCH,
      num_coarse_samples=args.coarse, num_fine_samples=args.fine,
      nerf_trunk_depth=args.trunk_depth, nerf_trunk_width=args.trunk_width,
      nerf_skips=(args.trunk_depth // 2,),
      nerf_rgb_branch_width=128,
      se3_trunk_depth=6, se3_trunk_width=128, se3_skips=(4,),
      hyper_sheet_depth=6, hyper_sheet_width=64, hyper_sheet_skips=(4,),
  )
  flags = par.CONFIGS['nerf_ds']
  old_arch = par.ARCH
  par.ARCH = arch
  try:
    ours_model = par.build_ours(flags)
    ref_model = par.build_ref(ref, flags)
  finally:
    par.ARCH = old_arch

  rays = par.make_rays(num_rays=args.rays)
  keys = jax.random.split(jax.random.PRNGKey(0), 4)
  variables = ref_model.init(
      {'params': keys[0], 'coarse': keys[1], 'fine': keys[2],
       'voxel': keys[3]}, rays, extra_params=par.EXTRA,
      use_sigma_gradient=False, use_predicted_norm=True)
  ref_params = variables['params']
  our_params = par.map_ref_params(ref_params, flags)

  target = jnp.zeros((args.rays, 3))

  def loss_from_out(out):
    total = 0.0
    for level in ('coarse', 'fine'):
      o = out[level]
      total = total + jnp.mean((o['rgb'] - target) ** 2)
      total = total + 0.1 * jnp.mean(
          (o['predicted_norm'] - o['target_norm']) ** 2)
      total = total + 0.1 * jnp.mean(o['predicted_mask'] ** 2)
    return total

  ref_step = jax.jit(jax.value_and_grad(
      lambda p: loss_from_out(par.run_ref(ref_model, p, rays, True))))
  our_step = jax.jit(jax.value_and_grad(
      lambda p: loss_from_out(par.run_ours(ours_model, p, rays))))

  def timeit(fn, params):
    l, g = fn(params)  # compile + check
    jax.block_until_ready(g)
    assert np.isfinite(float(l))
    times = []
    for _ in range(args.iters):
      t0 = time.perf_counter()
      l, g = fn(params)
      jax.block_until_ready(g)
      times.append(time.perf_counter() - t0)
    return min(times), float(l)

  ours_s, ours_l = timeit(our_step, our_params)
  ref_s, ref_l = timeit(ref_step, ref_params)
  rel = abs(ours_l - ref_l) / max(abs(ref_l), 1e-9)

  result = {
      'metric': 'ref_anchor_train_step_speedup_cpu',
      'value': round(ref_s / ours_s, 3),
      'unit': 'x (reference_step_time / ours, same CPU, same math)',
      'ours_ms': round(ours_s * 1e3, 1),
      'reference_ms': round(ref_s * 1e3, 1),
      'rays': args.rays, 'samples': [args.coarse, args.fine],
      'trunk': [args.trunk_depth, args.trunk_width],
      'loss_rel_diff': float(f'{rel:.2e}'),
      'baseline': 'the ACTUAL imported reference NerfModel '
                  '(hypernerf/models.py), weight-copied, jitted, same CPU',
  }
  print(json.dumps(result))
  if args.out:
    pathlib.Path(args.out).write_text(json.dumps(result, indent=2) + '\n')


if __name__ == '__main__':
  main()
