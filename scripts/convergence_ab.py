#!/usr/bin/env python3
"""Multi-step convergence A/B vs the ACTUAL imported reference model.

The golden-parity suite (tests/test_reference_full_model_parity.py) proves
one-step output/gradient parity; this script proves the stronger claim that
the two implementations have the SAME TRAINING DYNAMICS: starting from
identical (copied) weights and fed identical deterministic batches through
an identical loss and optimizer, the loss/PSNR trajectories of

  (a) the imported reference NerfModel
      (/root/reference/hypernerf/models.py via tests/ref_loader.py), and
  (b) this framework's NerfDSModel

track each other step for step over hundreds of Adam updates on CPU.

Both sides use the full NeRF-DS flag set (predicted+warped norm supervision
incl. the second-order σ-gradient path, 3D mask + sharp weights, x-in-rgb
condition) at the parity-test architecture, the same
losses (this framework's compute_loss_and_stats applied to each side's own
model_out — key-compatible by construction) and the same optax Adam. Any
systematic drift between the curves would expose a gradient-path
discrepancy that single-step parity cannot see (e.g. a wrong stop_gradient
that only matters after the params move).

Reference for what "training" means here: hypernerf/training.py:198-511
(train_step), train.py:394-463 (loop).

Writes artifacts/convergence_ab.json + a trajectory CSV.
"""
import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tests'))


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--steps', type=int, default=400)
  p.add_argument('--batch', type=int, default=96)
  p.add_argument('--lr', type=float, default=1e-3)
  p.add_argument('--seed', type=int, default=0)
  p.add_argument('--out', default=str(REPO / 'artifacts'))
  p.add_argument('--psnr_tol', type=float, default=0.5,
                 help='max allowed |PSNR gap| (dB) on the smoothed tail')
  args = p.parse_args()

  import jax
  jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  import numpy as np
  import optax

  import test_reference_full_model_parity as par
  from ref_loader import load_reference
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.datasets.synthetic import SyntheticDataSource
  from nerfds_tpu.training import losses as losses_lib

  ref = load_reference()
  flags = par.CONFIGS['nerf_ds']
  ours_model = par.build_ours(flags)
  ref_model = par.build_ref(ref, flags)

  # Identical initial weights: init the reference, copy into our tree.
  init_rays = par.make_rays()
  keys = jax.random.split(jax.random.PRNGKey(args.seed), 4)
  variables = ref_model.init(
      {'params': keys[0], 'coarse': keys[1], 'fine': keys[2],
       'voxel': keys[3]}, init_rays, extra_params=par.EXTRA,
      use_sigma_gradient=False, use_predicted_norm=True)
  ref_params = variables['params']
  our_params = par.map_ref_params(ref_params, flags)

  # Deterministic data: the synthetic dynamic scene's train rays (frames ->
  # warp ids < NUM_EMBEDS), fixed numpy permutation per step.
  source = SyntheticDataSource(num_frames=par.NUM_EMBEDS, image_size=24,
                               gt_samples=96)
  store_items = [source.load_item(i) for i in source.train_ids]
  def cat(key):
    return np.concatenate(
        [it[key].reshape(-1, it[key].shape[-1]) for it in store_items])
  all_origins = cat('origins')
  all_dirs = cat('directions')
  all_rgb = cat('rgb')
  all_mask = cat('mask')
  all_warp = np.concatenate(
      [np.broadcast_to(it['metadata']['warp'].reshape(-1, 1),
                       (it['rgb'].reshape(-1, 3).shape[0], 1))
       for it in store_items]).astype(np.uint32)
  n_rays = all_origins.shape[0]

  # Both models were built with near=0.2/far=2.0 (the parity fixture);
  # rebuild both with the scene's near/far so geometry is in range.
  ours_model = type(ours_model)(
      config=ours_model.config, num_warp_embeds=par.NUM_EMBEDS,
      num_hyper_embeds=par.NUM_EMBEDS, num_nerf_embeds=par.NUM_EMBEDS,
      near=source.near, far=source.far)
  ref_model = ref_model.clone(near=source.near, far=source.far)

  train_cfg = config_lib.nerf_ds_train_config(max_steps=args.steps,
                                              batch_size=args.batch)
  model_cfg = ours_model.config
  scalars = {
      'elastic_loss_weight': jnp.asarray(0.0),
      'norm_loss_weight': jnp.asarray(par.EXTRA['norm_loss_weight']),
  }

  def common_loss(out, batch):
    """This framework's loss applied to either side's model_out (the dicts
    are key-compatible — that is what the parity suite asserts)."""
    total = 0.0
    for level in ('fine', 'coarse'):
      lvl_loss, _ = losses_lib.compute_loss_and_stats(
          model_cfg, train_cfg, out[level], batch, scalars)
      total = total + lvl_loss
    return total

  def ref_loss(params, batch):
    out = par.run_ref(ref_model, params, batch, True)
    return common_loss(out, batch)

  def our_loss(params, batch):
    out = par.run_ours(ours_model, params, batch)
    return common_loss(out, batch)

  tx = optax.adam(args.lr)
  ref_opt = tx.init(ref_params)
  our_opt = tx.init(our_params)

  @jax.jit
  def ref_step(params, opt, batch):
    loss, grads = jax.value_and_grad(ref_loss)(params, batch)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, loss

  @jax.jit
  def our_step(params, opt, batch):
    loss, grads = jax.value_and_grad(our_loss)(params, batch)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, loss

  rng = np.random.RandomState(args.seed + 1)
  traj = []
  for step in range(args.steps):
    idx = rng.randint(0, n_rays, args.batch)
    batch = {
        'origins': jnp.asarray(all_origins[idx]),
        'directions': jnp.asarray(all_dirs[idx]),
        'rgb': jnp.asarray(all_rgb[idx]),
        'mask': jnp.asarray(all_mask[idx]),
        'metadata': {
            'warp': jnp.asarray(all_warp[idx]),
            'appearance': jnp.asarray(all_warp[idx]),
            'camera': jnp.zeros((args.batch, 1), jnp.uint32),
            'time': jnp.zeros((args.batch, 1), jnp.float32),
        },
    }
    ref_params, ref_opt, rl = ref_step(ref_params, ref_opt, batch)
    our_params, our_opt, ol = our_step(our_params, our_opt, batch)
    if step % 10 == 0 or step == args.steps - 1:
      rl, ol = float(rl), float(ol)
      traj.append({'step': step, 'ref_loss': rl, 'our_loss': ol})
      print(f'step {step}: ref {rl:.5f} ours {ol:.5f} '
            f'gap {abs(rl - ol):.2e}', flush=True)

  # Held-out evaluation: full-frame PSNR on one train view per side.
  item = store_items[0]
  h, w = item['rgb'].shape[:2]
  eval_batch = {
      'origins': jnp.asarray(item['origins'].reshape(-1, 3)),
      'directions': jnp.asarray(item['directions'].reshape(-1, 3)),
      'mask': jnp.asarray(item['mask'].reshape(-1, 1)),
      'metadata': {
          'warp': jnp.asarray(
              np.broadcast_to(item['metadata']['warp'].reshape(-1, 1),
                              (h * w, 1)).astype(np.uint32)),
          'appearance': jnp.asarray(
              np.broadcast_to(item['metadata']['warp'].reshape(-1, 1),
                              (h * w, 1)).astype(np.uint32)),
          'camera': jnp.zeros((h * w, 1), jnp.uint32),
          'time': jnp.zeros((h * w, 1), jnp.float32),
      },
  }
  gt = item['rgb'].reshape(-1, 3)

  def psnr(pred):
    mse = float(np.mean((np.asarray(pred) - gt) ** 2))
    return -10.0 * np.log10(mse)

  ref_rgb = par.run_ref(ref_model, ref_params, eval_batch, True)['fine']['rgb']
  our_rgb = par.run_ours(ours_model, our_params, eval_batch)['fine']['rgb']
  ref_psnr, our_psnr = psnr(ref_rgb), psnr(our_rgb)

  # Trajectory agreement: relative loss gap on the tail (loss scales vary
  # over training, so relative is the meaningful metric).
  tail = traj[len(traj) // 2:]
  rel_gaps = [abs(t['ref_loss'] - t['our_loss'])
              / max(abs(t['ref_loss']), 1e-9) for t in tail]
  result = {
      'metric': 'convergence_ab_psnr_gap_db',
      'value': round(abs(ref_psnr - our_psnr), 4),
      'unit': 'dB |reference - ours| after identical training',
      'steps': args.steps, 'batch': args.batch, 'lr': args.lr,
      'ref_final_psnr': round(ref_psnr, 3),
      'our_final_psnr': round(our_psnr, 3),
      'tail_max_rel_loss_gap': float(f'{max(rel_gaps):.3e}'),
      'tail_mean_rel_loss_gap': float(f'{np.mean(rel_gaps):.3e}'),
      'pass': bool(abs(ref_psnr - our_psnr) <= args.psnr_tol),
      'baseline': 'ACTUAL imported reference NerfModel, identical init '
                  'weights / batches / loss / Adam, CPU',
  }
  print(json.dumps(result))
  out_dir = pathlib.Path(args.out)
  out_dir.mkdir(exist_ok=True)
  (out_dir / 'convergence_ab.json').write_text(
      json.dumps(result, indent=2) + '\n')
  csv = 'step,ref_loss,our_loss\n' + '\n'.join(
      f"{t['step']},{t['ref_loss']:.6f},{t['our_loss']:.6f}" for t in traj)
  (out_dir / 'convergence_ab_trajectory.csv').write_text(csv + '\n')
  if not result['pass']:
    sys.exit(1)


if __name__ == '__main__':
  main()
