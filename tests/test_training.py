"""Training: the compiled step runs, the loss decreases on the synthetic
scene, checkpoints round-trip, and the mesh-sharded step matches."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu import config as config_lib
from nerfds_tpu.datasets import SyntheticDataSource
from nerfds_tpu.models import NerfDSModel
from nerfds_tpu.trainer import Trainer
from nerfds_tpu.training import (TrainState, make_fused_train_step,
                                 make_train_step)


def tiny_model_cfg(**overrides):
  kwargs = dict(
      num_coarse_samples=8, num_fine_samples=8, nerf_trunk_depth=3,
      nerf_trunk_width=48, se3_trunk_depth=2, se3_trunk_width=16,
      hyper_sheet_depth=2, hyper_sheet_width=16, mask_mlp_depth=2,
      mask_mlp_width=16, nerf_skips=(), se3_skips=(), hyper_sheet_skips=(),
      mask_skips=())
  kwargs.update(overrides)
  return dataclasses.replace(config_lib.nerf_ds(), **kwargs)


def tiny_train_cfg(**overrides):
  base = config_lib.nerf_ds_train_config(max_steps=200, batch_size=128)
  kwargs = dict(
      warp_alpha_schedule=('linear', 0, 4, 50),
      sharp_mask_std_schedule=('constant', 0.5),
      x_for_rgb_alpha_schedule=('constant', 4.0),
      norm_input_alpha_schedule=('constant', 4.0),
      lr_schedule=('exponential', 5e-3, 1e-4, 200),
      print_every=50, save_every=1000)
  kwargs.update(overrides)
  return dataclasses.replace(base, **kwargs)


@pytest.fixture(scope='module')
def trainer():
  source = SyntheticDataSource(num_frames=4, image_size=24, gt_samples=64)
  return Trainer.from_experiment(tiny_model_cfg(), tiny_train_cfg(), source,
                                 use_mesh=False)


def test_loss_decreases_full_nerf_ds(trainer):
  store = trainer.build_store()
  state = trainer.init_state()
  step_fn = make_fused_train_step(trainer.model, trainer.train_cfg, store)
  key = jax.random.PRNGKey(0)
  losses = []
  for step in range(60):
    state, stats = step_fn(state, jax.random.fold_in(key, step))
    losses.append(float(stats['fine']['loss/rgb']))
  early = np.mean(losses[:10])
  late = np.mean(losses[-10:])
  assert late < early * 0.9, (early, late)
  assert int(state.step) == 60
  assert np.isfinite(losses).all()


def test_vanilla_trains_on_static_scene():
  source = SyntheticDataSource(num_frames=4, image_size=24, static=True,
                               gt_samples=64)
  model_cfg = dataclasses.replace(
      config_lib.vanilla_nerf(num_coarse_samples=16, num_fine_samples=0),
      nerf_trunk_depth=3, nerf_trunk_width=64, nerf_skips=())
  train_cfg = dataclasses.replace(
      config_lib.TrainConfig(batch_size=256, max_steps=300),
      lr_schedule=('exponential', 5e-3, 5e-4, 300),
      nerf_alpha_schedule=('constant', 8))
  trainer = Trainer.from_experiment(model_cfg, train_cfg, source,
                                    use_mesh=False)
  store = trainer.build_store()
  state = trainer.init_state()
  step_fn = make_fused_train_step(trainer.model, train_cfg, store)
  key = jax.random.PRNGKey(1)
  first_psnr = None
  for step in range(150):
    state, stats = step_fn(state, jax.random.fold_in(key, step))
    if first_psnr is None:
      first_psnr = float(stats['coarse']['metric/psnr'])
  last_psnr = float(stats['coarse']['metric/psnr'])
  assert last_psnr > first_psnr + 3.0, (first_psnr, last_psnr)


def test_background_and_elastic_losses_run(trainer):
  source = trainer.datasource
  train_cfg = dataclasses.replace(
      tiny_train_cfg(), use_background_loss=True,
      background_loss_weight=1.0, use_elastic_loss=True,
      use_hyper_reg_loss=True, hyper_reg_loss_weight=0.001,
      background_points_batch_size=256)
  t = Trainer.from_experiment(tiny_model_cfg(), train_cfg, source,
                              use_mesh=False)
  store = t.build_store()
  state = t.init_state()
  pts = jnp.asarray(source.load_points())
  step_fn = make_fused_train_step(t.model, train_cfg, store,
                                  background_points=pts)
  state, stats = step_fn(state, jax.random.PRNGKey(0))
  assert 'loss/background' in stats
  assert 'loss/elastic' in stats['coarse']
  assert 'loss/hyper_reg' in stats['coarse']
  assert np.isfinite(float(stats['coarse']['loss/total']))


@pytest.mark.slow
def test_observability_stats_and_histograms(trainer, tmp_path):
  """Percentile canaries (reference training.py:374-391) + histogram
  exports (train.py:100-127): stats carry 'percentile/*' scalars and
  'hist/*' subsampled arrays; a Trainer run writes TB histograms and keeps
  the JSONL scalar-only."""
  store = trainer.build_store()
  state = trainer.init_state()
  step_fn = make_fused_train_step(trainer.model, trainer.train_cfg, store)
  state, stats = step_fn(state, jax.random.PRNGKey(0))
  # nerf_ds config uses the 3D mask branch.
  assert 'percentile/3d_mask_50' in stats['fine']
  assert 'stats/weights_sum' in stats['fine']
  assert 'hist/spatial_points' in stats
  assert 'hist/spatial_points_delta' in stats
  assert 'hist/hyper_points' in stats
  assert stats['hist/spatial_points'].shape[-1] == 3
  assert 1 <= stats['hist/spatial_points'].shape[0] <= 2048
  # Disabled flags remove the extra outputs.
  off_cfg = dataclasses.replace(trainer.train_cfg, log_percentiles=False,
                                log_histograms=False)
  step_off = make_fused_train_step(trainer.model, off_cfg, store)
  _, stats_off = step_off(trainer.init_state(), jax.random.PRNGKey(0))
  assert 'percentile/3d_mask_50' not in stats_off['fine']
  assert not any(k.startswith('hist/') for k in stats_off)

  # End-to-end: Trainer routes hists to the writer; JSONL stays scalar.
  t = Trainer.from_experiment(trainer.model.config, trainer.train_cfg,
                              trainer.datasource, exp_dir=tmp_path,
                              use_mesh=False)
  t.train(num_steps=trainer.train_cfg.print_every)
  import json as json_lib
  lines = [json_lib.loads(l) for l in
           (tmp_path / 'summaries' / 'metrics.jsonl').read_text().splitlines()]
  assert lines, 'no JSONL metrics written'
  assert any(k.startswith('train/fine/percentile/alpha'.replace('alpha', ''))
             or 'percentile' in k for rec in lines for k in rec)
  assert all(isinstance(v, (int, float, str)) for rec in lines
             for v in rec.values())


def test_unfused_step_with_explicit_batch(trainer):
  from nerfds_tpu.datasets import sample_batch
  store = trainer.build_store()
  state = trainer.init_state()
  step_fn = make_train_step(trainer.model, trainer.train_cfg, donate=False)
  batch = sample_batch(store, jax.random.PRNGKey(3),
                       trainer.train_cfg.batch_size)
  state2, stats = step_fn(state, batch, jax.random.PRNGKey(4))
  assert int(state2.step) == 1
  assert np.isfinite(float(stats['fine']['loss/total']))


def test_checkpoint_roundtrip(tmp_path, trainer):
  from nerfds_tpu.training.checkpoints import CheckpointManager
  state = trainer.init_state()
  mgr = CheckpointManager(tmp_path / 'ckpt', keep=2)
  state_n = jax.device_get(state)
  mgr.save(5, state_n)
  mgr.save(7, state_n)
  assert mgr.latest_step() == 7
  template = trainer.init_state()
  restored, step = mgr.restore(jax.device_get(template))
  assert step == 7
  for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                  jax.tree_util.tree_leaves(state_n.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
  mgr.close()


def test_accum_steps_matches_monolithic_batch():
  """Gradient accumulation (train.accum_steps) is exact: with
  deterministic sampling the accumulated update equals the monolithic
  full-batch update (every loss term is a per-ray/per-point mean, so
  averaging microbatch gradients reproduces the full-batch gradient)."""
  import dataclasses
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.models import NerfDSModel
  from nerfds_tpu.training.step import TrainState, make_train_step

  cfg = dataclasses.replace(
      config_lib.nerf_ds(), num_coarse_samples=6, num_fine_samples=4,
      nerf_trunk_depth=2, nerf_trunk_width=32, se3_trunk_depth=2,
      se3_trunk_width=16, hyper_sheet_depth=2, hyper_sheet_width=16,
      mask_mlp_depth=2, mask_mlp_width=16, nerf_skips=(), se3_skips=(),
      hyper_sheet_skips=(), mask_skips=(),
      use_stratified_sampling=False)  # deterministic z: rng-independent
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4,
                      near=0.2, far=2.0)
  params = model.init(jax.random.PRNGKey(0))
  train_cfg = config_lib.nerf_ds_train_config(max_steps=10, batch_size=16)

  rng = np.random.RandomState(0)
  n = 16
  directions = rng.randn(n, 3).astype(np.float32)
  directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
  batch = {
      'origins': jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.1),
      'directions': jnp.asarray(directions),
      'rgb': jnp.asarray(rng.rand(n, 3).astype(np.float32)),
      'mask': jnp.asarray(rng.rand(n, 1).astype(np.float32)),
      'metadata': {'warp': jnp.asarray(rng.randint(0, 4, (n, 1)),
                                       jnp.int32)},
  }
  key = jax.random.PRNGKey(3)
  state = TrainState.create(params)

  step_mono = make_train_step(model, train_cfg, donate=False)
  state_mono, stats_mono = step_mono(state, batch, key)
  cfg_accum = dataclasses.replace(train_cfg, accum_steps=4)
  step_acc = make_train_step(model, cfg_accum, donate=False)
  state_acc, stats_acc = step_acc(state, batch, key)

  from jax import flatten_util
  a, _ = flatten_util.ravel_pytree(state_mono.params)
  b, _ = flatten_util.ravel_pytree(state_acc.params)
  np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                             rtol=2e-4, atol=1e-6)
  level = 'fine'
  np.testing.assert_allclose(float(stats_acc[level]['loss/total']),
                             float(stats_mono[level]['loss/total']),
                             rtol=1e-5)
  # Non-divisible batch fails loudly.
  bad_cfg = dataclasses.replace(train_cfg, accum_steps=3)
  with pytest.raises(ValueError, match='not divisible'):
    make_train_step(model, bad_cfg, donate=False)(state, batch, key)
