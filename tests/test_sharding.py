"""Distribution layer: the training step and renderer over an 8-device CPU
mesh — shardings propagate, results match the single-device path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu import config as config_lib
from nerfds_tpu.datasets import SyntheticDataSource, sample_batch
from nerfds_tpu.parallel import (batch_sharding, create_mesh,
                                 replicated_sharding, shard_batch)
from nerfds_tpu.trainer import Trainer
from nerfds_tpu.training import make_train_step
from tests.test_training import tiny_model_cfg, tiny_train_cfg


@pytest.fixture(scope='module')
def mesh():
  assert len(jax.devices()) == 8, 'conftest must force 8 CPU devices'
  return create_mesh()


@pytest.fixture(scope='module')
def trainer():
  source = SyntheticDataSource(num_frames=4, image_size=24, gt_samples=64)
  return Trainer.from_experiment(tiny_model_cfg(), tiny_train_cfg(), source,
                                 use_mesh=False)


def test_mesh_shape(mesh):
  assert mesh.devices.size == 8
  assert mesh.axis_names == ('data',)


@pytest.mark.slow
def test_sharded_step_matches_single_device(trainer, mesh):
  store = trainer.build_store()
  state = trainer.init_state()
  step_fn = make_train_step(trainer.model, trainer.train_cfg, donate=False)
  batch = jax.device_get(
      sample_batch(store, jax.random.PRNGKey(3), 128))
  key = jax.random.PRNGKey(4)

  # Single device.
  state_a, stats_a = step_fn(state, jax.device_put(batch), key)

  # Mesh: replicated state, ray-sharded batch.
  state_sharded = jax.device_put(state, replicated_sharding(mesh))
  batch_sharded = shard_batch(jax.tree_util.tree_map(jnp.asarray, batch),
                              mesh)
  state_b, stats_b = step_fn(state_sharded, batch_sharded, key)

  np.testing.assert_allclose(float(stats_a['fine']['loss/total']),
                             float(stats_b['fine']['loss/total']),
                             rtol=1e-4)
  # Updated parameters agree across the data-parallel reduction.
  for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                  jax.tree_util.tree_leaves(state_b.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-6)


def test_sharded_batch_layout(trainer, mesh):
  store = trainer.build_store()
  batch = jax.device_get(sample_batch(store, jax.random.PRNGKey(0), 64))
  sharded = shard_batch(jax.tree_util.tree_map(jnp.asarray, batch), mesh)
  sh = sharded['origins'].sharding
  assert sh.is_equivalent_to(batch_sharding(mesh), 2)
  # 8 shards of 8 rays each.
  assert len(sharded['origins'].addressable_shards) == 8
  assert sharded['origins'].addressable_shards[0].data.shape == (8, 3)


def test_fused_step_on_mesh(mesh):
  """Device-resident store sharded over rays + fused gather step."""
  source = SyntheticDataSource(num_frames=4, image_size=24, gt_samples=64)
  trainer = Trainer.from_experiment(tiny_model_cfg(), tiny_train_cfg(),
                                    source, use_mesh=True)
  assert trainer.mesh is not None
  store = trainer.build_store()
  assert len(store.origins.addressable_shards) == 8
  state = trainer.init_state()
  from nerfds_tpu.training import make_fused_train_step
  step_fn = make_fused_train_step(trainer.model, trainer.train_cfg, store)
  state, stats = step_fn(state, jax.random.PRNGKey(0))
  assert np.isfinite(float(stats['fine']['loss/total']))
  state, stats = step_fn(state, jax.random.PRNGKey(1))
  assert int(jax.device_get(state.step)) == 2


def test_sharded_render(mesh, trainer):
  from nerfds_tpu.evaluation.render import render_image
  from nerfds_tpu.models import default_extra_params
  state = trainer.init_state()
  item = trainer.datasource.load_item(trainer.datasource.val_ids[0])
  rays = {k: item[k] for k in ('origins', 'directions', 'mask')}
  rays['metadata'] = {k: v.reshape(-1, v.shape[-1])[:1]
                      for k, v in item['metadata'].items()}
  extra = default_extra_params(trainer.model.config)
  out = render_image(trainer.model, state.params, rays,
                     jax.random.PRNGKey(0), extra, chunk=256, mesh=mesh)
  assert out['rgb'].shape == (24, 24, 3)
  assert np.all(np.isfinite(out['rgb']))
