"""Data layer: synthetic scene, Nerfies directory round trip, ray store,
device sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu.datasets import (NerfiesDataSource, RayStore,
                                 SyntheticDataSource, sample_batch,
                                 write_nerfies_dataset)


@pytest.fixture(scope='module')
def synth():
  return SyntheticDataSource(num_frames=4, image_size=24, gt_samples=64)


def test_synthetic_scene_basics(synth):
  assert len(synth.train_ids) == 3 and len(synth.val_ids) == 1
  rgb = synth.load_rgb('0000')
  assert rgb.shape == (24, 24, 3)
  assert rgb.min() >= 0 and rgb.max() <= 1
  assert rgb.max() > 0.05  # something visible
  mask = synth.load_mask('0000')
  assert mask.shape == (24, 24, 1)
  assert set(np.unique(mask)) <= {0.0, 1.0}
  # The scene is dynamic: different frames differ.
  rgb2 = synth.load_rgb('0002')
  assert np.abs(rgb - rgb2).max() > 0.05
  pts = synth.load_points()
  assert pts.shape[1] == 3 and len(pts) > 100
  assert synth.embeddings_dict['warp'] == [0, 1, 2]


def test_build_ray_store(synth):
  store = synth.build_ray_store(synth.train_ids)
  n = 3 * 24 * 24
  assert store.num_rays == n
  assert store.origins.shape == (n, 3)
  assert store.rgb.shape == (n, 3)
  assert store.mask.shape == (n, 1)
  assert store.metadata['warp'].shape == (n, 1)
  assert set(np.unique(store.metadata['warp'])) == {0, 1, 2}
  # Direction normalised.
  np.testing.assert_allclose(np.linalg.norm(store.directions, axis=-1),
                             np.ones(n), rtol=1e-5)


def test_device_sample_batch(synth):
  store = synth.build_ray_store(synth.train_ids).device_put()
  batch = jax.jit(lambda k: sample_batch(store, k, 64))(
      jax.random.PRNGKey(0))
  assert batch['origins'].shape == (64, 3)
  assert batch['rgb'].shape == (64, 3)
  assert batch['metadata']['warp'].shape == (64, 1)
  # Different keys give different batches.
  batch2 = sample_batch(store, jax.random.PRNGKey(1), 64)
  assert np.abs(np.asarray(batch['rgb']) - np.asarray(batch2['rgb'])).max() > 0


def test_nerfies_directory_roundtrip(synth, tmp_path_factory):
  out_dir = tmp_path_factory.mktemp('scene')
  write_nerfies_dataset(synth, out_dir)
  ds = NerfiesDataSource(out_dir, image_scale=1)
  assert ds.train_ids == synth.train_ids
  assert ds.val_ids == synth.val_ids
  assert ds.near == pytest.approx(synth.near)
  assert ds.far == pytest.approx(synth.far)
  assert ds.get_warp_id('0001') == 1
  # Images round trip through 8-bit PNG.
  rgb_a = synth.load_rgb('0000')
  rgb_b = ds.load_rgb('0000')
  assert rgb_a.shape == rgb_b.shape
  assert np.abs(rgb_a - rgb_b).max() < 2.5 / 255
  # Masks are stored inverted and re-inverted at load.
  mask_a = synth.load_mask('0000')
  mask_b = ds.load_mask('0000')
  np.testing.assert_allclose(mask_a, mask_b, atol=1 / 255)
  # Camera positions recentred by scene center (zero here).
  cam_a = synth.load_camera('0000')
  cam_b = ds.load_camera('0000')
  np.testing.assert_allclose(cam_a.position, cam_b.position, atol=1e-5)
  # Ray stores agree.
  store_a = synth.build_ray_store(['0000'])
  store_b = ds.build_ray_store(['0000'])
  np.testing.assert_allclose(store_a.directions, store_b.directions,
                             atol=1e-5)
  pts = ds.load_points()
  assert pts is not None and pts.shape[1] == 3
  # Test-camera trajectory (camera-paths/orbit-mild) round trips.
  test_cams = ds.load_test_cameras()
  assert len(test_cams) == len(synth.val_ids)
  np.testing.assert_allclose(
      test_cams[0].position, synth.load_camera(synth.val_ids[0]).position,
      atol=1e-5)
  assert len(ds.load_test_cameras(count=1)) >= 1
  # Base sources without a trajectory dir report none.
  assert synth.load_test_cameras() == []


def test_host_iterator(synth):
  from nerfds_tpu.datasets import HostRayIterator
  store = synth.build_ray_store(synth.train_ids)
  it = HostRayIterator(store, batch_size=32, prefetch=2)
  batch = next(it)
  assert batch['origins'].shape == (32, 3)
  batch2 = next(it)
  assert np.abs(np.asarray(batch['origins'])
                - np.asarray(batch2['origins'])).max() > 0
  it.close()
