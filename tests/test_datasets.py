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


def test_gt_renderer_jax_backend_matches_numpy():
  """The jitted export renderer is the same math as the numpy
  characterisation path (synthetic.py _render_image backend='jax')."""
  from nerfds_tpu.datasets.synthetic import _render_image, make_vrig_camera
  cam = make_vrig_camera('left', 2, 8, image_size=32)
  for kwargs in ({'specular': True, 'white_background': True},
                 {'field_kind': 'shaded', 'light_mode': 'camera'}):
    a_rgb, a_m = _render_image(cam, 0.4, 0.5, 2.2, num_samples=48, **kwargs)
    b_rgb, b_m = _render_image(cam, 0.4, 0.5, 2.2, num_samples=48,
                               backend='jax', **kwargs)
    np.testing.assert_allclose(a_rgb, b_rgb, atol=1e-5)
    np.testing.assert_array_equal(a_m, b_m)


def test_vrig_camera_undistortion_roundtrip():
  """The exported vrig cameras have real distortion, and the Newton
  undistortion inverts it: project(position + t * pixels_to_rays(px)) ≈ px
  (reference camera.py:75-106 inside a capture, not just the lone
  fixture)."""
  from nerfds_tpu.datasets.synthetic import make_vrig_camera
  for side in ('left', 'right'):
    cam = make_vrig_camera(side, 7, 100, image_size=480)
    assert cam.has_radial_distortion and cam.has_tangential_distortion
    rng = np.random.RandomState(3)
    pixels = rng.uniform(10, 470, size=(256, 2)).astype(np.float32)
    dirs = cam.pixels_to_rays(pixels)
    points = cam.position[None] + np.linspace(0.6, 1.8, 256)[:, None] * dirs
    reproj = cam.project(points)
    np.testing.assert_allclose(reproj, pixels, atol=5e-2)
    # Distortion is doing real work: the undistorted pinhole mapping
    # disagrees by many pixels at the image edge.
    pinhole = cam.copy()
    pinhole.radial_distortion = np.zeros(3, np.float32)
    pinhole.tangential_distortion = np.zeros(2, np.float32)
    edge = np.array([[15.0, 15.0], [465.0, 20.0]], np.float32)
    d_true = cam.pixels_to_rays(edge)
    d_pin = pinhole.pixels_to_rays(edge)
    angle = np.degrees(np.arccos((d_true * d_pin).sum(-1).clip(-1, 1)))
    assert angle.min() > 0.2  # > a few pixels of bending at the edge


def test_vrig_dataset_roundtrip(tmp_path_factory):
  """Full vrig export: distorted rig cameras, raw world coordinates with a
  nonzero scene center/scale, loader recenters back; rays, masks, points
  and the novel camera path all round trip (VERDICT round-4 task 1)."""
  from nerfds_tpu.datasets.synthetic import (VrigSyntheticDataSource,
                                             write_nerfies_dataset)
  src = VrigSyntheticDataSource(num_frames=4, image_size=32, gt_samples=48,
                                gt_backend='jax')
  out_dir = tmp_path_factory.mktemp('vrig')
  write_nerfies_dataset(src, out_dir, scene_center=(0.3, -0.2, 1.1),
                        scene_scale=0.7, camera_path_frames=5)
  ds = NerfiesDataSource(out_dir, image_scale=1,
                         test_camera_trajectory='orbit-novel')
  assert ds.train_ids == [f'left_{i:04d}' for i in range(4)]
  assert ds.val_ids == [f'right_{i:04d}' for i in range(4)]
  assert ds.get_camera_id('right_0001') == 1
  assert ds.get_warp_id('right_0003') == 3
  # Loader undoes the raw-coordinate export: cameras, rays, points all
  # come back in scene coordinates.
  for item_id in ('left_0002', 'right_0000'):
    cam_a = src.load_camera(item_id)
    cam_b = ds.load_camera(item_id)
    np.testing.assert_allclose(cam_a.position, cam_b.position, atol=1e-5)
    np.testing.assert_allclose(cam_a.orientation, cam_b.orientation,
                               atol=1e-6)
    np.testing.assert_allclose(cam_a.radial_distortion,
                               cam_b.radial_distortion, atol=1e-7)
    item_a = src.load_item(item_id)
    item_b = ds.load_item(item_id)
    np.testing.assert_allclose(item_a['directions'], item_b['directions'],
                               atol=1e-5)
    np.testing.assert_allclose(item_a['origins'], item_b['origins'],
                               atol=1e-5)
    assert np.abs(item_a['rgb'] - item_b['rgb']).max() < 2.5 / 255
    np.testing.assert_allclose(item_a['mask'], item_b['mask'], atol=1 / 255)
    assert item_b['metadata']['warp'][0, 0, 0] == src.get_warp_id(item_id)
  pts_a = src.load_points()
  pts_b = ds.load_points()
  np.testing.assert_allclose(pts_a, pts_b, atol=1e-5)
  # The novel orbit trajectory loads through the test-camera API.
  cams = ds.load_test_cameras()
  assert len(cams) == 5
  assert cams[0].image_shape == (32, 32)


def test_generate_test_cameras_modes(tmp_path_factory):
  """scripts/generate_test_cameras.py: split mirrors the reference tool
  (utils/generate_test_vrig_camera.py), orbit/lerp synthesize loadable
  camera-paths trajectories aimed at the scene."""
  import importlib.util
  from pathlib import Path as P
  from nerfds_tpu.datasets.synthetic import (VrigSyntheticDataSource,
                                             write_nerfies_dataset)
  spec = importlib.util.spec_from_file_location(
      'gen_test_cams',
      P(__file__).resolve().parent.parent / 'scripts' /
      'generate_test_cameras.py')
  gen = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(gen)

  src = VrigSyntheticDataSource(num_frames=3, image_size=16, gt_samples=16,
                                gt_backend='jax')
  out_dir = tmp_path_factory.mktemp('vrig_gen')
  write_nerfies_dataset(src, out_dir, scene_center=(0.2, 0.1, -0.4),
                        scene_scale=0.8)
  gen.mode_split(out_dir)
  assert sorted(p.name for p in (out_dir / 'train_camera').glob('*.json')) \
      == [f'left_{i:04d}.json' for i in range(3)]
  assert len(list((out_dir / 'vrig_camera').glob('*.json'))) == 3

  gen.mode_orbit(out_dir, 'orbit-gen', frames=7, sweep_deg=50.0)
  gen.mode_lerp(out_dir, 'lerp-gen', frames=5)
  ds = NerfiesDataSource(out_dir, image_scale=1,
                         test_camera_trajectory='orbit-gen')
  cams = ds.load_test_cameras()
  assert len(cams) == 7
  # Every generated camera (scene coords after loader recentering) looks
  # at the subject: the origin-ish target projects inside the image.
  for cam in cams:
    px = cam.project(np.array([[0.0, 0.05, 0.0]], np.float32))[0]
    assert 0 <= px[0] <= 16 and 0 <= px[1] <= 16
  ds2 = NerfiesDataSource(out_dir, image_scale=1,
                          test_camera_trajectory='lerp-gen')
  assert len(ds2.load_test_cameras()) == 5
