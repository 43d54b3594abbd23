"""Coverage for the auxiliary components: interp datasource, image utils,
viz, logging, distributed helpers, fast-render path."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu.datasets import (InterpDataSource, SyntheticDataSource,
                                 write_nerfies_dataset)


@pytest.fixture(scope='module')
def scene_dir(tmp_path_factory):
  source = SyntheticDataSource(num_frames=8, image_size=16, gt_samples=32)
  out = tmp_path_factory.mktemp('interp_scene')
  write_nerfies_dataset(source, out)
  return out


def test_interp_datasource_split(scene_dir):
  ds = InterpDataSource(scene_dir, interval=4, image_scale=1)
  assert ds.train_ids == ['0000', '0004']
  # Every non-train id below the last full interval validates.
  assert '0001' in ds.val_ids and '0002' in ds.val_ids
  assert ds.get_warp_id('0004') == 1  # train-position indexing
  meta = ds.get_val_metadata('0002')
  np.testing.assert_allclose(meta['warp'][0], [0.0, 1.0, 0.5])
  # Val item metadata is the interpolation triple.
  item_meta = ds.get_item_metadata('0001')
  assert item_meta['warp'].shape == (3,)
  np.testing.assert_allclose(item_meta['warp'], [0.0, 1.0, 0.25])


def test_image_utils_roundtrips(tmp_path):
  from nerfds_tpu import image_utils as iu
  rng = np.random.RandomState(0)
  img = rng.rand(24, 32, 3).astype(np.float32)
  assert iu.image_to_float32(iu.image_to_uint8(img)).max() <= 1.0
  np.testing.assert_allclose(iu.image_to_float32(iu.image_to_uint16(img)),
                             img, atol=1 / 65535 + 1e-5)
  # Integer-safe down/up.
  down = iu.downsample_image(img, 2)
  assert down.shape == (12, 16, 3)
  up = iu.upsample_image(down, 2)
  assert up.shape == (24, 32, 3)
  assert iu.rescale_image(img, 0.5).shape == (12, 16, 3)
  assert iu.rescale_image(img, 2.0).shape == (48, 64, 3)
  # Depth png roundtrip (mm precision).
  depth = rng.rand(16, 16).astype(np.float32) * 5
  iu.save_depth(tmp_path / 'd.png', depth)
  loaded = iu.load_depth(tmp_path / 'd.png')
  np.testing.assert_allclose(loaded, depth, atol=1e-3)
  # Image save/load.
  iu.save_image(tmp_path / 'i.png', img)
  loaded = iu.image_to_float32(iu.load_image(tmp_path / 'i.png'))
  np.testing.assert_allclose(loaded, img, atol=2 / 255)
  grid = iu.tile_images([img, img, img], cols=2)
  assert grid.shape == (48, 64, 3)


def test_viz():
  from nerfds_tpu import viz
  x = np.linspace(0, 1, 64).reshape(8, 8)
  rgb = viz.turbo(x)
  assert rgb.shape == (8, 8, 3)
  assert rgb.min() >= 0 and rgb.max() <= 1
  # Turbo is blue-dominant in the low range, red-dominant in the high range.
  low = viz.turbo(np.asarray(0.25))
  high = viz.turbo(np.asarray(0.9))
  assert low[2] > low[0]
  assert high[0] > high[2]
  depth_img = viz.colorize_depth(np.ones((4, 4)), 0.5, 2.0)
  assert depth_img.shape == (4, 4, 3)
  normals = viz.normals_to_rgb(np.full((4, 4, 3), -1.0))
  np.testing.assert_allclose(normals, np.zeros((4, 4, 3)))
  grid = viz.image_grid([np.zeros((4, 4, 3))] * 5, cols=3)
  assert grid.shape == (8, 12, 3)


def test_metric_writer(tmp_path):
  from nerfds_tpu.training.logging import MetricWriter
  w = MetricWriter(tmp_path, use_tensorboard=False)
  w.write_scalars(10, {'train': {'loss': jnp.asarray(0.5),
                                 'nested': {'psnr': 21.0}}})
  w.write_scalars(20, {'train': {'loss': jnp.asarray(0.25)}})
  w.close()
  lines = [json.loads(l) for l in
           (tmp_path / 'metrics.jsonl').read_text().splitlines()]
  assert lines[0]['step'] == 10
  assert lines[0]['train/loss'] == 0.5
  assert lines[0]['train/nested/psnr'] == 21.0
  assert lines[1]['train/loss'] == 0.25


def test_distributed_helpers_single_host():
  from nerfds_tpu.parallel import distributed
  distributed.initialize()  # no-op single host
  assert distributed.is_main_process()
  start, stop = distributed.local_shard_slice(100)
  assert (start, stop) == (0, 100)


def test_fast_render_skips_sigma_gradient():
  import dataclasses
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.models import NerfDSModel, default_extra_params
  from tests.test_model import make_rays, small
  cfg = small(config_lib.nerf_ds)
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)
  params = model.init(jax.random.PRNGKey(0))
  rays = make_rays()
  extra = default_extra_params(cfg)
  out = model.render(params, rays, jax.random.PRNGKey(1), extra,
                     compute_sigma_gradient=False)
  assert 'target_norm' not in out['fine']
  assert 'predicted_norm' in out['fine']
  assert 'back_facing' in out['fine']
  # rgb identical with/without the gradient (it only feeds the target).
  out_full = model.render(params, rays, jax.random.PRNGKey(1), extra)
  np.testing.assert_allclose(np.asarray(out['fine']['rgb']),
                             np.asarray(out_full['fine']['rgb']),
                             atol=1e-6)


def test_gpath_storage_transparent():
  """GPath (reference gpath.py analog, SURVEY row 29): pathlib-compatible,
  epath-backed when available so gs:// URIs resolve to remote backends."""
  import pathlib
  from nerfds_tpu.gpath import GPath, is_remote
  p = GPath('/tmp') / 'x.json'
  assert isinstance(p, pathlib.PurePath)
  assert str(p) == '/tmp/x.json'
  assert not is_remote(p)
  try:
    from etils import epath
  except ImportError:
    return
  g = GPath('gs://bucket/scene')
  assert is_remote(g)
  assert str(g / 'dataset.json').endswith('bucket/scene/dataset.json')
  # The data-layer loaders route through GPath, so a remote data_dir
  # reaches the gcsfs backend rather than open()/np.fromfile.


def test_normal_fidelity_metric_mechanics():
  """normal_fidelity (weight-argmax association) on an UNTRAINED tiny
  model: selects pixels, returns finite shapes, and the surface-filter
  variant restricts the reported set. Fast-path cover for the metric the
  slow specular gate exercises at scale."""
  import dataclasses
  import jax
  import numpy as np
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.datasets.synthetic import SyntheticDataSource, _sphere_center
  from nerfds_tpu.evaluation.normals import (normal_fidelity,
                                             sphere_analytic_normal,
                                             sphere_surface_filter)
  from nerfds_tpu.models import NerfDSModel, default_extra_params
  src = SyntheticDataSource(num_frames=4, image_size=16, gt_samples=48,
                            specular=True)
  cfg = dataclasses.replace(
      config_lib.nerf_ds(), num_coarse_samples=6, num_fine_samples=4,
      nerf_trunk_depth=2, nerf_trunk_width=32, se3_trunk_depth=2,
      se3_trunk_width=16, hyper_sheet_depth=2, hyper_sheet_width=16,
      mask_mlp_depth=2, mask_mlp_width=16, nerf_skips=(), se3_skips=(),
      hyper_sheet_skips=(), mask_skips=())
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4,
                      near=src.near, far=src.far)
  params = model.init(jax.random.PRNGKey(0))
  extra = default_extra_params(cfg)
  fid = normal_fidelity(
      model, params, src, extra,
      sphere_analytic_normal(_sphere_center),
      item_ids=src.train_ids[:1], chunk=128,
      min_weight=0.0,  # untrained: accept any argmax so selection is full
      surface_filter=sphere_surface_filter(_sphere_center))
  assert set(fid) == {'cosine', 'num_pixels', 'frac_selected',
                      'surface_cosine', 'surface_pixels'}
  assert fid['num_pixels'] > 0
  assert fid['frac_selected'] > 0.9  # min_weight=0 selects all fg pixels
  assert fid['surface_pixels'] <= fid['num_pixels']
  assert -1.0 <= fid['cosine'] <= 1.0
