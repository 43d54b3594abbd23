"""Nerfies/HyperNeRF/NeRF-DS dataset directory loader (L2).

Directory layout parity with reference ``hypernerf/datasets/nerfies.py``:

  data_dir/
    rgb/{scale}x/{item_id}.png
    camera/{item_id}.json
    resized_mask/{scale}x/{item_id}.png.png   (NeRF-DS; doubled extension)
    camera-paths/{trajectory}/*.json          (test cameras)
    points.npy                                (background points)
    scene.json    {center, scale, near, far}
    dataset.json  {train_ids, val_ids}
    metadata.json {item_id: {warp_id, appearance_id, camera_id[, time_id]}}

Masks are inverted at load so the moving part is 1 (nerfies.py:152-157).
Cameras are recentered/rescaled by the scene center/scale (core.py load_camera)
and downscaled by ``image_scale``.
"""
from __future__ import annotations

import json
from pathlib import Path, PurePath

from nerfds_tpu.gpath import GPath
from typing import List, Optional, Tuple

import numpy as np

from nerfds_tpu.camera import Camera
from nerfds_tpu.datasets.core import DataSource


def load_scene_info(data_dir) -> Tuple[np.ndarray, float, float, float]:
  with (GPath(data_dir) / 'scene.json').open('r') as f:
    scene_json = json.load(f)
  return (np.array(scene_json['center']), scene_json['scale'],
          scene_json['near'], scene_json['far'])


def _load_image(path) -> np.ndarray:
  import cv2
  # read_bytes (not np.fromfile) so GCS-backed GPaths work transparently.
  raw = np.frombuffer(GPath(path).read_bytes(), dtype=np.uint8)
  image = cv2.imdecode(raw, cv2.IMREAD_COLOR)[:, :, ::-1]  # BGR -> RGB
  return np.ascontiguousarray(image).astype(np.float32) / 255.0


def _load_grayscale_image(path) -> np.ndarray:
  import cv2
  raw = np.frombuffer(GPath(path).read_bytes(), dtype=np.uint8)
  image = cv2.imdecode(raw, cv2.IMREAD_GRAYSCALE)
  return np.asarray(image).astype(np.float32) / 255.0


def load_camera(camera_path, scale_factor: float = 1.0,
                scene_center=None, scene_scale=None) -> Camera:
  """Load + rescale a camera like reference datasets/core.py load_camera."""
  camera = Camera.from_json(camera_path)
  if scale_factor != 1.0:
    camera = camera.scale(scale_factor)
  if scene_center is not None:
    camera.position = camera.position - scene_center
  if scene_scale is not None:
    camera.position = camera.position * scene_scale
  return camera


class NerfiesDataSource(DataSource):
  """Casual volumetric capture directories (Nerfies/HyperNeRF/NeRF-DS)."""

  def __init__(self, data_dir: str, image_scale: int = 1,
               test_camera_trajectory: str = 'orbit-mild', **kwargs):
    self.data_dir = GPath(data_dir)
    with (self.data_dir / 'dataset.json').open('r') as f:
      dataset_json = json.load(f)
    train_ids = [str(i) for i in dataset_json['train_ids']]
    val_ids = [str(i) for i in dataset_json['val_ids']]
    super().__init__(train_ids=train_ids, val_ids=val_ids, **kwargs)
    self.scene_center, self.scene_scale, self._near, self._far = (
        load_scene_info(self.data_dir))
    self.image_scale = image_scale
    self.test_camera_trajectory = test_camera_trajectory
    self.rgb_dir = self.data_dir / 'rgb' / f'{image_scale}x'
    self.mask_dir = self.data_dir / 'resized_mask' / f'{image_scale}x'
    self.camera_dir = self.data_dir / 'camera'
    metadata_path = self.data_dir / 'metadata.json'
    self.metadata_dict = {}
    if metadata_path.exists():
      with metadata_path.open('r') as f:
        self.metadata_dict = json.load(f)

  @property
  def near(self) -> float:
    return self._near

  @property
  def far(self) -> float:
    return self._far

  @property
  def has_masks(self) -> bool:
    return self.mask_dir.exists()

  def load_rgb(self, item_id: str) -> np.ndarray:
    return _load_image(self.rgb_dir / f'{item_id}.png')

  def load_mask(self, item_id: str) -> Optional[np.ndarray]:
    # NeRF-DS convention: doubled '.png.png' extension, inverted polarity
    # (moving part = 1).
    path = self.mask_dir / f'{item_id}.png.png'
    if not path.exists():
      return None
    mask = _load_grayscale_image(path)[:, :, np.newaxis]
    return 1.0 - mask

  def load_camera(self, item_id, scale_factor: float = 1.0) -> Camera:
    if isinstance(item_id, PurePath):
      camera_path = item_id
    else:
      camera_path = self.camera_dir / f'{item_id}.json'
    return load_camera(camera_path,
                       scale_factor=scale_factor / self.image_scale,
                       scene_center=self.scene_center,
                       scene_scale=self.scene_scale)

  def load_test_cameras(self, count: Optional[int] = None) -> List[Camera]:
    camera_dir = (self.data_dir / 'camera-paths'
                  / self.test_camera_trajectory)
    if not camera_dir.exists():
      return []
    camera_paths = sorted(camera_dir.glob('*.json'))
    if count is not None:
      stride = max(1, len(camera_paths) // count)
      camera_paths = camera_paths[::stride]
    return [self.load_camera(p) for p in camera_paths]

  def load_points(self, shuffle: bool = False) -> Optional[np.ndarray]:
    points_path = self.data_dir / 'points.npy'
    if not points_path.exists():
      return None
    import io
    points = np.load(io.BytesIO(points_path.read_bytes()))
    points = ((points - self.scene_center) * self.scene_scale
              ).astype(np.float32)
    if shuffle:
      points = points[self.rng.permutation(len(points))]
    return points

  def get_appearance_id(self, item_id) -> int:
    return self.metadata_dict[item_id]['appearance_id']

  def get_camera_id(self, item_id) -> int:
    return self.metadata_dict[item_id]['camera_id']

  def get_warp_id(self, item_id) -> int:
    return self.metadata_dict[item_id]['warp_id']

  def get_time_id(self, item_id) -> int:
    if 'time_id' in self.metadata_dict[item_id]:
      return self.metadata_dict[item_id]['time_id']
    return self.metadata_dict[item_id]['warp_id']
