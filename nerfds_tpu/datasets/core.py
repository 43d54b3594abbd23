"""Data layer core (L2): ray stores and device-side batch sampling.

TPU-first redesign of the reference pipeline (``hypernerf/datasets/core.py``).
The reference preloads every frame, flattens all rays to host arrays, shuffles
once, and streams batches through ``tf.data`` with host→device prefetch
(:458-530, :179-208). Here:

* :class:`RayStore` is the same flattened column layout (origins, directions,
  rgb, mask, metadata ids) as plain arrays;
* the store is ``device_put`` into HBM (sharded over the mesh's data axis
  when one is given) and batches are gathered **on device inside the train
  step jit** by `sample_batch` — a fused random-index gather. There is no
  per-step host work, no tf.data, no host→device copy in steady state;
* for stores too large for HBM a threaded host sampler with double-buffered
  ``device_put`` is provided (:class:`HostRayIterator`).

Reference behaviours preserved: masks are inverted at load (moving part = 1,
``nerfies.py:152-157``); metadata is broadcast per pixel; ray directions come
from the full distortion-aware camera model.
"""
from __future__ import annotations

import abc
import concurrent.futures
import dataclasses
import queue as queue_lib
import threading
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nerfds_tpu.camera import Camera, camera_to_rays


@dataclasses.dataclass
class RayStore:
  """Flattened ray columns. Arrays are [N, C] numpy or jax arrays."""
  origins: Any
  directions: Any
  rgb: Any
  mask: Any                       # [N, 1]; zeros if the source has no masks
  metadata: Dict[str, Any]        # each [N, 1] (int32) or [N, 3] (interp)

  @property
  def num_rays(self) -> int:
    return self.origins.shape[0]

  @property
  def nbytes(self) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(self.as_dict()):
      total += leaf.size * leaf.dtype.itemsize
    return total

  def as_dict(self) -> Dict[str, Any]:
    return {
        'origins': self.origins,
        'directions': self.directions,
        'rgb': self.rgb,
        'mask': self.mask,
        'metadata': self.metadata,
    }

  @classmethod
  def from_dict(cls, d: Dict[str, Any]) -> 'RayStore':
    return cls(origins=d['origins'], directions=d['directions'],
               rgb=d['rgb'], mask=d['mask'], metadata=d['metadata'])

  def device_put(self, sharding=None) -> 'RayStore':
    """Moves the store to device HBM (optionally sharded over rays).

    With a sharding the arrays are assembled through
    ``jax.make_array_from_process_local_data``: single-process, the full
    columns are the local data (identical placement to ``jax.device_put``,
    but the same code path the multi-host case uses); multi-process, this
    store must hold only THIS process's rows
    (``DataSource.build_ray_store(process_local=True)``) and the global
    array is assembled without any host ever materialising the full ray
    set — the reference's per-process data responsibility
    (``train.py:191-201``) upgraded to actually-sharded storage. Rows are
    trimmed to the largest per-device count every process can supply
    (uniform random sampling makes dropped remainder rays harmless).
    """
    if sharding is None:
      return RayStore.from_dict(
          jax.tree_util.tree_map(jnp.asarray, self.as_dict()))
    if jax.process_count() == 1:
      put = lambda x: jax.make_array_from_process_local_data(
          sharding, np.asarray(x))
      return RayStore.from_dict(
          jax.tree_util.tree_map(put, self.as_dict()))
    from jax.experimental import multihost_utils
    n_dev_total = sharding.mesh.devices.size
    n_dev_local = jax.local_device_count()
    local_rows = self.num_rays
    all_rows = multihost_utils.process_allgather(
        jnp.asarray([local_rows // max(n_dev_local, 1)], jnp.int32))
    per_dev = int(np.min(np.asarray(all_rows)))
    if per_dev == 0:
      raise ValueError(
          f'process {jax.process_index()} holds {local_rows} rays for '
          f'{n_dev_local} local devices; every process needs >= 1 row per '
          'local device')
    local_use = per_dev * n_dev_local
    global_rows = per_dev * n_dev_total

    def put(x):
      x = np.asarray(x)[:local_use]
      return jax.make_array_from_process_local_data(
          sharding, x, (global_rows, *x.shape[1:]))

    return RayStore.from_dict(jax.tree_util.tree_map(put, self.as_dict()))

  def take(self, idx) -> 'RayStore':
    return RayStore.from_dict(
        jax.tree_util.tree_map(lambda x: x[idx], self.as_dict()))


def sample_batch(store: RayStore, key, batch_size: int) -> Dict[str, Any]:
  """Uniform random ray batch, gathered on device. jit-compatible.

  The reference's epoch-permutation + tf.data iterator reduces to i.i.d.
  uniform sampling at these scales (hundreds of millions of rays, batch 512)
  and a uniform gather keeps the whole step device-side.
  """
  idx = jax.random.randint(key, (batch_size,), 0, store.num_rays)
  batch = jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0),
                                 store.as_dict())
  batch['metadata'] = dict(batch['metadata'])
  return batch


class HostRayIterator:
  """Host-side fallback sampler with background prefetch.

  For stores that exceed device memory: a worker thread gathers numpy batches
  (uniform indices) and ``device_put``s them ahead of consumption.
  """

  def __init__(self, store: RayStore, batch_size: int, seed: int = 0,
               prefetch: int = 3, sharding=None):
    self._store = store
    self._batch_size = batch_size
    self._rng = np.random.RandomState(seed)
    self._queue: queue_lib.Queue = queue_lib.Queue(maxsize=prefetch)
    self._sharding = sharding
    self._stop = threading.Event()
    self._thread = threading.Thread(target=self._worker, daemon=True)
    self._thread.start()

  def _worker(self):
    while not self._stop.is_set():
      idx = self._rng.randint(0, self._store.num_rays, self._batch_size)
      batch = jax.tree_util.tree_map(lambda x: x[idx],
                                     self._store.as_dict())
      batch = jax.device_put(batch, self._sharding)
      while not self._stop.is_set():
        try:
          self._queue.put(batch, timeout=0.5)
          break
        except queue_lib.Full:
          continue

  def __iter__(self):
    return self

  def __next__(self):
    return self._queue.get()

  def close(self):
    self._stop.set()
    # Drain so a worker blocked on a full queue observes the stop flag, then
    # join it so no background thread outlives the iterator.
    while self._thread.is_alive():
      try:
        while True:
          self._queue.get_nowait()
      except queue_lib.Empty:
        pass
      self._thread.join(timeout=0.5)


class DataSource(abc.ABC):
  """Abstract data source (reference datasets/core.py:240-707).

  Concrete sources implement per-item loading; this base builds ray stores
  and camera bundles from them.
  """

  def __init__(self, train_ids: Sequence[str], val_ids: Sequence[str],
               use_appearance_id: bool = False, use_camera_id: bool = False,
               use_warp_id: bool = True, use_time: bool = False,
               random_seed: int = 0, **_):
    self.train_ids = list(train_ids)
    self.val_ids = list(val_ids)
    self.use_appearance_id = use_appearance_id
    self.use_camera_id = use_camera_id
    self.use_warp_id = use_warp_id
    self.use_time = use_time
    self.rng = np.random.RandomState(random_seed)

  @property
  def all_ids(self) -> List[str]:
    return sorted(self.train_ids + self.val_ids)

  # -- per-item API ---------------------------------------------------------

  @abc.abstractmethod
  def load_rgb(self, item_id: str) -> np.ndarray:
    ...

  @abc.abstractmethod
  def load_camera(self, item_id: str) -> Camera:
    ...

  def load_mask(self, item_id: str) -> Optional[np.ndarray]:
    return None

  @property
  @abc.abstractmethod
  def near(self) -> float:
    ...

  @property
  @abc.abstractmethod
  def far(self) -> float:
    ...

  def get_appearance_id(self, item_id) -> int:
    raise NotImplementedError

  def get_camera_id(self, item_id) -> int:
    raise NotImplementedError

  def get_warp_id(self, item_id) -> int:
    raise NotImplementedError

  def get_time_id(self, item_id) -> int:
    raise NotImplementedError

  def load_points(self, shuffle: bool = False) -> Optional[np.ndarray]:
    """Background (static) 3D points for the background loss, if any."""
    return None

  def load_test_cameras(self, count: Optional[int] = None) -> List[Camera]:
    """Novel-trajectory test cameras (reference core.py:380-381); sources
    without a camera-paths directory have none."""
    return []

  @property
  def embeddings_dict(self) -> Dict[str, List[int]]:
    """Metadata-key -> list of ids over TRAIN items (reference core.py:352)."""
    out = {}
    if self.use_warp_id:
      out['warp'] = [self.get_warp_id(i) for i in self.train_ids]
    if self.use_appearance_id:
      out['appearance'] = [self.get_appearance_id(i) for i in self.train_ids]
    if self.use_camera_id:
      out['camera'] = [self.get_camera_id(i) for i in self.train_ids]
    if self.use_time:
      out['time'] = [self.get_time_id(i) for i in self.train_ids]
    return out

  def get_item_metadata(self, item_id: str) -> Dict[str, np.ndarray]:
    meta = {}
    if self.use_warp_id:
      meta['warp'] = np.asarray([self.get_warp_id(item_id)], np.int32)
    if self.use_appearance_id:
      meta['appearance'] = np.asarray([self.get_appearance_id(item_id)],
                                      np.int32)
    if self.use_camera_id:
      meta['camera'] = np.asarray([self.get_camera_id(item_id)], np.int32)
    if self.use_time:
      meta['time'] = np.asarray([self.get_time_id(item_id)], np.float32)
    return meta

  # -- bulk building --------------------------------------------------------

  def load_item(self, item_id: str) -> Dict[str, Any]:
    """One frame: image + rays + mask + metadata, image-shaped [H, W, ·]."""
    rgb = self.load_rgb(item_id)
    camera = self.load_camera(item_id)
    rays = camera_to_rays(camera)
    mask = self.load_mask(item_id)
    if mask is None:
      mask = np.zeros((*rgb.shape[:2], 1), np.float32)
    meta = self.get_item_metadata(item_id)
    h, w = rgb.shape[:2]
    metadata = {k: np.broadcast_to(v, (h, w, v.shape[-1]))
                for k, v in meta.items()}
    return {
        'origins': rays['origins'],
        'directions': rays['directions'],
        'rgb': rgb[..., :3].astype(np.float32),
        'mask': mask.astype(np.float32),
        'metadata': metadata,
    }

  def build_ray_store(self, item_ids: Sequence[str],
                      max_threads: Optional[int] = None,
                      process_local: bool = False) -> RayStore:
    """Loads all items in parallel and flattens to ray columns.

    ``process_local=True`` under multi-process JAX: this process loads only
    a contiguous chunk of ``item_ids`` (its share); pair with
    ``RayStore.device_put(sharding)``, which assembles the global
    device-sharded array from the per-process chunks. The global ray ORDER
    then depends on the process count, which is irrelevant here: batches
    are uniform random gathers (`sample_batch`), not sequential scans.
    Single-process it is a no-op.
    """
    if process_local and jax.process_count() > 1:
      from nerfds_tpu.parallel.distributed import local_shard_slice
      start, stop = local_shard_slice(len(item_ids))
      item_ids = item_ids[start:stop]
    with concurrent.futures.ThreadPoolExecutor(max_threads) as ex:
      items = list(ex.map(self.load_item, item_ids))

    def flatten(key, sub=None):
      arrs = [(it[key] if sub is None else it[key][sub]) for it in items]
      return np.concatenate(
          [a.reshape(-1, a.shape[-1]) for a in arrs], axis=0)

    metadata = {k: flatten('metadata', k) for k in items[0]['metadata']}
    return RayStore(
        origins=flatten('origins'),
        directions=flatten('directions'),
        rgb=flatten('rgb'),
        mask=flatten('mask'),
        metadata=metadata,
    )

  def camera_rays_for_item(self, item_id: str) -> Dict[str, Any]:
    """Full-image ray dict for rendering one held-out view."""
    item = self.load_item(item_id)
    return item
