"""Procedural dynamic test scene (L2).

The reference has no self-contained test data (only a lone camera JSON);
training smoke tests require a real capture. This module generates one
analytically: a deforming emissive sphere orbiting inside a static shell,
ground-truth rendered by ray-marching the analytic density/color field with
the same compositing math the model uses. It provides

  * :class:`SyntheticDataSource` — an in-memory DataSource (no disk I/O),
  * :func:`write_nerfies_dataset` — dumps the scene in the Nerfies directory
    layout (rgb/{s}x, camera/*.json, resized_mask, scene.json, dataset.json,
    metadata.json, points.npy), which doubles as a loader round-trip fixture.

This is the backing scene for BASELINE config[0] (static mode), the training
convergence tests, and the benchmark harness.
"""
from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from nerfds_tpu.camera import Camera, camera_to_rays
from nerfds_tpu.datasets.core import DataSource


def _sphere_center(t: float) -> np.ndarray:
  """Moving sphere center; t in [0, 1]."""
  angle = 2.0 * np.pi * t
  return np.array([0.25 * np.cos(angle), 0.25 * np.sin(angle), 0.0],
                  np.float32)


# Fixed directional light for the specular scene (unit vector).
_LIGHT_DIR = np.array([0.577, -0.577, -0.577], np.float32)


def field(points: np.ndarray, t: float, static: bool = False,
          viewdirs: Optional[np.ndarray] = None, specular: bool = False,
          specular_exponent: float = 25.0, xp=np,
          light_mode: str = 'world'):
  """Analytic (density, color) field. points [..., 3] -> ([...], [..., 3]).

  With ``specular=True`` and ``viewdirs`` ([..., 3], camera→point unit
  vectors, broadcastable to points), the MOVING sphere gets a Blinn-Phong
  highlight computed from its analytic outward normal — a *dynamic specular
  surface*, the exact phenomenon NeRF-DS exists for (reference
  README.md:1-12): the radiance depends on (normal, viewdir), and the
  normal field moves with the warp. A model can only fit the moving
  highlight by recovering normals in the observation frame, so
  ``use_ref_radiance`` / predicted normals / back-facing losses become
  load-bearing on this scene instead of gradient-flow-only.

  ``xp`` selects the array backend (numpy for the host GT renderer, jnp for
  the jitted export renderer — identical math, see _render_image).

  ``light_mode``: 'world' (default) keeps the fixed directional light;
  'camera' anchors the light AT the camera (a headlight, L = −viewdir) —
  the adversarial construction from the NeRF-DS paper's motivation: the
  highlight then slides across the moving surface *against* the object's
  motion, so appearance changes cannot be explained by the deformation
  field carrying a static texture (reference README.md:1-12).
  """
  if static:
    t = 0.0
  center = _sphere_center_xp(t, xp)
  offset = points - center
  d_sphere = xp.linalg.norm(offset, axis=-1)
  sigma_sphere = 40.0 * xp.exp(-0.5 * (d_sphere / 0.12) ** 2)
  # A static dimmer blob off-axis gives the scene a persistent part.
  d_blob = xp.linalg.norm(points - xp.asarray([0.0, 0.0, 0.35]), axis=-1)
  sigma_blob = 25.0 * xp.exp(-0.5 * (d_blob / 0.10) ** 2)
  sigma = sigma_sphere + sigma_blob
  two_pi_t = 2 * np.pi * t
  # Color varies smoothly with position and time (sphere) vs fixed (blob).
  color_sphere = 0.5 + 0.5 * xp.stack([
      xp.cos(4.0 * points[..., 0] + two_pi_t),
      xp.sin(4.0 * points[..., 1]),
      xp.cos(4.0 * points[..., 2] - two_pi_t),
  ], axis=-1)
  if specular and viewdirs is not None:
    # Outward analytic normal of the moving sphere (= normalize(-∇σ_sphere)).
    normal = offset / xp.maximum(d_sphere, 1e-8)[..., None]
    if light_mode == 'camera':
      light = -viewdirs
    else:
      light = xp.asarray(_LIGHT_DIR)[None]
    half = light - viewdirs                     # L + (−viewdir)
    half = half / xp.maximum(
        xp.linalg.norm(half, axis=-1, keepdims=True), 1e-8)
    n_dot_h = xp.maximum((normal * half).sum(-1), 0.0)
    # Sharper exponents make the highlight a narrower function of
    # (normal, viewdir) — harder to fit without normal machinery (the
    # normals-ablation study raises this).
    highlight = 1.0 * n_dot_h ** specular_exponent
    # Keep the diffuse term bright enough that the all-black-fog local
    # minimum stays unattractive (a 0.35x dim measurably collapsed
    # training), while the moving highlight remains the dominant
    # view-dependent signal on the sphere.
    color_sphere = color_sphere * 0.6 + highlight[..., None]
  color_blob = xp.broadcast_to(xp.asarray([0.9, 0.6, 0.2]),
                               color_sphere.shape)
  w = (sigma_sphere / xp.maximum(sigma, 1e-8))[..., None]
  color = w * color_sphere + (1.0 - w) * color_blob
  if xp is np:
    return sigma.astype(np.float32), color.astype(np.float32)
  return sigma, color


def _sphere_center_xp(t, xp):
  """Moving sphere center with a selectable backend (t may be traced)."""
  if xp is np:
    return _sphere_center(t)
  angle = 2.0 * np.pi * t
  return xp.stack([0.25 * xp.cos(angle), 0.25 * xp.sin(angle),
                   xp.zeros_like(xp.asarray(angle))], axis=-1)


def shaded_field(points, t, viewdirs, xp=np, light_mode: str = 'camera',
                 specular_exponent: float = 60.0):
  """NON-emissive Blinn-Phong variant: the paper-mechanism normals scene.

  The moving sphere carries a *material-anchored* albedo texture (a function
  of material coordinates ``points - center(t)``, so the texture travels
  with the object — exactly what a deformation field CAN explain) shaded by
  Lambertian diffuse + a sharp Blinn-Phong highlight from a camera-anchored
  light (``light_mode='camera'``; 'world' pins it instead). The highlight is
  the only appearance component a warp-carried texture CANNOT explain — the
  condition NeRF-DS claims corrupts mask-free deformation estimation
  (reference README.md:1-12; norm path models.py:1104-1152).

  Returns (sigma, color) like :func:`field`.
  """
  center = _sphere_center_xp(t, xp)
  offset = points - center
  d_sphere = xp.linalg.norm(offset, axis=-1)
  sigma_sphere = 40.0 * xp.exp(-0.5 * (d_sphere / 0.12) ** 2)
  d_blob = xp.linalg.norm(points - xp.asarray([0.0, 0.0, 0.35]), axis=-1)
  sigma_blob = 25.0 * xp.exp(-0.5 * (d_blob / 0.10) ** 2)
  sigma = sigma_sphere + sigma_blob
  normal = offset / xp.maximum(d_sphere, 1e-8)[..., None]
  # Material-anchored two-tone albedo (moves WITH the sphere).
  albedo = 0.55 + 0.35 * xp.stack([
      xp.cos(24.0 * offset[..., 0]),
      xp.cos(24.0 * offset[..., 1]),
      xp.cos(24.0 * offset[..., 2]),
  ], axis=-1)
  if light_mode == 'camera':
    light = -viewdirs
  else:
    light = xp.asarray(_LIGHT_DIR)[None]
  lambert = xp.maximum((normal * light).sum(-1), 0.0)
  half = light - viewdirs
  half = half / xp.maximum(
      xp.linalg.norm(half, axis=-1, keepdims=True), 1e-8)
  n_dot_h = xp.maximum((normal * half).sum(-1), 0.0)
  highlight = n_dot_h ** specular_exponent
  color_sphere = (albedo * (0.30 + 0.70 * lambert[..., None])
                  + 0.9 * highlight[..., None])
  color_blob = xp.broadcast_to(xp.asarray([0.9, 0.6, 0.2]),
                               color_sphere.shape)
  w = (sigma_sphere / xp.maximum(sigma, 1e-8))[..., None]
  color = w * color_sphere + (1.0 - w) * color_blob
  if xp is np:
    return sigma.astype(np.float32), color.astype(np.float32)
  return sigma, color


def _eval_field(points, t, viewdirs, *, static, specular, specular_exponent,
                field_kind, light_mode, xp):
  """Dispatch between the emissive field and the shaded mechanism field."""
  if field_kind == 'shaded':
    return shaded_field(points, 0.0 if static else t, viewdirs, xp=xp,
                        light_mode=light_mode,
                        specular_exponent=specular_exponent)
  return field(points, t, static=static, viewdirs=viewdirs,
               specular=specular, specular_exponent=specular_exponent,
               xp=xp, light_mode=light_mode)


@functools.lru_cache(maxsize=8)
def _jax_march_fn(near, far, num_samples, static, specular, white_background,
                  specular_exponent, field_kind, light_mode):
  """Jitted GT ray-march (same math as the numpy path below; one compile
  serves every frame because t is a traced argument)."""
  import jax
  import jax.numpy as jnp
  z_np = np.linspace(near, far, num_samples, dtype=np.float32)
  dists_np = np.diff(z_np, append=z_np[-1] + (far - near)).astype(np.float32)

  def march(o, d, t):
    z = jnp.asarray(z_np)
    pts = o[:, None, :] + z[None, :, None] * d[:, None, :]
    view = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    sigma, color = _eval_field(
        pts, t, view[:, None, :], static=static, specular=specular,
        specular_exponent=specular_exponent, field_kind=field_kind,
        light_mode=light_mode, xp=jnp)
    center = _sphere_center_xp(0.0 if static else t, jnp)
    moving = (jnp.linalg.norm(pts - center, axis=-1) < 0.3
              ).astype(jnp.float32)
    dists = jnp.asarray(dists_np)[None] * jnp.linalg.norm(
        d, axis=-1)[:, None]
    alpha = 1.0 - jnp.exp(-sigma * dists)
    accum = jnp.concatenate([
        jnp.ones_like(alpha[:, :1]),
        jnp.cumprod(1.0 - alpha[:, :-1] + 1e-10, axis=-1)], axis=-1)
    weights = alpha * accum
    rgb = (weights[..., None] * color).sum(axis=1)
    if white_background:
      rgb = rgb + (1.0 - weights.sum(axis=1))[..., None]
    fg = (weights * moving).sum(axis=1)
    return rgb.astype(jnp.float32), fg.astype(jnp.float32)

  return jax.jit(march)


def _render_image(camera: Camera, t: float, near: float, far: float,
                  num_samples: int = 192, static: bool = False,
                  specular: bool = False, white_background: bool = False,
                  specular_exponent: float = 25.0,
                  field_kind: str = 'emissive', light_mode: str = 'world',
                  backend: str = 'numpy'):
  """Ground-truth ray march of the analytic field. Returns (rgb, mask).

  ``white_background`` composites unfilled transmittance onto white (the
  standard synthetic-NeRF convention; pair with the model's
  ``use_white_background``). A black background makes the all-black opaque
  fog a strong local minimum — observed to capture full production-schedule
  runs on the specular scene.

  ``backend='jax'`` runs the identical march jitted on the default JAX
  device — ~50x faster for the 480px vrig export (34.8 s/frame numpy vs
  sub-second on a chip; verified to agree within float tolerance by
  tests/test_datasets.py). The numpy path remains the no-JAX-dependency
  characterisation reference.
  """
  rays = camera_to_rays(camera)
  origins = rays['origins'].reshape(-1, 3)
  directions = rays['directions'].reshape(-1, 3)
  z = np.linspace(near, far, num_samples, dtype=np.float32)
  # Chunked to bound memory.
  h, w = camera.image_shape
  out_rgb = np.zeros((h * w, 3), np.float32)
  out_fg = np.zeros((h * w,), np.float32)
  chunk = 65536
  march = None
  if backend == 'jax':
    march = _jax_march_fn(float(near), float(far), int(num_samples),
                          bool(static), bool(specular),
                          bool(white_background), float(specular_exponent),
                          field_kind, light_mode)
  for start in range(0, h * w, chunk):
    o = origins[start:start + chunk]
    d = directions[start:start + chunk]
    if march is not None:
      n = o.shape[0]
      pad = chunk - n
      if pad:  # fixed shapes: one executable for every chunk/frame
        o = np.concatenate([o, np.repeat(o[-1:], pad, 0)], 0)
        d = np.concatenate([d, np.repeat(d[-1:], pad, 0)], 0)
      rgb_chunk, fg_chunk = march(o, d, np.float32(t))
      out_rgb[start:start + n] = np.asarray(rgb_chunk)[:n]
      out_fg[start:start + n] = np.asarray(fg_chunk)[:n]
      continue
    pts = o[:, None, :] + z[None, :, None] * d[:, None, :]
    view = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    sigma, color = _eval_field(
        pts, t, view[:, None, :], static=static, specular=specular,
        specular_exponent=specular_exponent, field_kind=field_kind,
        light_mode=light_mode, xp=np)
    center = _sphere_center(0.0 if static else t)
    moving = (np.linalg.norm(pts - center, axis=-1) < 0.3).astype(np.float32)
    dists = np.diff(z, append=z[-1] + (far - near)).astype(np.float32)
    dists = dists * np.linalg.norm(d, axis=-1)[:, None]
    alpha = 1.0 - np.exp(-sigma * dists)
    accum = np.concatenate([
        np.ones_like(alpha[:, :1]),
        np.cumprod(1.0 - alpha[:, :-1] + 1e-10, axis=-1)], axis=-1)
    weights = alpha * accum
    rgb_chunk = (weights[..., None] * color).sum(axis=1)
    if white_background:
      rgb_chunk = rgb_chunk + (1.0 - weights.sum(axis=1))[..., None]
    out_rgb[start:start + chunk] = rgb_chunk
    out_fg[start:start + chunk] = (weights * moving).sum(axis=1)
  rgb = out_rgb.reshape(h, w, 3).clip(0.0, 1.0)
  mask = (out_fg.reshape(h, w, 1) > 0.3).astype(np.float32)
  return rgb, mask


def make_orbit_camera(idx: int, num_frames: int, image_size: int = 64,
                      radius: float = 1.2) -> Camera:
  """Camera on a slow orbit, looking at the origin."""
  angle = 0.6 * np.sin(2 * np.pi * idx / max(num_frames, 1))
  position = np.array([radius * np.sin(angle), 0.35,
                       -radius * np.cos(angle)], np.float32)
  base = Camera(
      orientation=np.eye(3), position=position,
      focal_length=image_size * 1.2,
      principal_point=np.array([image_size / 2, image_size / 2]),
      image_size=np.array([image_size, image_size]))
  return base.look_at(position, np.zeros(3), np.array([0.0, -1.0, 0.0]))


class SyntheticDataSource(DataSource):
  """In-memory dynamic scene with analytic ground truth."""

  NEAR = 0.5
  FAR = 2.2

  def __init__(self, num_frames: int = 8, image_size: int = 64,
               static: bool = False, gt_samples: int = 192,
               specular: bool = False, white_background: bool = False,
               specular_exponent: float = 25.0,
               field_kind: str = 'emissive', light_mode: str = 'world',
               gt_backend: str = 'numpy', **kwargs):
    ids = [f'{i:04d}' for i in range(num_frames)]
    train_ids = [i for k, i in enumerate(ids) if k % 4 != 3]
    val_ids = [i for k, i in enumerate(ids) if k % 4 == 3]
    kwargs.setdefault('use_warp_id', True)
    super().__init__(train_ids=train_ids, val_ids=val_ids, **kwargs)
    self.num_frames = num_frames
    self.image_size = image_size
    self.static = static
    self.gt_samples = gt_samples
    self.specular = specular
    self.white_background = white_background
    self.specular_exponent = specular_exponent
    self.field_kind = field_kind
    self.light_mode = light_mode
    self.gt_backend = gt_backend
    self._cache: Dict[str, tuple] = {}

  @property
  def near(self) -> float:
    return self.NEAR

  @property
  def far(self) -> float:
    return self.FAR

  def _time(self, item_id: str) -> float:
    return int(item_id) / max(self.num_frames, 1)

  # Public alias (normal-fidelity metric needs the frame's scene time).
  frame_time = _time

  def _render(self, item_id: str):
    if item_id not in self._cache:
      camera = self.load_camera(item_id)
      rgb, mask = _render_image(camera, self._time(item_id), self.NEAR,
                                self.FAR, num_samples=self.gt_samples,
                                static=self.static, specular=self.specular,
                                white_background=self.white_background,
                                specular_exponent=self.specular_exponent,
                                field_kind=self.field_kind,
                                light_mode=self.light_mode,
                                backend=self.gt_backend)
      self._cache[item_id] = (rgb, mask)
    return self._cache[item_id]

  def load_rgb(self, item_id: str) -> np.ndarray:
    return self._render(item_id)[0]

  def load_mask(self, item_id: str) -> Optional[np.ndarray]:
    return self._render(item_id)[1]

  def load_camera(self, item_id, scale_factor: float = 1.0) -> Camera:
    return make_orbit_camera(int(item_id), self.num_frames, self.image_size)

  def load_points(self, shuffle: bool = False) -> Optional[np.ndarray]:
    """Free-space background points (for the background regulariser)."""
    rng = np.random.RandomState(99)
    points = rng.uniform(-0.9, 0.9, size=(4096, 3)).astype(np.float32)
    sigma, _ = field(points, 0.0, static=True)
    points = points[sigma < 0.05][:2048]
    if shuffle:
      points = points[self.rng.permutation(len(points))]
    return points

  def get_warp_id(self, item_id) -> int:
    return int(item_id)

  def get_item_metadata(self, item_id: str):
    """Val frames are unseen *times*: their metadata is the
    (left, right, progression) interpolation triple between the neighbouring
    train frames (the reference's interp-benchmark convention,
    interp.py:196-213), so evaluation doesn't read an untrained embedding."""
    if item_id in self.train_ids or not self.use_warp_id:
      return super().get_item_metadata(item_id)
    meta = super().get_item_metadata(item_id)
    idx = int(item_id)
    train_idxs = np.asarray([int(i) for i in self.train_ids])
    left = train_idxs[train_idxs < idx].max(initial=train_idxs.min())
    right = train_idxs[train_idxs > idx].min(initial=train_idxs.max())
    progression = 0.0 if right == left else (idx - left) / (right - left)
    triple = np.asarray([float(left), float(right), progression], np.float32)
    meta['warp'] = triple
    return meta

  def get_appearance_id(self, item_id) -> int:
    return int(item_id)

  def get_camera_id(self, item_id) -> int:
    return 0

  def get_time_id(self, item_id) -> int:
    return int(item_id)


# Mild-but-real lens parameters for the two vrig cameras (k1-k3 radial,
# p1-p2 tangential) — the magnitudes of a phone wide lens, so the Newton
# undistortion (camera.py:75-106) does real work on every exported pixel.
_VRIG_LENSES = {
    'left': {'radial': (-0.12, 0.035, -0.004), 'tangential': (0.0012, -0.0008),
             'focal_mult': 1.18},
    'right': {'radial': (-0.09, 0.028, -0.003), 'tangential': (-0.0009, 0.0014),
              'focal_mult': 1.26},
}


def make_vrig_camera(side: str, idx: int, num_frames: int,
                     image_size: int = 480, radius: float = 1.2,
                     baseline: float = 0.18) -> Camera:
  """One camera of a two-camera validation rig (NeRF-DS capture setup:
  train on the left camera, evaluate novel views from the right —
  reference README dataset description; ids split like
  generate_test_vrig_camera.py's ``left_NNNN``/``right_NNNN``).

  Both cameras ride a slowly orbiting handheld mount (smooth sweep + small
  deterministic wobble, like a human operator), separated by a rigid
  horizontal baseline, each aimed at the subject with its own intrinsics
  and nonzero radial/tangential distortion."""
  if side not in ('left', 'right'):
    raise ValueError(f"side must be 'left' or 'right', got {side!r}")
  u = idx / max(num_frames, 1)
  angle = 0.7 * np.sin(2 * np.pi * u)
  # Handheld wobble: small deterministic multi-frequency jitter.
  wobble = np.array([
      0.02 * np.sin(17.0 * u * 2 * np.pi),
      0.015 * np.cos(11.0 * u * 2 * np.pi),
      0.02 * np.sin(7.0 * u * 2 * np.pi + 1.3),
  ], np.float32)
  mount = np.array([radius * np.sin(angle), 0.35 + 0.1 * np.sin(np.pi * u),
                    -radius * np.cos(angle)], np.float32) + wobble
  # Rig-right direction (horizontal, perpendicular to the view direction).
  to_target = -mount / np.linalg.norm(mount)
  up = np.array([0.0, -1.0, 0.0], np.float32)
  right_dir = np.cross(to_target, up)
  right_dir = right_dir / np.linalg.norm(right_dir)
  offset = {'left': -0.5, 'right': 0.5}[side] * baseline * right_dir
  position = mount + offset
  lens = _VRIG_LENSES[side]
  base = Camera(
      orientation=np.eye(3), position=position,
      focal_length=image_size * lens['focal_mult'],
      principal_point=np.array([image_size / 2 + (2.5 if side == 'left'
                                                  else -3.5),
                                image_size / 2 + 1.5]),
      image_size=np.array([image_size, image_size]),
      radial_distortion=np.array(lens['radial'], np.float32),
      tangential_distortion=np.array(lens['tangential'], np.float32))
  # Both cameras aim at the subject (slightly above origin).
  return base.look_at(position, np.array([0.0, 0.05, 0.0], np.float32), up)


class VrigSyntheticDataSource(SyntheticDataSource):
  """Two-camera validation-rig capture of the specular scene.

  The realistic operating point of the reference (BASELINE config[3]): a
  vrig capture at full resolution with distorted cameras — train ids
  ``left_NNNN``, val ids ``right_NNNN`` at the SAME scene times (so val
  metadata is the plain trained warp id, per the reference's vrig
  evaluation protocol, not the interp triple of the novel-time split).
  """

  def __init__(self, num_frames: int = 100, image_size: int = 480,
               gt_samples: int = 192, specular: bool = True,
               white_background: bool = True,
               specular_exponent: float = 25.0,
               field_kind: str = 'emissive', light_mode: str = 'world',
               gt_backend: str = 'jax', baseline: float = 0.18, **kwargs):
    super().__init__(num_frames=num_frames, image_size=image_size,
                     gt_samples=gt_samples, specular=specular,
                     white_background=white_background,
                     specular_exponent=specular_exponent,
                     field_kind=field_kind, light_mode=light_mode,
                     gt_backend=gt_backend, **kwargs)
    self.baseline = baseline
    # Override the novel-time split: all frames exist under both cameras.
    self.train_ids = [f'left_{i:04d}' for i in range(num_frames)]
    self.val_ids = [f'right_{i:04d}' for i in range(num_frames)]

  @staticmethod
  def _parse(item_id: str):
    side, _, num = item_id.partition('_')
    return side, int(num)

  def _time(self, item_id: str) -> float:
    return self._parse(item_id)[1] / max(self.num_frames, 1)

  frame_time = _time

  def load_camera(self, item_id, scale_factor: float = 1.0) -> Camera:
    side, idx = self._parse(item_id)
    camera = make_vrig_camera(side, idx, self.num_frames, self.image_size,
                              baseline=self.baseline)
    if scale_factor != 1.0:
      camera = camera.scale(scale_factor)
    return camera

  def get_warp_id(self, item_id) -> int:
    return self._parse(item_id)[1]

  def get_appearance_id(self, item_id) -> int:
    return self._parse(item_id)[1]

  def get_camera_id(self, item_id) -> int:
    return 0 if self._parse(item_id)[0] == 'left' else 1

  def get_time_id(self, item_id) -> int:
    return self._parse(item_id)[1]

  def get_item_metadata(self, item_id: str):
    # Val (right-camera) frames are SEEN times: plain trained ids, no
    # interpolation triple.
    return DataSource.get_item_metadata(self, item_id)


def write_nerfies_dataset(source: SyntheticDataSource, out_dir,
                          image_scale: int = 1,
                          scene_center=None, scene_scale: float = 1.0,
                          camera_path_frames: int = 0,
                          progress: bool = False) -> Path:
  """Writes the synthetic scene in the Nerfies directory layout.

  ``scene_center``/``scene_scale`` emit the capture in RAW (un-normalised)
  world coordinates with the matching ``scene.json`` — the loader's
  recenter/rescale (nerfies.py load_camera, reference core.py) then has
  real work to do and round-trips back to the source's scene coordinates.

  ``camera_path_frames > 0`` additionally writes a NOVEL smooth orbit
  trajectory of that many cameras under ``camera-paths/orbit-novel/``
  (the reference's test-camera layout); the val cameras are always
  exported as ``camera-paths/orbit-mild``.
  """
  import cv2
  out_dir = Path(out_dir)
  rgb_dir = out_dir / 'rgb' / f'{image_scale}x'
  mask_dir = out_dir / 'resized_mask' / f'{image_scale}x'
  cam_dir = out_dir / 'camera'
  for d in (rgb_dir, mask_dir, cam_dir):
    d.mkdir(parents=True, exist_ok=True)
  center = (np.zeros(3, np.float32) if scene_center is None
            else np.asarray(scene_center, np.float32))

  def raw(camera: Camera) -> Camera:
    # scene coords -> raw world coords (inverse of loader recentering).
    camera = camera.copy()
    camera.position = camera.position / scene_scale + center
    return camera

  all_ids = sorted(source.train_ids + source.val_ids)
  metadata = {}
  for n, item_id in enumerate(all_ids):
    rgb = (source.load_rgb(item_id) * 255).astype(np.uint8)
    cv2.imwrite(str(rgb_dir / f'{item_id}.png'), rgb[:, :, ::-1])
    mask = source.load_mask(item_id)
    # Stored masks use the raw polarity (static part = 1); the loader
    # re-inverts (nerfies.py:152-157).
    inv = ((1.0 - mask[..., 0]) * 255).astype(np.uint8)
    cv2.imwrite(str(mask_dir / f'{item_id}.png.png'), inv)
    raw(source.load_camera(item_id)).save_json(cam_dir / f'{item_id}.json')
    metadata[item_id] = {
        'warp_id': source.get_warp_id(item_id),
        'appearance_id': source.get_appearance_id(item_id),
        'camera_id': source.get_camera_id(item_id),
        'time_id': source.get_time_id(item_id),
    }
    if progress and (n + 1) % 20 == 0:
      print(f'  exported {n + 1}/{len(all_ids)} frames', flush=True)
  (out_dir / 'scene.json').write_text(json.dumps({
      'center': center.tolist(), 'scale': scene_scale,
      'near': source.NEAR, 'far': source.FAR}))
  (out_dir / 'dataset.json').write_text(json.dumps({
      'count': len(all_ids), 'num_exemplars': len(source.train_ids),
      'ids': all_ids, 'train_ids': source.train_ids,
      'val_ids': source.val_ids}))
  (out_dir / 'metadata.json').write_text(json.dumps(metadata))
  pts = source.load_points()
  np.save(out_dir / 'points.npy', pts / scene_scale + center)
  # Novel-trajectory test cameras (reference layout: camera-paths/<name>/)
  # — reuse the val-frame cameras as a minimal orbit so the evaluator's
  # test split (eval.py --num_test_eval) is exercisable on synthetic data.
  path_dir = out_dir / 'camera-paths' / 'orbit-mild'
  path_dir.mkdir(parents=True, exist_ok=True)
  for k, item_id in enumerate(source.val_ids):
    raw(source.load_camera(item_id)).save_json(path_dir / f'{k:06d}.json')
  if camera_path_frames:
    novel_dir = out_dir / 'camera-paths' / 'orbit-novel'
    novel_dir.mkdir(parents=True, exist_ok=True)
    for k in range(camera_path_frames):
      angle = 2 * np.pi * k / camera_path_frames
      position = np.array([1.1 * np.sin(0.5 * np.sin(angle)),
                           0.3 + 0.15 * np.cos(angle),
                           -1.1 * np.cos(0.5 * np.sin(angle))], np.float32)
      cam = Camera(
          orientation=np.eye(3), position=position,
          focal_length=source.image_size * 1.2,
          principal_point=np.array([source.image_size / 2,
                                    source.image_size / 2]),
          image_size=np.array([source.image_size, source.image_size]))
      cam = cam.look_at(position, np.zeros(3), np.array([0.0, -1.0, 0.0]))
      raw(cam).save_json(novel_dir / f'{k:06d}.json')
  return out_dir
