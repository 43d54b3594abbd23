"""Time-indexed voxel grid of surface normals (L3).

Parity target: reference ``hypernerf/modules.py`` NormVoxels (:436-595) —
a (T, X, Y, Z, 3) grid with trilinear interpolation and an EMA-style
in-place update weighted by occupancy and interpolation distance. The
reference declares the flag (``use_norm_voxel``, models.py:229) but never
instantiates it in the live model; it is provided here for inventory
completeness and as a functional (pure) version: updates return the new
grid instead of mutating a flax variable.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from nerfds_tpu.ops.math import get_trilinear_coefficient


@dataclasses.dataclass(frozen=True)
class NormVoxels:
  voxel_shape: Tuple[int, int, int, int]  # (T, X, Y, Z)
  range_min: Tuple[float, float, float] = (-1.5, -1.5, -1.5)
  range_max: Tuple[float, float, float] = (1.5, 1.5, 1.5)

  def init(self):
    grid = jnp.full((*self.voxel_shape, 3), jnp.sqrt(1.0 / 3.0),
                    jnp.float32)
    return {'voxel_array': grid}

  @property
  def steps(self) -> jnp.ndarray:
    lo = jnp.asarray(self.range_min)
    hi = jnp.asarray(self.range_max)
    dims = jnp.asarray(self.voxel_shape[1:], jnp.float32)
    return (hi - lo) / dims

  def vertex_indices(self, t: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """t: [N] int, pos: [N, 3] -> [N, 8, 4] (t, x, y, z) vertex indices,
    vertex order [C000, C100, C010, C110, C001, C101, C011, C111]."""
    lo = jnp.asarray(self.range_min)
    rel = pos - lo
    mins = jnp.floor(rel / self.steps).astype(jnp.int32)        # [N, 3]
    maxs = mins + 1
    dims = jnp.asarray(self.voxel_shape[1:], jnp.int32)
    mins = jnp.clip(mins, 0, dims - 1)
    maxs = jnp.clip(maxs, 0, dims - 1)
    # Per-vertex choice of min/max along each axis.
    choose = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                          [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]])
    xyz = jnp.where(choose[None, :, :] == 1, maxs[:, None, :],
                    mins[:, None, :])                           # [N, 8, 3]
    t_idx = jnp.broadcast_to(t[:, None, None], (*xyz.shape[:2], 1))
    return jnp.concatenate([t_idx.astype(jnp.int32), xyz], axis=-1)

  def interpolation_coef(self, pos: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.asarray(self.range_min)
    rel = pos - lo
    local = jnp.mod(rel, self.steps) / self.steps
    return get_trilinear_coefficient(local)

  def lookup(self, params, t: jnp.ndarray, pos: jnp.ndarray):
    """Trilinear interpolated normals at (t, pos). Returns [N, 3]."""
    coef = self.interpolation_coef(pos)
    idx = jax.lax.stop_gradient(self.vertex_indices(t, pos))
    grid = params['voxel_array']
    values = grid[idx[..., 0], idx[..., 1], idx[..., 2], idx[..., 3]]
    return jnp.sum(coef[..., None] * values, axis=1), values, coef

  def lookup_and_update(self, params, t, pos, lr, sigma, target_norm):
    """Interpolate + EMA-update toward target normals (functional).

    Update weight per vertex = sigmoid(lr · (1−e^{−σ}) · trilinear coef),
    matching reference modules.py:565-595. Returns (value, new_params).
    """
    coef = self.interpolation_coef(pos)
    idx = self.vertex_indices(t, pos)
    grid = params['voxel_array']
    values = grid[idx[..., 0], idx[..., 1], idx[..., 2], idx[..., 3]]
    value = jnp.sum(coef[..., None] * values, axis=1)

    target = jnp.broadcast_to(target_norm[:, None, :], values.shape)
    sigma_weight = (1.0 - jnp.exp(-sigma))[:, None]
    update_lambda = jax.nn.sigmoid(lr * sigma_weight * coef)[..., None]
    new_values = update_lambda * target + (1.0 - update_lambda) * values
    diff = (new_values - values).reshape(-1, 3)
    flat_idx = idx.reshape(-1, 4)
    new_grid = grid.at[flat_idx[:, 0], flat_idx[:, 1], flat_idx[:, 2],
                       flat_idx[:, 3]].add(diff)
    return value, {'voxel_array': new_grid}
