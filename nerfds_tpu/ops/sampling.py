"""Ray sampling (L0): stratified coarse + inverse-CDF importance sampling.

Behavioural parity targets: reference ``hypernerf/model_utils.py``
``sample_along_rays`` (:55-92), ``piecewise_constant_pdf`` (:193-241),
``sample_pdf`` (:244-269). Everything is static-shape and batched over rays —
the inverse-CDF inversion uses the same O(S²) masked min/max formulation as
the reference, which for S≈64 vectorises onto the VPU far better than a
serial search.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_along_rays(key, origins, directions, num_samples: int,
                      near: float, far: float,
                      use_stratified_sampling: bool,
                      use_linear_disparity: bool
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Stratified sampling along rays.

  Returns (z_vals [R, S], points [R, S, 3]).
  """
  batch_size = origins.shape[0]
  t_vals = jnp.linspace(0.0, 1.0, num_samples)
  if not use_linear_disparity:
    z_vals = near * (1.0 - t_vals) + far * t_vals
  else:
    z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
  if use_stratified_sampling:
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
    lower = jnp.concatenate([z_vals[..., :1], mids], -1)
    t_rand = jax.random.uniform(key, [batch_size, num_samples])
    z_vals = lower + (upper - lower) * t_rand
  else:
    z_vals = jnp.broadcast_to(z_vals[None, ...], [batch_size, num_samples])
  points = (origins[..., None, :]
            + z_vals[..., :, None] * directions[..., None, :])
  return z_vals, points


def piecewise_constant_pdf(key, bins, weights, num_samples: int,
                           use_stratified_sampling: bool) -> jnp.ndarray:
  """Inverse-CDF sampling from a piecewise-constant PDF over sorted bins.

  bins: [R, B+1]; weights: [R, B]. Returns stop-gradient'd z samples [R, S].
  """
  eps = 1e-5
  weights = weights + eps
  pdf = weights / weights.sum(axis=-1, keepdims=True)
  cdf = jnp.cumsum(pdf, axis=-1)
  cdf = jnp.concatenate(
      [jnp.zeros(list(cdf.shape[:-1]) + [1]), cdf], axis=-1)

  if use_stratified_sampling:
    u = jax.random.uniform(key, list(cdf.shape[:-1]) + [num_samples])
  else:
    u = jnp.linspace(0.0, 1.0, num_samples)
    u = jnp.broadcast_to(u, list(cdf.shape[:-1]) + [num_samples])

  # Invert the CDF: for each u find the surrounding (bin, cdf) bracket. The
  # mask trick exploits that `bins` is sorted; all ops are dense vector math.
  mask = u[..., None, :] >= cdf[..., :, None]

  def minmax(x):
    x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), -2)
    x1 = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), -2)
    x0 = jnp.minimum(x0, x[..., -2:-1])
    x1 = jnp.maximum(x1, x[..., 1:2])
    return x0, x1

  bins_g0, bins_g1 = minmax(bins)
  cdf_g0, cdf_g1 = minmax(cdf)

  denom = cdf_g1 - cdf_g0
  denom = jnp.where(denom < eps, 1.0, denom)
  t = (u - cdf_g0) / denom
  z_samples = bins_g0 + t * (bins_g1 - bins_g0)
  return jax.lax.stop_gradient(z_samples)


def sample_pdf(key, bins, weights, origins, directions, z_vals,
               num_samples: int, use_stratified_sampling: bool
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Hierarchical sampling: merge importance samples with coarse z, sorted.

  Returns (z_vals [R, Sc+Sf], points [R, Sc+Sf, 3]).
  """
  z_samples = piecewise_constant_pdf(key, bins, weights, num_samples,
                                     use_stratified_sampling)
  z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
  points = (origins[..., None, :]
            + z_vals[..., None] * directions[..., None, :])
  return z_vals, points
