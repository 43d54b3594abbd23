"""Training losses (L4).

Parity target: reference ``hypernerf/training.py`` — ``_compute_loss_and_stats``
(:246-438), ``compute_elastic_loss`` (:112-155), ``compute_background_loss``
(:158-179). Stop-gradient placement follows the reference exactly (weights are
stopped in every auxiliary loss; the norm target is NOT stopped, which is what
makes training second-order through the σ-gradient).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from nerfds_tpu.config import ModelConfig, TrainConfig
from nerfds_tpu.ops import math as math_ops
from nerfds_tpu.ops import rendering

# Empty-space mask penalty gate (reference training.py:373): samples whose
# compositing α is below this threshold count as empty space; the sigmoid
# steepness makes the gate a soft step.
EMPTY_ALPHA_THRESHOLD = 0.1
EMPTY_ALPHA_STEEPNESS = 100.0


def percentile_stats(stats: Dict[str, jnp.ndarray], name: str, array,
                     percentile_step: int = 10) -> None:
  """Deciles of ``array`` as 'percentile/<name>_<p>' scalar stats
  (reference ``get_percentile_stats``, utils.py:500-504). One in-jit sort,
  all 11 percentiles gathered from it."""
  qs = jnp.arange(0, 101, percentile_step, dtype=jnp.float32)
  values = jnp.percentile(array, qs)
  for i, p in enumerate(range(0, 101, percentile_step)):
    stats[f'percentile/{name}_{p}'] = values[i]


def rgb_loss_fn(pred, target, use_shrinkage_loss: bool):
  err = pred[..., :3] - target[..., :3]
  if use_shrinkage_loss:
    return math_ops.shrinkage_loss(err)
  return math_ops.l2_loss(err)


def compute_elastic_loss(jacobian, eps=1e-6, loss_type='log_svals'):
  """Elastic regularisation on the warp Jacobian (training.py:112-155).

  jacobian: [..., 3, 3] batched — the SVD/det paths vectorise over leading
  dims (the reference vmaps a per-matrix function).
  """
  if loss_type == 'log_svals':
    svals = jnp.linalg.svd(jacobian, compute_uv=False)
    log_svals = jnp.log(jnp.maximum(svals, eps))
    sq_residual = jnp.sum(log_svals ** 2, axis=-1)
  elif loss_type == 'svals':
    svals = jnp.linalg.svd(jacobian, compute_uv=False)
    sq_residual = jnp.sum((svals - 1.0) ** 2, axis=-1)
  elif loss_type == 'div':
    div = math_ops.jacobian_to_div(jacobian)
    sq_residual = div ** 2
  elif loss_type == 'det':
    det = jnp.linalg.det(jacobian)
    sq_residual = (det - 1.0) ** 2
  elif loss_type == 'log_det':
    det = jnp.linalg.det(jacobian)
    sq_residual = jnp.log(jnp.maximum(det, eps)) ** 2
  else:
    raise NotImplementedError(f'Unknown elastic loss type {loss_type!r}')
  residual = jnp.sqrt(sq_residual)
  loss = math_ops.general_loss_with_squared_residual(
      sq_residual, alpha=-2.0, scale=0.03)
  return loss, residual


def compute_background_loss(model, params, key, points, extra_params,
                            noise_std, alpha=-2.0, scale=0.001):
  """Penalise motion of known-static points (training.py:158-179).

  Fully batched: one warp-field evaluation over all points (the reference
  vmaps per point).
  """
  metadata = jax.random.randint(
      key, (points.shape[0], 1), 0, model.num_warp_embeds)
  point_noise = noise_std * jax.random.normal(key, points.shape)
  points = points + point_noise
  if model.config.use_bone:
    # Bone mode: free space should not move (reference training.py:166-170).
    moving_mask = model.get_bone_moving_mask(params, points, metadata)
    return jnp.abs(moving_mask)
  warped = model.apply_warp(params, points, metadata, extra_params)
  sq_residual = jnp.sum((warped - points) ** 2, axis=-1)
  return math_ops.general_loss_with_squared_residual(
      sq_residual, alpha=alpha, scale=scale)


def compute_loss_and_stats(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    model_out: Dict[str, jnp.ndarray],
    batch: Dict[str, Any],
    scalars: Dict[str, jnp.ndarray],
    *,
    use_elastic_loss: bool = False,
    use_hyper_reg_loss: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
  """Per-level total loss + stats (training.py:246-438)."""
  stats: Dict[str, jnp.ndarray] = {}

  rgb_loss = rgb_loss_fn(model_out['rgb'], batch['rgb'],
                         train_cfg.use_shrinkage_loss).mean()
  stats['loss/rgb'] = rgb_loss
  loss = rgb_loss

  if use_elastic_loss:
    weights = jax.lax.stop_gradient(model_out['weights'])
    jacobian = model_out['warp_jacobian']
    if train_cfg.elastic_reduce_method == 'median':
      depth_indices = rendering.compute_depth_index(weights)
      jacobian = jnp.take_along_axis(
          jacobian, depth_indices[..., None, None, None], axis=-3)
    elastic_loss, elastic_residual = compute_elastic_loss(
        jacobian, loss_type=train_cfg.elastic_loss_type)
    if train_cfg.elastic_reduce_method == 'weight':
      elastic_loss = weights * elastic_loss
    elastic_loss = elastic_loss.sum(axis=-1).mean()
    stats['loss/elastic'] = elastic_loss
    stats['residual/elastic'] = jnp.mean(elastic_residual)
    loss = loss + scalars['elastic_loss_weight'] * elastic_loss

  if train_cfg.use_warp_reg_loss:
    weights = jax.lax.stop_gradient(model_out['weights'])
    depth_indices = rendering.compute_depth_index(weights)
    warp_mag = ((model_out['points']
                 - model_out['warped_points'][..., :3]) ** 2).sum(axis=-1)
    warp_reg_residual = jnp.take_along_axis(
        warp_mag, depth_indices[..., None], axis=-1)
    warp_reg_loss = math_ops.general_loss_with_squared_residual(
        warp_reg_residual,
        alpha=train_cfg.warp_reg_loss_alpha,
        scale=train_cfg.warp_reg_loss_scale).mean()
    stats['loss/warp_reg'] = warp_reg_loss
    stats['residual/warp_reg'] = jnp.mean(jnp.sqrt(warp_reg_residual))
    loss = loss + train_cfg.warp_reg_loss_weight * warp_reg_loss

  if use_hyper_reg_loss:
    weights = jax.lax.stop_gradient(model_out['weights'])
    hyper_points = model_out['warped_points'][..., 3:]
    hyper_reg_residual = (hyper_points ** 2).sum(axis=-1)
    hyper_reg_loss = math_ops.general_loss_with_squared_residual(
        hyper_reg_residual, alpha=0.0, scale=0.05)
    hyper_reg_loss = (weights * hyper_reg_loss).sum(axis=1).mean()
    stats['loss/hyper_reg'] = hyper_reg_loss
    stats['residual/hyper_reg'] = jnp.mean(jnp.sqrt(hyper_reg_residual))
    loss = loss + train_cfg.hyper_reg_loss_weight * hyper_reg_loss

  if (model_cfg.use_predicted_norm and 'predicted_norm' in model_out
      and 'target_norm' in model_out):
    weights = jax.lax.stop_gradient(model_out['weights'])
    predicted_norm = model_out['predicted_norm']
    target_norm = model_out['target_norm']
    if 'norm_topk_idx' in model_out:
      # norm_grad_topk: the target exists only at the k highest-weight
      # samples; gather the prediction/weights there and keep the full-S
      # mean normalisation so the loss scale matches the exact path (the
      # non-selected samples' weighted contributions are the approximation
      # error, bounded by the discarded weight mass).
      idx = model_out['norm_topk_idx']
      predicted_norm = jnp.take_along_axis(
          predicted_norm, idx[..., None], axis=1)
      w_k = jnp.take_along_axis(weights, idx, axis=1)
      norm_diff = jnp.linalg.norm(
          predicted_norm - target_norm, axis=-1, ord=2)
      norm_diff_loss = (w_k * norm_diff).sum() / weights.size
    else:
      norm_diff = jnp.linalg.norm(
          predicted_norm - target_norm, axis=-1, ord=2)
      norm_diff_loss = jnp.mean(weights * norm_diff)
    stats['loss/norm_diff'] = norm_diff_loss
    loss = loss + scalars['norm_loss_weight'] * norm_diff_loss

  if train_cfg.use_back_facing_reg and 'back_facing' in model_out:
    weights = jax.lax.stop_gradient(model_out['weights'])
    back_facing_loss = jnp.mean(weights * model_out['back_facing'])
    stats['loss/back_facing'] = back_facing_loss
    loss = loss + train_cfg.back_facing_reg_weight * back_facing_loss

  if 'predicted_mask' in model_out and not model_cfg.use_3d_mask:
    # 2D mask supervision (training.py:355-382).
    alpha = jax.lax.stop_gradient(model_out['alpha'])
    weights = jax.lax.stop_gradient(model_out['weights'])
    predicted_mask = model_out['predicted_mask'][..., 0]
    gt_mask = jnp.broadcast_to(batch['mask'], predicted_mask.shape)
    mask_diff = jnp.abs(predicted_mask - gt_mask)
    predicted_mask_loss = (weights * mask_diff).sum(axis=1).mean()
    stats['loss/predicted_mask'] = predicted_mask_loss
    mask_size = jnp.clip(predicted_mask, 0.0, 1.0)
    # Soft "this sample is empty space" gate: a steep sigmoid step around
    # α=EMPTY_ALPHA_THRESHOLD (reference training.py:373 hardcodes
    # `1 - sigmoid(100 * (alpha - 0.1))`).
    low_alpha = 1.0 - jax.nn.sigmoid(
        EMPTY_ALPHA_STEEPNESS * (alpha - EMPTY_ALPHA_THRESHOLD))
    empty_space_loss = (low_alpha * mask_size).sum(axis=1).mean()
    stats['loss/empty_space_mask'] = empty_space_loss
    if train_cfg.log_percentiles:
      # Alpha-distribution canaries (reference training.py:374-377).
      percentile_stats(stats, 'alpha', alpha)
    stats['stats/low_alpha_mean'] = jnp.mean(low_alpha)
    stats['stats/predicted_mask_max'] = jnp.max(predicted_mask)
    predicted_mask_loss = (
        predicted_mask_loss
        + train_cfg.empty_space_mask_loss_weight * empty_space_loss)
    loss = loss + train_cfg.predicted_mask_loss_weight * predicted_mask_loss

  if 'predicted_mask' in model_out and model_cfg.use_3d_mask:
    # 3D mask supervision against the per-ray gt mask (training.py:384-418).
    weights = jax.lax.stop_gradient(model_out['weights'])
    predicted_mask = model_out['predicted_mask'][..., 0]
    gt_mask = batch['mask'][..., 0]
    if model_cfg.use_mask_sharp_weights:
      w = jax.lax.stop_gradient(model_out['sharp_weights'])
    elif model_cfg.use_mask_scaled_weights:
      w = jax.lax.stop_gradient(model_out['scaled_weights'])
    else:
      w = weights
    ray_predicted_mask = (w * predicted_mask).sum(axis=1)
    predicted_mask_loss = ((gt_mask - ray_predicted_mask) ** 2).mean()
    stats['loss/predicted_mask'] = predicted_mask_loss
    if train_cfg.log_percentiles:
      # 3D-mask distribution canaries (reference training.py:391).
      percentile_stats(stats, '3d_mask', predicted_mask)
    stats['stats/weights_sum'] = jnp.mean(jnp.sum(weights, axis=1))
    loss = loss + train_cfg.predicted_mask_loss_weight * predicted_mask_loss
    if train_cfg.use_mask_occlusion_reg_loss:
      low_weights = jnp.maximum(0.01 - weights, 0.0)
      occlusion = jnp.sum(low_weights * jnp.abs(predicted_mask),
                          axis=-1).mean()
      stats['loss/mask_occlusion_reg'] = occlusion
      loss = loss + train_cfg.mask_occlusion_reg_loss_weight * occlusion

  stats['loss/total'] = loss
  stats['metric/psnr'] = math_ops.compute_psnr(rgb_loss)
  return loss, stats
