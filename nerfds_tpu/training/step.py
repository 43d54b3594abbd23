"""Train state + the compiled training step (L4).

TPU-first replacement for the reference loop (``train.py:394-463`` +
``training.py:198-511``):

* one ``jit`` over a data-sharded Mesh instead of ``pmap`` — gradients are
  all-reduced by the partitioner (overlapped with backward), stats come out
  replicated, nothing is host-reshaped;
* every annealing schedule (``train.py:401-427`` evaluates 15 of them on the
  host per step) is compiled into the step as a function of the traced step
  counter — steady-state host work is zero;
* optionally the minibatch gather itself runs inside the step against a
  device-resident :class:`~nerfds_tpu.datasets.core.RayStore`
  (``make_fused_train_step``), so an entire training iteration is a single
  XLA program launch;
* optimizer is optax Adam (exact ``scale_by_adam`` + per-step lr), replacing
  the dead ``flax.optim`` API.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nerfds_tpu.config import TrainConfig
from nerfds_tpu.datasets.core import RayStore, sample_batch
from nerfds_tpu.models.nerfds import NerfDSModel
from nerfds_tpu.ops import math as math_ops
from nerfds_tpu.training import losses as losses_lib
from nerfds_tpu.training import schedules as schedules_lib


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
  """Replicated training state: step counter, params, Adam moments."""
  step: jnp.ndarray
  params: Any
  opt_state: Any

  @classmethod
  def create(cls, params) -> 'TrainState':
    return cls(step=jnp.zeros((), jnp.int32), params=params,
               opt_state=optax.scale_by_adam().init(params))


def build_schedules(train_cfg: TrainConfig) -> Dict[str, Any]:
  """All annealing schedules as jittable step->value fns."""
  sc = schedules_lib.from_config
  return {
      'learning_rate': sc(train_cfg.lr_schedule),
      'nerf_alpha': sc(train_cfg.nerf_alpha_schedule),
      'warp_alpha': sc(train_cfg.warp_alpha_schedule),
      'hyper_alpha': sc(train_cfg.hyper_alpha_schedule),
      'hyper_sheet_alpha': sc(train_cfg.hyper_sheet_alpha_schedule),
      'elastic_loss_weight': sc(train_cfg.elastic_loss_weight_schedule),
      'norm_loss_weight': sc(train_cfg.norm_loss_weight_schedule),
      'norm_input_alpha': sc(train_cfg.norm_input_alpha_schedule),
      'mask_ratio': sc(train_cfg.mask_ratio_schedule),
      'sharp_weights_std': sc(train_cfg.sharp_mask_std_schedule),
      'x_for_rgb_alpha': sc(train_cfg.x_for_rgb_alpha_schedule),
  }


def eval_schedules(schedules: Dict[str, Any], step) -> Dict[str, jnp.ndarray]:
  step = jnp.asarray(step, jnp.float32)
  return {k: fn(step) for k, fn in schedules.items()}


def _freeze_subtree_grads(grads, prefix: str):
  """Zeroes gradients under a top-level key (true freeze; the reference
  instead zeroes the Adam moments each step, training.py:69-94, which does
  not actually freeze — documented deviation, flag is off in all shipped
  configs)."""
  if prefix in grads:
    grads = dict(grads)
    grads[prefix] = jax.tree_util.tree_map(jnp.zeros_like, grads[prefix])
  return grads


def make_loss_fn(model: NerfDSModel, train_cfg: TrainConfig
                 ) -> Callable[..., Tuple[jnp.ndarray, Dict[str, Any]]]:
  """The full multi-level loss (reference _loss_fn, training.py:440-481)."""
  model_cfg = model.config

  def loss_fn(params, batch, key, scalars):
    extra_params = {
        'nerf_alpha': scalars['nerf_alpha'],
        'warp_alpha': scalars['warp_alpha'],
        'hyper_alpha': scalars['hyper_alpha'],
        'hyper_sheet_alpha': scalars['hyper_sheet_alpha'],
        'norm_input_alpha': scalars['norm_input_alpha'],
    }
    key_render, key_bg = jax.random.split(key)
    out = model.render(
        params, batch, key_render, extra_params,
        return_points=True, return_weights=True,
        return_warp_jacobian=train_cfg.use_elastic_loss,
        mask_ratio=scalars['mask_ratio'],
        sharp_weights_std=scalars['sharp_weights_std'],
        x_for_rgb_alpha=scalars['x_for_rgb_alpha'])

    total = 0.0
    stats: Dict[str, Any] = {}
    if 'fine' in out:
      fine_loss, stats['fine'] = losses_lib.compute_loss_and_stats(
          model_cfg, train_cfg, out['fine'], batch, scalars)
      total = total + fine_loss
    coarse_loss, stats['coarse'] = losses_lib.compute_loss_and_stats(
        model_cfg, train_cfg, out['coarse'], batch, scalars,
        use_elastic_loss=train_cfg.use_elastic_loss,
        use_hyper_reg_loss=train_cfg.use_hyper_reg_loss)
    total = total + coarse_loss

    if train_cfg.use_background_loss:
      background_loss = losses_lib.compute_background_loss(
          model, params, key_bg, batch['background_points'], extra_params,
          noise_std=train_cfg.background_noise_std).mean()
      total = total + train_cfg.background_loss_weight * background_loss
      stats['loss/background'] = background_loss

    if train_cfg.log_histograms:
      # Subsampled warped-point distributions for TB histograms
      # (reference train.py:100-127 logs the full [R,S,·] tensors; a
      # strided 2048-sample is statistically equivalent and keeps the
      # step's extra output bytes negligible). Arrays are ignored by the
      # scalar JSONL writer; the trainer routes 'hist/*' entries to
      # MetricWriter.write_histogram.
      level = 'fine' if 'fine' in out else 'coarse'
      o = out[level]
      warped = jax.lax.stop_gradient(o['warped_points'])
      points = jax.lax.stop_gradient(o['points'])
      spatial = warped[..., :3].reshape(-1, 3)
      delta = (warped[..., :3] - points).reshape(-1, 3)
      stride = max(1, spatial.shape[0] // 2048)
      stats['hist/spatial_points'] = spatial[::stride]
      stats['hist/spatial_points_delta'] = delta[::stride]
      if warped.shape[-1] > 3:
        hyper = warped[..., 3:].reshape(-1, warped.shape[-1] - 3)
        stats['hist/hyper_points'] = hyper[::stride]

    return total, stats

  return loss_fn


def _accum_grads(loss_fn, params, batch, key, scalars, accum: int):
  """value_and_grad over a batch, optionally as `accum` scanned
  microbatches with averaged gradients (train_cfg.accum_steps).

  Math-exact vs the monolithic batch — every loss term is a mean over its
  rays/points, so the mean of microbatch gradients IS the full-batch
  gradient (tested) — while peak activation memory scales with the
  MICRObatch: the single-chip route to pod-scale global batches (8192
  monolithic needs 45 G HBM; see scripts/batch_scaling_study.py)."""
  grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
  if accum <= 1:
    (_, stats), grads = grad_fn(params, batch, key, scalars)
    return grads, stats

  def split(x):
    if x.shape[0] % accum:
      raise ValueError(f'batch leading dim {x.shape[0]} not divisible '
                       f'by accum_steps={accum}')
    return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

  micro = jax.tree_util.tree_map(split, batch)
  keys = jax.random.split(key, accum)

  def body(g_sum, xs):
    mb, k = xs
    (_, mb_stats), g = grad_fn(params, mb, k, scalars)
    return jax.tree_util.tree_map(jnp.add, g_sum, g), mb_stats

  zero = jax.tree_util.tree_map(jnp.zeros_like, params)
  grads_sum, stats_stack = jax.lax.scan(body, zero, (micro, keys))
  grads = jax.tree_util.tree_map(lambda g: g / accum, grads_sum)
  # Scalar stats (stacked to [accum]) average; per-sample debug arrays
  # (histograms) keep the last microbatch's snapshot.
  stats = jax.tree_util.tree_map(
      lambda s: s.mean(0) if s.ndim == 1 else s[-1], stats_stack)
  return grads, stats


def make_train_step(model: NerfDSModel, train_cfg: TrainConfig,
                    donate: Optional[bool] = None):
  """Compiled step: (state, batch, key) -> (state, stats).

  Under a Mesh, pass batches sharded over the data axis and replicated state;
  the partitioner inserts the gradient all-reduce.
  """
  schedules = build_schedules(train_cfg)
  loss_fn = make_loss_fn(model, train_cfg)
  if donate is None:
    donate = train_cfg.donate_batch

  accum = max(int(train_cfg.accum_steps), 1)

  def step_fn(state: TrainState, batch, key) -> Tuple[TrainState, Dict]:
    scalars = eval_schedules(schedules, state.step)
    grads, stats = _accum_grads(loss_fn, state.params, batch, key, scalars,
                                accum)
    if train_cfg.disable_hyper_grads:
      grads = _freeze_subtree_grads(grads, 'hyper_sheet')
    if train_cfg.grad_max_val > 0 or train_cfg.grad_max_norm > 0:
      grads = math_ops.clip_gradients(grads, train_cfg.grad_max_val,
                                      train_cfg.grad_max_norm)
    updates, opt_state = optax.scale_by_adam().update(
        grads, state.opt_state, state.params)
    lr = scalars['learning_rate']
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    stats['learning_rate'] = lr
    return new_state, stats

  return jax.jit(step_fn, donate_argnums=(1,) if donate else ())


def make_fused_train_step(model: NerfDSModel, train_cfg: TrainConfig,
                          store: RayStore,
                          background_points: Optional[jnp.ndarray] = None):
  """Step with the minibatch gather fused in: (state, key) -> (state, stats).

  ``store`` must already be device-resident (``RayStore.device_put``). It is
  passed to the jitted step as an ARGUMENT (bound here), not closed over:
  a closed-over device array is inlined into the HLO as a literal constant,
  which some compile services reject or hang on (observed: the axon
  remote-compile path never returns for a multi-MB literal), while an
  argument is a plain parameter. Each iteration is still one XLA launch
  with no host-side data handling — the bound arrays are already committed
  to device so re-passing them is free.
  """
  schedules = build_schedules(train_cfg)
  loss_fn = make_loss_fn(model, train_cfg)
  batch_size = train_cfg.batch_size
  accum = max(int(train_cfg.accum_steps), 1)

  def step_fn(state: TrainState, key, store_dict,
              bg_points) -> Tuple[TrainState, Dict]:
    key_sample, key_loss, key_bg_pts = jax.random.split(key, 3)
    batch = sample_batch(RayStore.from_dict(store_dict), key_sample,
                         batch_size)
    if train_cfg.use_background_loss and bg_points is not None:
      n_bg = min(bg_points.shape[0],
                 train_cfg.background_points_batch_size)
      n_bg -= n_bg % accum  # background points split across microbatches
      idx = jax.random.randint(key_bg_pts, (n_bg,), 0,
                               bg_points.shape[0])
      batch['background_points'] = jnp.take(bg_points, idx, axis=0)
    scalars = eval_schedules(schedules, state.step)
    grads, stats = _accum_grads(loss_fn, state.params, batch, key_loss,
                                scalars, accum)
    if train_cfg.disable_hyper_grads:
      grads = _freeze_subtree_grads(grads, 'hyper_sheet')
    if train_cfg.grad_max_val > 0 or train_cfg.grad_max_norm > 0:
      grads = math_ops.clip_gradients(grads, train_cfg.grad_max_val,
                                      train_cfg.grad_max_norm)
    updates, opt_state = optax.scale_by_adam().update(
        grads, state.opt_state, state.params)
    lr = scalars['learning_rate']
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    stats['learning_rate'] = lr
    return new_state, stats

  jitted = jax.jit(step_fn)
  store_dict = store.as_dict()
  return functools.partial(jitted, store_dict=store_dict,
                           bg_points=background_points)
