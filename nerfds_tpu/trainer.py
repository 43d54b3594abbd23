"""Experiment orchestration (L7): the end-to-end training driver.

Replaces the reference's ``train.py`` (:145-466): datasource → ray store →
mesh placement → fused train step → checkpoints/metrics. Steady-state host
work per step is a single dispatch of one XLA program (schedules, minibatch
gather, forward/backward, all-reduce, Adam all compiled in); stats come back
only on logging steps.
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfds_tpu import config as config_lib
from nerfds_tpu.datasets.core import DataSource, RayStore
from nerfds_tpu.evaluation import metrics as metrics_lib
from nerfds_tpu.evaluation.render import render_image
from nerfds_tpu.models.nerfds import NerfDSModel, default_extra_params
from nerfds_tpu.parallel import mesh as mesh_lib
from nerfds_tpu.training import checkpoints as ckpt_lib
from nerfds_tpu.training.step import (TrainState, build_schedules,
                                      eval_schedules, make_fused_train_step)


class TimeTracker:
  """Wall-clock meters (reference utils.py:362-435)."""

  def __init__(self):
    self._sums: Dict[str, float] = {}
    self._counts: Dict[str, int] = {}
    self._marks: Dict[str, float] = {}

  def tic(self, *keys):
    now = time.time()
    for k in keys:
      self._marks[k] = now

  def toc(self, *keys):
    now = time.time()
    for k in keys:
      self._sums[k] = self._sums.get(k, 0.0) + now - self._marks.pop(k)
      self._counts[k] = self._counts.get(k, 0) + 1

  def summary(self) -> Dict[str, float]:
    out = {k: self._sums[k] / max(self._counts[k], 1) for k in self._sums}
    if 'total' in out and out['total'] > 0:
      out['steps_per_sec'] = 1.0 / out['total']
    return out

  def reset(self):
    self._sums.clear()
    self._counts.clear()


@dataclasses.dataclass
class Trainer:
  """Builds and runs a training experiment.

  sampling: 'fused' gathers the minibatch on device inside the step jit
  (zero steady-state host work); 'host' samples numpy batches in a
  background thread and feeds the explicit-batch step (the robust fallback,
  also the right mode for ray stores larger than HBM); 'auto' (default)
  picks 'host' only when the device platform reports 'axon' (an early
  tunnel build whose runtime crashed on the in-jit gather; the current
  tunnel reports plain 'tpu' and runs 'fused' fine — the round-5 20k-step
  vrig production run trained through the fused gather) and 'fused'
  everywhere else. Both step paths support train_cfg.accum_steps.
  """
  model: NerfDSModel
  train_cfg: config_lib.TrainConfig
  datasource: DataSource
  exp_dir: Optional[Path] = None
  use_mesh: bool = True
  sampling: str = 'auto'

  def __post_init__(self):
    if self.sampling == 'auto':
      self.sampling = ('host' if jax.devices()[0].platform == 'axon'
                       else 'fused')
    self.mesh = mesh_lib.create_mesh() if self.use_mesh else None
    if self.exp_dir is not None:
      self.exp_dir = Path(self.exp_dir)
      self.exp_dir.mkdir(parents=True, exist_ok=True)
      (self.exp_dir / 'model_config.json').write_text(
          config_lib.to_json(self.model.config))
      (self.exp_dir / 'train_config.json').write_text(
          config_lib.to_json(self.train_cfg))
    self.ckpt = (ckpt_lib.CheckpointManager(self.exp_dir / 'checkpoints')
                 if self.exp_dir is not None else None)
    if self.exp_dir is not None:
      from nerfds_tpu.training.logging import MetricWriter
      self.metrics_writer = MetricWriter(self.exp_dir / 'summaries')
    else:
      self.metrics_writer = None
    # Compiled-step caches (see train()): avoid a full retrace + XLA
    # compile per train() segment when interleaving training with evals.
    self._fused_step_cache = None
    self._explicit_step_cache = None

  # -- setup ----------------------------------------------------------------

  @classmethod
  def from_experiment(cls, model_cfg: config_lib.ModelConfig,
                      train_cfg: config_lib.TrainConfig,
                      datasource: DataSource,
                      exp_dir=None, use_mesh: bool = True,
                      sampling: str = 'auto') -> 'Trainer':
    embeddings = datasource.embeddings_dict
    num_warp = max(embeddings.get('warp', [0])) + 1
    num_appearance = max(embeddings.get('appearance', [0])) + 1
    model = NerfDSModel(
        config=model_cfg,
        num_warp_embeds=num_warp,
        num_hyper_embeds=num_warp,
        num_nerf_embeds=num_appearance,
        near=datasource.near, far=datasource.far)
    return cls(model=model, train_cfg=train_cfg, datasource=datasource,
               exp_dir=Path(exp_dir) if exp_dir else None,
               use_mesh=use_mesh, sampling=sampling)

  def build_store(self) -> RayStore:
    # Multi-process: each host loads only its contiguous item chunk; the
    # sharded device_put below assembles the global array from the chunks.
    store = self.datasource.build_ray_store(self.datasource.train_ids,
                                            process_local=True)
    if self.sampling == 'host':
      return store  # stays in host RAM; HostRayIterator feeds the device
    sharding = (mesh_lib.batch_sharding(self.mesh)
                if self.mesh is not None else None)
    return store.device_put(sharding)

  def init_state(self, seed: int = 0) -> TrainState:
    # jit the init: eager per-op dispatch over a tunneled TPU backend takes
    # ~40 s (and can wedge the remote compile queue); compiled it is one
    # program.
    params = jax.jit(self.model.init)(jax.random.PRNGKey(seed))
    state = TrainState.create(params)
    if self.mesh is not None:
      state = jax.device_put(state,
                             mesh_lib.replicated_sharding(self.mesh))
    return state

  # -- the loop -------------------------------------------------------------

  def train(self, num_steps: Optional[int] = None,
            state: Optional[TrainState] = None,
            log_fn: Optional[Callable[[int, Dict[str, Any]], None]] = None,
            store: Optional[RayStore] = None) -> TrainState:
    cfg = self.train_cfg
    num_steps = num_steps if num_steps is not None else cfg.max_steps
    if store is None:
      store = self.build_store()
    background_points = None
    if cfg.use_background_loss:
      pts = self.datasource.load_points(shuffle=True)
      if pts is not None:
        background_points = jnp.asarray(pts)
    if state is None:
      state = self.init_state(cfg.random_seed)
    if self.ckpt is not None:
      state, restored_step = self.ckpt.restore(state)
    host_iter = None
    if self.sampling == 'host':
      from nerfds_tpu.datasets.core import HostRayIterator
      from nerfds_tpu.training.step import make_train_step
      sharding = (mesh_lib.batch_sharding(self.mesh)
                  if self.mesh is not None else None)
      host_iter = HostRayIterator(store, cfg.batch_size,
                                  seed=cfg.random_seed, sharding=sharding)
      bg_host = (np.asarray(background_points)
                 if background_points is not None else None)
      bg_rng = np.random.RandomState(cfg.random_seed + 31)
      if self._explicit_step_cache is None:
        self._explicit_step_cache = make_train_step(self.model, cfg,
                                                    donate=False)
      explicit_step = self._explicit_step_cache

      def step_fn(state, key):
        batch = next(host_iter)
        if cfg.use_background_loss and bg_host is not None:
          n_bg = min(bg_host.shape[0], cfg.background_points_batch_size)
          idx = bg_rng.randint(0, bg_host.shape[0], n_bg)
          batch['background_points'] = jnp.asarray(bg_host[idx])
        return explicit_step(state, batch, key)
    else:
      # Cache the compiled fused step across train() calls: callers that
      # interleave training with evals (convergence curves, eval-every-N
      # loops) would otherwise rebuild the closure each call, and a fresh
      # function identity forces a full retrace + XLA compile (~minutes on
      # the production architecture) per segment.
      cache_key = (id(store),
                   id(background_points) if background_points is not None
                   else None)
      if self._fused_step_cache and self._fused_step_cache[0] == cache_key:
        step_fn = self._fused_step_cache[1]
      else:
        step_fn = make_fused_train_step(self.model, cfg, store,
                                        background_points)
        self._fused_step_cache = (cache_key, step_fn)

    base_key = jax.random.PRNGKey(cfg.random_seed + 17)
    tracker = TimeTracker()
    init_step = int(jax.device_get(state.step))
    stats = None
    for step in range(init_step, num_steps):
      tracker.tic('total')
      key = jax.random.fold_in(base_key, step)
      state, stats = step_fn(state, key)
      if (step + 1) % cfg.print_every == 0 or step + 1 == num_steps:
        stats_host = jax.device_get(stats)
        # Route 'hist/*' array entries (subsampled warped-point
        # distributions from the step) to TB histograms; scalars go to
        # JSONL+TB as before (reference train.py:100-127 _log_histograms).
        hists = {}
        for level in list(stats_host):
          sub = stats_host[level]
          if isinstance(sub, dict):
            for k in [k for k in sub if k.startswith('hist/')]:
              hists[f'{level}/{k[5:]}'] = sub.pop(k)
          elif level.startswith('hist/'):
            hists[level[5:]] = stats_host.pop(level)
        tracker.toc('total')
        if log_fn is not None:
          log_fn(step + 1, {'stats': stats_host,
                            'time': tracker.summary()})
        if self.metrics_writer is not None:
          self.metrics_writer.write_scalars(
              step + 1, {'train': stats_host, 'time': tracker.summary()})
          for tag, values in hists.items():
            self.metrics_writer.write_histogram(step + 1, tag, values)
          # Embedding histograms (reference train.py:100-117).
          params_host = None
          for embed_key in ('warp_embed', 'hyper_embed', 'mask_embed'):
            if embed_key in state.params:
              if params_host is None:
                params_host = jax.device_get(
                    {k: state.params[k] for k in
                     ('warp_embed', 'hyper_embed', 'mask_embed')
                     if k in state.params})
              self.metrics_writer.write_histogram(
                  step + 1, embed_key.replace('_embed', '_embedding'),
                  params_host[embed_key]['embedding'])
        tracker.reset()
      else:
        tracker.toc('total')
      if self.ckpt is not None and (step + 1) % cfg.save_every == 0:
        jax.block_until_ready(state.params)
        self.ckpt.save(step + 1, jax.device_get(state))
    if self.ckpt is not None and num_steps % cfg.save_every != 0:
      self.ckpt.save(num_steps, jax.device_get(state))
    if host_iter is not None:
      host_iter.close()
    return state

  # -- evaluation -----------------------------------------------------------

  def eval_psnr(self, state: TrainState, item_ids=None,
                chunk: int = 8192, masked: bool = False) -> Dict[str, float]:
    """Renders held-out views and computes the reference metric set.

    masked=True adds 'masked_psnr': PSNR restricted to foreground
    (moving-object) pixels — the NeRF-DS phenomenon lives on the specular
    moving object, and whole-image PSNR dilutes it with static background.
    """
    if item_ids is None:
      item_ids = self.datasource.val_ids or self.datasource.train_ids[:1]
    schedules = build_schedules(self.train_cfg)
    scalars = eval_schedules(schedules, state.step)
    extra = dict(default_extra_params(self.model.config))
    for k in ('nerf_alpha', 'warp_alpha', 'hyper_alpha', 'hyper_sheet_alpha',
              'norm_input_alpha'):
      extra[k] = scalars[k]
    results = []
    for item_id in item_ids:
      item = self.datasource.load_item(item_id)
      rays = {k: item[k] for k in ('origins', 'directions', 'mask')}
      rays['metadata'] = {k: v[:1, :1].reshape(1, -1)
                         for k, v in item['metadata'].items()}
      # keys=('rgb',): each returned key costs a device->host fetch per
      # chunk (~31 ms RTT over the tunneled backend); PSNR/SSIM only
      # consume rgb, so fetching the full debug set would 11x the eval
      # wall time on remote devices.
      out = render_image(self.model, state.params, rays,
                         jax.random.PRNGKey(0), extra, chunk=chunk,
                         mesh=self.mesh, keys=('rgb',))
      m = metrics_lib.compute_all(out['rgb'], item['rgb'])
      if masked:
        fg = np.asarray(item['mask'])[..., 0] > 0.5
        if fg.any():
          err = (np.asarray(out['rgb']) - item['rgb'])[fg]
          mse = float(np.mean(err ** 2))
          m['masked_psnr'] = -10.0 * float(np.log10(max(mse, 1e-12)))
      results.append(m)
    keys = results[0].keys()
    return {k: float(np.mean([r[k] for r in results if k in r]))
            for k in keys}
