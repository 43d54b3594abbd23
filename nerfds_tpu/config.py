"""Typed configuration tree (replaces the reference's gin system).

The reference configures ~60 ``NerfModel`` attributes plus train/eval/spec
dataclasses through gin files (``configs/defaults.gin`` + ``nerf_ds.gin``,
``hypernerf/configs.py``). Here the same knobs are frozen dataclasses —
hashable, so they can be closed over / passed as static args to ``jit`` —
with presets reproducing the shipped configurations:

  * :func:`vanilla_nerf`  — BASELINE config[0]: static NeRF, no warp/hyper.
  * :func:`hypernerf`     — config[1]/[2]: SE(3) warp + bendy-sheet hyper.
  * :func:`nerf_ds`       — config[3]: the full shipped nerf_ds.gin setup.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
  """Static model architecture + feature flags (reference models.py:116-229
  plus the SpecularConfig flags that gate the forward pass)."""
  # NeRF rendering.
  num_coarse_samples: int = 64
  num_fine_samples: int = 64
  use_stratified_sampling: bool = True
  use_white_background: bool = False
  use_linear_disparity: bool = False
  use_sample_at_infinity: bool = True
  noise_std: Optional[float] = None

  # NeRF architecture.
  nerf_trunk_depth: int = 8
  nerf_trunk_width: int = 256
  nerf_rgb_branch_depth: int = 1
  nerf_rgb_branch_width: int = 128
  nerf_skips: Tuple[int, ...] = (4,)
  activation: str = 'relu'
  sigma_activation: str = 'softplus'
  # Parameter-free hidden-layer norm for the NeRF trunk/rgb branch
  # (reference models.py:359 `norm_type` via modules.py:30-41
  # `get_norm_layer`): None | 'layer' | 'group' | 'batch'. Off in all
  # shipped configs, matching the reference.
  norm_type: Optional[str] = None
  use_viewdirs: bool = True

  # Positional encodings.
  spatial_point_min_deg: int = 0
  spatial_point_max_deg: int = 8
  hyper_point_min_deg: int = 0
  hyper_point_max_deg: int = 1
  viewdir_min_deg: int = 0
  viewdir_max_deg: int = 4
  use_posenc_identity: bool = False

  # Appearance/camera metadata conditions (HyperNeRF "nerf embed").
  use_nerf_embed: bool = False
  nerf_embed_key: str = 'appearance'
  nerf_embed_dims: int = 8
  use_alpha_condition: bool = False
  use_rgb_condition: bool = False

  # Warp field.
  use_warp: bool = False
  warp_field_type: str = 'se3'  # 'se3' | 'dual_quaternion' | 'translation'
  warp_embed_key: str = 'warp'
  warp_embed_dims: int = 8
  warp_min_deg: int = 0
  warp_max_deg: int = 8
  se3_trunk_depth: int = 6
  se3_trunk_width: int = 128
  se3_skips: Tuple[int, ...] = (4,)

  # Skeleton (bone) warp alternative (reference use_bone, models.py:225;
  # off in every shipped config).
  use_bone: bool = False
  num_bones: int = 3
  bone_trunk_depth: int = 4
  bone_trunk_width: int = 32
  bone_moving_mlp_depth: int = 6
  bone_moving_mlp_width: int = 128

  # Hyper (ambient) slicing.
  hyper_slice_method: str = 'none'    # 'none' | 'axis_aligned_plane' | 'bendy_sheet'
  hyper_num_dims: int = 2
  hyper_embed_key: str = 'warp'
  hyper_embed_dims: int = 8
  hyper_use_warp_embed: bool = True
  hyper_sheet_min_deg: int = 0
  hyper_sheet_max_deg: int = 6
  hyper_sheet_depth: int = 6
  hyper_sheet_width: int = 64
  hyper_sheet_skips: Tuple[int, ...] = (4,)
  use_hyper_for_sigma: bool = True
  use_hyper_for_rgb: bool = False

  # Screw-axis rgb conditioning (SpecularConfig.screw_input_mode:
  # None | 'rotation' (w only) | 'full' (w ⊕ v)).
  screw_input_mode: Optional[str] = None

  # Hyper-c: ambient coordinates for the COLOR branch, predicted from
  # (points, viewdirs[, normals]) by a separate sheet MLP
  # (reference models.py:189-196, 672-708, 1168-1190).
  use_hyper_c: bool = False
  hyper_c_hyper_input: bool = False
  use_hyper_c_embed: bool = True
  hyper_c_num_dims: int = 2
  hyper_c_embed_dims: int = 8

  # Surface normals / specular branch.
  predict_norm: bool = False
  norm_supervision_type: str = 'warped'  # warped | canonical | direct | canonical_unwarped
  stop_norm_gradient: bool = True
  norm_input_posenc: bool = True
  norm_input_min_deg: int = 0
  norm_input_max_deg: int = 4
  use_sigma_gradient: bool = False       # SpecularConfig.use_sigma_gradient
  use_predicted_norm: bool = False       # SpecularConfig.use_predicted_norm
  use_ref_radiance: bool = False
  use_x_in_rgb_condition: bool = False
  window_x_in_rgb_condition: bool = False
  use_delta_x_in_rgb_condition: bool = False
  x_for_rgb_min_deg: int = 0
  x_for_rgb_max_deg: int = 4

  # Mask guidance.
  use_mask_in_warp: bool = False
  use_mask_in_hyper: bool = False
  use_mask_in_rgb: bool = False
  use_predicted_mask: bool = False
  use_mask_embed: bool = True
  use_3d_mask: bool = False
  mask_embed_dims: int = 8
  mask_mlp_depth: int = 6
  mask_mlp_width: int = 64
  mask_min_deg: int = 0
  mask_max_deg: int = 6
  mask_skips: Tuple[int, ...] = (4,)
  mask_output_activation: Optional[str] = 'relu'
  clamp_predicted_mask: bool = False
  # Clamp ceiling for the predicted 3D mask when clamp_predicted_mask
  # (reference hardcodes threshold = 0.2 at models.py:972).
  predicted_mask_clamp_threshold: float = 0.2
  use_coarse_depth_for_mask: bool = False
  use_mask_scaled_weights: bool = False
  use_mask_sharp_weights: bool = False
  use_rgb_sharp_weights: bool = False

  # Numerics.
  matmul_precision: Optional[str] = None  # None (fast) | 'highest' (parity)
  # Compute dtype for the MLP stacks: None keeps f32 everywhere (parity);
  # 'bfloat16' runs dense layers with bf16 activations/residuals — the step
  # is HBM-bandwidth-bound (XLA cost analysis: ~165 GB/step at batch 2048 =
  # ~100%% of v5e bandwidth), so halving activation bytes is the main lever.
  # Geometry (posenc, SE(3), compositing) stays f32.
  compute_dtype: Optional[str] = None
  # Restrict bf16 compute to a subset of subnetworks (None = all). Zones:
  # 'warp', 'hyper', 'mask', 'trunk', 'rgb'. Blanket bf16 costs ~7 dB of
  # novel-time PSNR (BENCHMARKS.md); zoned bf16 keeps the precision-critical
  # geometry MLPs (warp/hyper) f32 while the wide trunk/rgb stacks run bf16.
  bf16_zones: Optional[Tuple[str, ...]] = None
  # Narrow dtype for STORED MLP activations only ('bfloat16' | None):
  # activations are round-tripped through bf16 between layers so the HBM
  # buffers (forward activations + the backward residuals read from them)
  # are half-width, while weights and matmul accumulation stay f32. The step
  # is residual-DMA-bound (round-2 profile), so this attacks the measured
  # bottleneck with far less quality risk than bf16 *compute*
  # (see models/mlp.py:quantize_storage). Ignored in zones already running
  # bf16 compute.
  storage_dtype: Optional[str] = None
  # Restrict storage quantisation to a subset of
  # {'warp', 'hyper', 'mask', 'trunk', 'rgb'} (None = all zones).
  storage_zones: Optional[Tuple[str, ...]] = None
  use_pallas_compositing: bool = False
  # How to compute the batched per-point ∇σ (measured on v5e, full config,
  # batch 2048, chained timing):
  #  'vmap' — vmap(value_and_grad) per point with the screw shared
  #           downstream. One batched reverse pass; the vmap-shaped graph
  #           both compiles and is fastest (120 ms/step). DEFAULT.
  #  'jvp'  — jax.linearize + 3 basis tangents (163 ms; reverse-over-forward
  #           outer AD — kept as a fallback for toolchains where the
  #           reverse-over-reverse graphs miscompile).
  #  'vjp'  — ones-cotangent pullback of Σσ (currently SIGILLs the XLA TPU
  #           fusion cost model; equivalent math to 'vmap').
  #  'naive'— 'vmap' plus the reference's 4x warp-field re-evaluation
  #           (models.py:1065-1073,1126,1276,1294-1300), for A/B
  #           benchmarking (136 ms).
  sigma_gradient_mode: str = 'vmap'
  # Materialise concat->Dense inputs instead of the split-weight matmul form
  # (reproduces the reference's op graph; used by the 'naive' A/B baseline).
  concat_dense_inputs: bool = False
  # Rematerialise the σ path in the outer backward (jax.checkpoint): trades
  # recompute for dropping the large [R·S, width] activation residuals. This
  # is a MEMORY win (fits batch 4096+ where the default OOMs) that currently
  # LOSES throughput — measured round 2 (BENCHMARKS.md): 141.7 ('dots') and
  # 126.2 ms/step ('nothing') vs 103.2 baseline, because the recompute also
  # round-trips HBM. Enable only to fit larger batches.
  remat_sigma: bool = False
  # Which residuals the σ-path checkpoint may still save:
  #  'dots'    — matmul outputs with batch dims excluded (memory win only)
  #  'nothing' — recompute everything from the [N,3] points (max DMA win)
  remat_policy: str = 'nothing'
  # Narrow remat of the FEEDER only (warp field + hyper sheet + posenc):
  # the outer backward recomputes them from the [N,3] points instead of
  # loading their saved activations from HBM; the trunk (whose remat lost,
  # round 2) is NOT included. Round-5 measured run at the DMA wall — see
  # BENCHMARKS "single-chip envelope".
  remat_feat: bool = False
  # Speed mode (non-parity): stop-gradient ∇σ before it feeds the normal
  # supervision target. The reference differentiates through ∇σ
  # (second-order AD); stopping it makes the norm loss first-order — the
  # predicted normal still chases the density gradient, but the density is
  # no longer shaped by the normal loss. ~25% faster steps.
  stop_target_norm_gradient: bool = False
  # Speed mode (approximation, quality-gated in BENCHMARKS.md): compute the
  # ∇σ normal-supervision target only at the k highest-weight samples per
  # ray (static top-k over stop-gradient'd rendering weights) instead of at
  # every sample. The reference evaluates the per-point value_and_grad at
  # ALL samples (models.py:1065-1073) although the norm loss is weighted by
  # the rendering weights, so low-weight samples pay full second-order AD
  # cost for a near-zero loss contribution. The main σ forward still covers
  # every sample; only the expensive grad+second-order path is restricted.
  # None (default) = exact reference behaviour. Only active for
  # use_predicted_norm with norm_supervision_type in ('warped', 'direct')
  # and sigma_gradient_mode in ('vmap', 'naive').
  norm_grad_topk: Optional[int] = None

  def __post_init__(self):
    if self.norm_grad_topk is not None and self.norm_grad_topk < 1:
      raise ValueError(
          f'norm_grad_topk must be >= 1 or None, got {self.norm_grad_topk} '
          '(it is a top-k sample count passed to lax.top_k)')

  # -- derived --------------------------------------------------------------

  @property
  def norm_grad_topk_active(self) -> bool:
    """Whether the configured ``norm_grad_topk`` speed mode can take effect.

    The top-k restriction only applies when the ∇σ is purely a supervision
    TARGET (``predict_norm`` without ``use_sigma_gradient``), the
    supervision happens in a frame where restriction is sound
    ('warped'/'direct'), and the gradient mode materialises per-sample
    grads ('vmap'/'naive'). Outside those conditions the model silently
    runs the exact path; NerfDSModel warns at construction."""
    return bool(
        self.norm_grad_topk
        and self.predict_norm
        and not self.use_sigma_gradient
        and self.norm_supervision_type in ('warped', 'direct')
        and self.sigma_gradient_mode in ('vmap', 'naive'))

  @property
  def has_hyper(self) -> bool:
    return self.hyper_slice_method != 'none'

  @property
  def needs_sigma_gradient(self) -> bool:
    """∇σ is needed as the normal itself or as the prediction target.

    The reference computes it unconditionally (models.py:1065-1073) even for
    configs that never read it; we compute it only when something consumes it.
    """
    return self.use_sigma_gradient or self.predict_norm

  @property
  def num_total_samples(self) -> int:
    n = self.num_coarse_samples
    if self.num_fine_samples > 0:
      n += self.num_fine_samples  # merged+sorted with coarse z
    return n


@dataclasses.dataclass(frozen=True)
class TrainConfig:
  """Training loop configuration (reference configs.py TrainConfig +
  SpecularConfig loss switches; schedule fields take reference-style schedule
  configs — see training/schedules.py)."""
  batch_size: int = 512
  max_steps: int = 250000
  lr_schedule: Any = ('exponential', 1e-3, 1e-5, 250000)
  nerf_alpha_schedule: Any = ('constant', 8)
  warp_alpha_schedule: Any = ('constant', 8)
  hyper_alpha_schedule: Any = ('constant', 1)
  hyper_sheet_alpha_schedule: Any = ('constant', 6)

  use_elastic_loss: bool = False
  elastic_loss_weight_schedule: Any = ('constant', 0.01)
  elastic_reduce_method: str = 'weight'
  elastic_loss_type: str = 'log_svals'
  use_background_loss: bool = False
  background_loss_weight: float = 0.0
  background_noise_std: float = 0.001
  background_points_batch_size: int = 16384
  use_warp_reg_loss: bool = False
  warp_reg_loss_weight: float = 0.0
  warp_reg_loss_alpha: float = -2.0
  warp_reg_loss_scale: float = 0.001
  use_hyper_reg_loss: bool = False
  hyper_reg_loss_weight: float = 0.0

  # Specular / norm losses.
  norm_loss_weight_schedule: Any = ('constant', 0.001)
  norm_input_alpha_schedule: Any = ('constant', 4)
  use_back_facing_reg: bool = False
  back_facing_reg_weight: float = 0.0
  use_shrinkage_loss: bool = False

  # Mask losses.
  predicted_mask_loss_weight: float = 1.0
  # Weight of the empty-space term folded into the 2D mask loss (reference
  # hardcodes 0.003 at training.py:380).
  empty_space_mask_loss_weight: float = 0.003
  mask_ratio_schedule: Any = ('constant', 1.0)
  use_mask_occlusion_reg_loss: bool = False
  mask_occlusion_reg_loss_weight: float = 1.0
  sharp_mask_std_schedule: Any = ('constant', 1.0)
  x_for_rgb_alpha_schedule: Any = ('constant', 4.0)

  disable_hyper_grads: bool = False
  grad_max_val: float = 0.0
  grad_max_norm: float = 0.0

  save_every: int = 1000
  print_every: int = 100
  log_every: int = 100
  random_seed: int = 0

  # Observability (reference train.py:100-127 histograms,
  # training.py:374-391 + utils.py:500-504 percentile stats).
  # Percentiles of alpha / predicted 3D mask as 'percentile/*' scalars.
  log_percentiles: bool = True
  # Subsampled warped-point/delta/hyper distributions exported from the
  # step as 'hist/*' arrays for TB histograms (trainer writes them).
  log_histograms: bool = True

  # TPU-native extras (no reference equivalent).
  donate_batch: bool = True
  # Gradient accumulation: split each batch into `accum_steps` microbatches
  # scanned sequentially, averaging gradients before the single Adam
  # update. Math-exact vs the full batch (every loss term is a per-ray /
  # per-point mean; tested) while peak activation memory scales with the
  # MICRObatch: batch 8192 x 128 samples needs 45.19 G HBM monolithic
  # (26.3 G even with full remat). Supported by both step paths (fused
  # gather and explicit batch).
  accum_steps: int = 1

  def __post_init__(self):
    # Schedule configs may arrive as dicts/lists from JSON; freeze to tuples
    # so the dataclass stays hashable for jit static closure.
    for f in dataclasses.fields(self):
      v = getattr(self, f.name)
      if isinstance(v, (dict, list)):
        object.__setattr__(self, f.name, _freeze(v))


def _freeze(v):
  if isinstance(v, dict):
    return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
  if isinstance(v, (list, tuple)):
    return tuple(_freeze(x) for x in v)
  return v


@dataclasses.dataclass(frozen=True)
class EvalConfig:
  """Evaluation/render configuration (reference configs.py EvalConfig)."""
  eval_once: bool = False
  save_output: bool = True
  chunk: int = 8192
  num_val_eval: Optional[int] = 10
  num_train_eval: Optional[int] = 10
  num_test_eval: Optional[int] = 10
  subname: str = ''
  max_render_checkpoints: int = 3


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
  """Run identity: dataset + model + train + eval (reference configs.py)."""
  data_dir: str = ''
  image_scale: int = 1
  random_seed: int = 0
  datasource_type: str = 'nerfies'  # 'nerfies' | 'interp' | 'synthetic'
  interp_interval: int = 4          # for 'interp' datasources
  synthetic_frames: int = 8         # for 'synthetic' datasources
  synthetic_image_size: int = 64


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------


def vanilla_nerf(num_coarse_samples: int = 64,
                 num_fine_samples: int = 0) -> ModelConfig:
  """Static NeRF: no warp, no hyper, no masks (BASELINE config[0])."""
  return ModelConfig(
      num_coarse_samples=num_coarse_samples,
      num_fine_samples=num_fine_samples,
      use_warp=False,
      hyper_slice_method='none',
  )


def hypernerf(use_hyper: bool = True) -> ModelConfig:
  """HyperNeRF-style deformation (+optional ambient slicing), per base.gin."""
  return ModelConfig(
      use_warp=True,
      warp_max_deg=8,
      hyper_slice_method='bendy_sheet' if use_hyper else 'none',
      hyper_num_dims=2,
  )


def nerf_ds() -> ModelConfig:
  """The full shipped NeRF-DS configuration (configs/nerf_ds.gin)."""
  return ModelConfig(
      num_coarse_samples=64,
      num_fine_samples=64,
      spatial_point_min_deg=0,
      spatial_point_max_deg=8,
      hyper_point_min_deg=0,
      hyper_point_max_deg=1,
      use_posenc_identity=False,
      use_warp=True,
      warp_min_deg=0,
      warp_max_deg=4,
      hyper_slice_method='bendy_sheet',
      hyper_num_dims=2,
      hyper_use_warp_embed=True,
      hyper_sheet_min_deg=0,
      hyper_sheet_max_deg=6,
      predict_norm=True,
      norm_supervision_type='warped',
      use_predicted_norm=True,
      use_x_in_rgb_condition=True,
      use_mask_in_warp=True,
      use_mask_in_hyper=True,
      use_predicted_mask=True,
      use_3d_mask=True,
      use_mask_sharp_weights=True,
      mask_mlp_depth=8,
      mask_mlp_width=128,
      mask_output_activation='relu',
  )


def nerf_ds_fast() -> ModelConfig:
  """NeRF-DS with the `norm_grad_topk=16` speed mode: the ∇σ
  normal-supervision target restricted to the 16 highest-weight
  samples/ray. Measured (BENCHMARKS.md rounds 4-5): +6.3% training
  throughput at batch 2048 / −18% wall at batch 1024, for a mean
  novel-time PSNR cost ≤~0.5 dB over 3 paired seeds (never flips a run
  into the collapsed-warp basin; k≤12 does and is not offered). Not
  bit-parity with the reference math — use `nerf_ds()` for golden-parity
  work."""
  return dataclasses.replace(nerf_ds(), norm_grad_topk=16)


def nerf_ds_train_config(max_steps: int = 250000,
                         batch_size: int = 512,
                         scale_schedules: bool = False) -> TrainConfig:
  """Training losses/schedules of configs/nerf_ds.gin.

  ``scale_schedules=True`` compresses every schedule horizon by
  ``max_steps / 250000`` so a shorter run traverses the SAME annealing
  trajectory (warp alpha, mask sharpening, x-for-rgb windows) the shipped
  250k-step recipe does; with the default False the horizons stay at the
  gin constants (reference parity — a short reference run barely anneals).
  """
  r = max_steps / 250000 if scale_schedules else 1.0

  def s(steps: int) -> int:
    return max(int(round(steps * r)), 1)

  return TrainConfig(
      batch_size=batch_size,
      max_steps=max_steps,
      lr_schedule=('exponential', 1e-3, 1e-5, max_steps),
      nerf_alpha_schedule=('constant', 8),
      warp_alpha_schedule=('linear', 0, 4, s(50000)),
      hyper_alpha_schedule=('constant', 1),
      hyper_sheet_alpha_schedule=('constant', 6),
      use_warp_reg_loss=True,
      warp_reg_loss_weight=0.001,
      norm_loss_weight_schedule=('constant', 0.001),
      norm_input_alpha_schedule=(
          'piecewise', (
              (s(10000), ('constant', 0.0)),
              (0, ('linear', 0.0, 4.0, s(2000))),
          )),
      use_back_facing_reg=True,
      back_facing_reg_weight=0.1,
      predicted_mask_loss_weight=0.1,
      mask_ratio_schedule=('constant', 1.0),
      sharp_mask_std_schedule=(
          'piecewise', (
              (s(30000), ('exponential', 1.0, 0.1, s(30000))),
              (s(220000), ('constant', 0.1)),
          )),
      x_for_rgb_alpha_schedule=(
          'piecewise', (
              (s(50000), ('constant', 0.0)),
              (s(50000), ('linear', 0.0, 4.0, s(50000))),
              (s(150000), ('constant', 4.0)),
          )),
  )


def nerf_ds_pod(num_chips: int = 16,
                per_chip_batch: int = 512,
                max_steps: Optional[int] = None) -> Tuple[ModelConfig,
                                                          TrainConfig]:
  """Pod-scale preset: the validated large-batch recipe (BENCHMARKS
  round 5, `scripts/batch_scaling_study.py`).

  Global batch = num_chips x per_chip_batch; lr scales from the
  reference's (1e-3 @ 512) by ``min(batch/512, 4)`` with a 5%-of-steps
  linear warmup. The cap is measured, not guessed: at 4x batch the
  linear rule (peak 4e-3) won both paired seeds (+3.6 dB mean vs the 512
  control at equal ray budget) while sqrt lost; at 16x batch linear
  (1.6e-2) DIVERGED on one seed and lost the other, while the 4e-3 peak
  (sqrt at 16x) won both (+8.5/+0.7 dB). The optimum absolute peak lr on
  this objective is ~4e-3 — scale linearly toward it, then hold. Steps
  shrink by batch/512 so the total ray budget matches the reference's
  250k x 512 recipe. Model config is the shipped `nerf_ds()`; on a pod
  each chip sees only per_chip_batch rays so memory is per-chip-normal;
  for SINGLE-chip experiments at batch >= 4096 set `train.accum_steps`
  (monolithic 8192 is a 45 G compile-time OOM).
  """
  batch = num_chips * per_chip_batch
  k = batch / 512
  f = min(k, 4.0)
  if max_steps is None:
    max_steps = max(int(round(250000 / k)), 1)
  lr0, lr1 = 1e-3 * f, 1e-5 * f
  warmup = max(max_steps // 20, 1)
  base = nerf_ds_train_config(max_steps=max_steps, batch_size=batch,
                              scale_schedules=True)
  train_cfg = dataclasses.replace(
      base,
      lr_schedule=('piecewise', (
          (warmup, ('linear', lr0 / 10.0, lr0, warmup)),
          (max_steps - warmup,
           ('exponential', lr0, lr1, max_steps - warmup)),
      )))
  return nerf_ds(), train_cfg


def to_json(cfg) -> str:
  return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)


def model_config_from_dict(d: Dict[str, Any]) -> ModelConfig:
  d = dict(d)
  for key in ('nerf_skips', 'se3_skips', 'hyper_sheet_skips', 'mask_skips',
              'bf16_zones', 'storage_zones'):
    if key in d and d[key] is not None:
      d[key] = tuple(d[key])
  return ModelConfig(**d)
