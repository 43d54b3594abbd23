"""Specular synthetic scene: view-dependent GT + trainability gate.

The NeRF-DS raison d'être is dynamic SPECULAR surfaces (reference
README.md:1-12). ``SyntheticDataSource(specular=True)`` gives the moving
sphere a Blinn-Phong highlight from its analytic normal, so the radiance
genuinely depends on (normal, viewdir) and the normal/reflection machinery
is load-bearing rather than gradient-flow-only.

The training gate here pins the failure mode actually observed while
tuning the scene: with an overly dark object the full NeRF-DS config
collapses into an opaque black fog (acc≈1, rgb≈0 — train PSNR ~15 dB) that
no amount of further training escapes. A healthy run reaches >30 dB on
train views by 500 steps. Normal-*accuracy* and the normals-vs-no-normals
quality comparison need production scale (see BENCHMARKS.md long-horizon
runs); at CI scale ∇σ normals are not yet clean, so they are not gated
here — the normal/reflection math itself is guarded structurally by
`test_reference_full_model_parity.py`.
"""
import dataclasses

import jax
import numpy as np
import pytest

from nerfds_tpu import config as config_lib
from nerfds_tpu.datasets.synthetic import (SyntheticDataSource, _LIGHT_DIR,
                                           _sphere_center, field)
from nerfds_tpu.trainer import Trainer


def test_specular_field_is_view_dependent():
  """Same point, same time, different viewdir -> different radiance on the
  moving sphere (the property the non-specular scene lacked)."""
  t = 0.3
  center = _sphere_center(t)
  # A point on the sphere surface facing the light.
  n = _LIGHT_DIR / np.linalg.norm(_LIGHT_DIR)
  p = (center + 0.1 * n)[None]
  v1 = np.asarray([[0.0, 0.0, 1.0]], np.float32)
  # Mirror-ish direction: view such that half-vector aligns with normal.
  v2 = -n[None].astype(np.float32)
  _, c1 = field(p, t, viewdirs=v1, specular=True)
  _, c2 = field(p, t, viewdirs=v2, specular=True)
  assert np.abs(c1 - c2).max() > 0.2, (c1, c2)
  # Non-specular scene: no view dependence at all.
  _, d1 = field(p, t, viewdirs=v1, specular=False)
  _, d2 = field(p, t, viewdirs=v2, specular=False)
  np.testing.assert_array_equal(d1, d2)


def test_specular_scene_gt_has_moving_highlight():
  """The rendered GT highlight moves between frames (dynamic specular)."""
  src = SyntheticDataSource(num_frames=8, image_size=32, gt_samples=96,
                            specular=True)
  a = src.load_rgb(src.train_ids[0])
  b = src.load_rgb(src.train_ids[2])
  # Bright-pixel sets differ between times.
  bright_a = (a.max(-1) > 0.8)
  bright_b = (b.max(-1) > 0.8)
  assert bright_a.sum() > 3 and bright_b.sum() > 3
  assert (bright_a != bright_b).sum() > 3


@pytest.mark.slow
def test_full_nerf_ds_trains_on_specular_scene():
  """Trainability gate: the full NeRF-DS config must escape the black-fog
  local minimum and fit the specular scene's train views."""
  src = SyntheticDataSource(num_frames=8, image_size=32, gt_samples=96,
                            specular=True)
  steps = 500
  model_cfg = dataclasses.replace(
      config_lib.nerf_ds(), nerf_trunk_depth=4, nerf_trunk_width=64,
      num_coarse_samples=12, num_fine_samples=12, nerf_skips=(),
      se3_trunk_depth=3, se3_trunk_width=32, se3_skips=(),
      hyper_sheet_depth=3, hyper_sheet_width=32, hyper_sheet_skips=(),
      mask_mlp_depth=3, mask_mlp_width=32, mask_skips=())
  train_cfg = dataclasses.replace(
      config_lib.nerf_ds_train_config(max_steps=steps, batch_size=256),
      lr_schedule=('exponential', 5e-3, 5e-4, steps),
      warp_alpha_schedule=('linear', 0, 4, steps // 2),
      norm_input_alpha_schedule=(
          'piecewise', ((100, ('constant', 0.0)),
                        (0, ('linear', 0.0, 4.0, 200)))),
      print_every=steps, save_every=10 ** 9)
  trainer = Trainer.from_experiment(model_cfg, train_cfg, src,
                                    exp_dir=None, use_mesh=True)
  state = trainer.train(num_steps=steps)
  metrics = trainer.eval_psnr(state, item_ids=src.train_ids[:2], chunk=2048)
  # Healthy ~32 dB; black-fog collapse ~15 dB. Gate with slack for seeds.
  assert metrics['psnr'] > 25.0, metrics
  # And the render is not the black-fog solution.
  item = src.load_item(src.train_ids[0])
  assert item['rgb'].mean() > 0.05

  # Normal-fidelity METRIC gate (weight-argmax association,
  # nerfds_tpu/evaluation/normals.py): the metric must SELECT pixels (the
  # round-3 median-depth association selected zero at scale) and produce
  # finite numbers. The cosine VALUE is not gated here: at 500 steps the
  # argmax weight still sits on far-field fog (measured radius ~0.9 on a
  # 0.25-radius sphere → mechanically negative cosine regardless of the
  # normal branch; see normals.py docstring) — the value gate lives at
  # production scale in scripts/convergence_run.py / BENCHMARKS.md.
  from nerfds_tpu.datasets.synthetic import _sphere_center
  from nerfds_tpu.evaluation.normals import (normal_fidelity,
                                             sphere_analytic_normal,
                                             sphere_surface_filter)
  from nerfds_tpu.models import default_extra_params
  from nerfds_tpu.training.step import build_schedules, eval_schedules
  scalars = eval_schedules(build_schedules(train_cfg), state.step)
  extra = dict(default_extra_params(model_cfg))
  for k in ('nerf_alpha', 'warp_alpha', 'hyper_alpha', 'hyper_sheet_alpha',
            'norm_input_alpha'):
    extra[k] = scalars[k]
  fid = normal_fidelity(trainer.model, state.params, src, extra,
                        sphere_analytic_normal(_sphere_center),
                        item_ids=src.train_ids[:2],
                        surface_filter=sphere_surface_filter(_sphere_center))
  assert fid['num_pixels'] > 20, fid
  assert fid['frac_selected'] > 0.05, fid
  assert np.isfinite(fid['cosine']), fid


@pytest.mark.slow
def test_normal_fidelity_gate_after_training():
  """Load-bearing normal-fidelity regression gate (VERDICT r4 task 7): a
  short specular train must produce observation-frame normals that agree
  with the analytic sphere normal on surface-consistent pixels.

  Recipe scale matters: at 500 steps / 24px the normal branch has not yet
  oriented (measured surface_cosine −0.17) — the 800-step / 32px verify
  recipe is the smallest scale where it reliably turns positive.
  Calibrated on this exact recipe (seed 0, round 5): surface_cosine
  0.245 with 80 surface pixels. The 0.1 floor leaves seed-noise margin
  while still failing the broken-branch regimes actually observed
  (≈ −0.17 under-trained, −0.55 wrong-frame canonical normal, ≈ 0
  random)."""
  import dataclasses
  import jax
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.datasets.synthetic import (SyntheticDataSource,
                                             _sphere_center)
  from nerfds_tpu.evaluation.normals import (normal_fidelity,
                                             sphere_analytic_normal,
                                             sphere_surface_filter)
  from nerfds_tpu.models import default_extra_params
  from nerfds_tpu.trainer import Trainer
  from nerfds_tpu.training.step import build_schedules, eval_schedules

  steps = 800
  model_cfg = dataclasses.replace(
      config_lib.nerf_ds(), use_white_background=True,
      num_coarse_samples=12, num_fine_samples=12,
      nerf_trunk_depth=4, nerf_trunk_width=64, se3_trunk_depth=3,
      se3_trunk_width=32, hyper_sheet_depth=2, hyper_sheet_width=16,
      mask_mlp_depth=2, mask_mlp_width=32, nerf_skips=(), se3_skips=(),
      hyper_sheet_skips=(), mask_skips=())
  train_cfg = dataclasses.replace(
      config_lib.nerf_ds_train_config(max_steps=steps, batch_size=512,
                                      scale_schedules=True),
      lr_schedule=('exponential', 5e-3, 5e-4, steps),
      warp_alpha_schedule=('linear', 0, 4, 200),
      sharp_mask_std_schedule=('constant', 0.3),
      norm_input_alpha_schedule=('constant', 4.0),
      x_for_rgb_alpha_schedule=('constant', 4.0),
      print_every=steps, save_every=10**9)
  src = SyntheticDataSource(num_frames=8, image_size=32, gt_samples=96,
                            specular=True, white_background=True)
  trainer = Trainer.from_experiment(model_cfg, train_cfg, src,
                                    exp_dir=None, use_mesh=True)
  state = trainer.train()
  scalars = eval_schedules(build_schedules(train_cfg), state.step)
  extra = dict(default_extra_params(model_cfg))
  for k in ('nerf_alpha', 'warp_alpha', 'hyper_alpha', 'hyper_sheet_alpha',
            'norm_input_alpha'):
    extra[k] = scalars[k]
  fid = normal_fidelity(trainer.model, state.params, src, extra,
                        sphere_analytic_normal(_sphere_center),
                        item_ids=src.train_ids[:2], chunk=1024,
                        surface_filter=sphere_surface_filter(_sphere_center))
  assert fid['surface_pixels'] > 30, fid   # non-empty selection
  assert fid['surface_cosine'] >= 0.1, fid  # calibrated floor (see docstring)
