"""Jittable schedules vs the reference's host-side semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu.training import schedules


def v(fn, step):
  return float(fn(jnp.asarray(step, jnp.float32)))


def test_constant():
  fn = schedules.from_config(('constant', 3.5))
  assert v(fn, 0) == 3.5 and v(fn, 100000) == 3.5
  assert v(schedules.from_config(2.0), 7) == 2.0


def test_linear():
  fn = schedules.from_config(('linear', 0.0, 4.0, 100))
  assert v(fn, 0) == 0.0
  assert v(fn, 50) == pytest.approx(2.0)
  assert v(fn, 100) == 4.0
  assert v(fn, 1000) == 4.0


def test_exponential_matches_reference_formula():
  fn = schedules.from_config(('exponential', 1e-3, 1e-5, 250000))
  assert v(fn, 0) == pytest.approx(1e-3)
  # step >= num_steps clamps to final.
  assert v(fn, 250000) == pytest.approx(1e-5)
  # Reference formula: init * (final/init)^(step/(n-1)).
  want = 1e-3 * (1e-5 / 1e-3) ** (100000 / 249999)
  assert v(fn, 100000) == pytest.approx(want, rel=1e-4)


def test_cosine_easing():
  fn = schedules.from_config(('cosine_easing', 0.0, 1.0, 100))
  assert v(fn, 0) == pytest.approx(0.0, abs=1e-6)
  assert v(fn, 50) == pytest.approx(0.5, abs=1e-5)
  assert v(fn, 100) == pytest.approx(1.0, abs=1e-6)


def test_step_schedule():
  fn = schedules.from_config(
      {'type': 'step', 'initial_value': 1.0, 'decay_interval': 10,
       'decay_factor': 0.5, 'max_decays': 2})
  assert v(fn, 0) == 1.0
  assert v(fn, 10) == 0.5
  assert v(fn, 25) == 0.25  # capped at max_decays
  assert v(fn, 1000) == 0.25


def test_piecewise_nerf_ds_sharp_mask():
  # nerf_ds.gin: 30k exponential 1 -> 0.1, then constant 0.1.
  fn = schedules.from_config(
      ('piecewise', ((30000, ('exponential', 1.0, 0.1, 30000)),
                     (220000, ('constant', 0.1)))))
  assert v(fn, 0) == pytest.approx(1.0)
  assert v(fn, 30000) == pytest.approx(0.1, rel=1e-3)
  assert v(fn, 100000) == pytest.approx(0.1)
  # Local-step semantics: second segment starts fresh at milestone.
  fn2 = schedules.from_config(
      ('piecewise', ((10, ('constant', 5.0)), (0, ('linear', 0.0, 1.0, 10)))))
  assert v(fn2, 5) == 5.0
  assert v(fn2, 15) == pytest.approx(0.5)  # linear evaluated at local step 5


def test_delayed():
  fn = schedules.from_config(
      {'type': 'delayed', 'base_schedule': ('constant', 1.0),
       'delay_steps': 100, 'delay_mult': 0.01})
  assert v(fn, 0) == pytest.approx(0.01)
  assert v(fn, 100) == pytest.approx(1.0)
  assert v(fn, 50) == pytest.approx(0.01 + 0.99 * np.sin(np.pi / 4), rel=1e-4)


def test_schedules_jit_and_vectorize():
  fn = schedules.from_config(
      ('piecewise', ((50000, ('constant', 0.0)),
                     (50000, ('linear', 0.0, 4.0, 50000)),
                     (150000, ('constant', 4.0)))))
  jit_fn = jax.jit(fn)
  assert float(jit_fn(jnp.asarray(0.0))) == 0.0
  assert float(jit_fn(jnp.asarray(75000.0))) == pytest.approx(2.0)
  assert float(jit_fn(jnp.asarray(200000.0))) == 4.0


def test_none_schedule_is_zero():
  fn = schedules.from_config(None)
  assert v(fn, 123) == 0.0


def test_nerf_ds_train_config_scale_schedules():
  """scale_schedules=True compresses every annealing horizon by
  max_steps/250000 (same trajectory, shorter run); default keeps the gin
  constants (reference parity)."""
  from nerfds_tpu import config as config_lib
  base = config_lib.nerf_ds_train_config(max_steps=25000)
  scaled = config_lib.nerf_ds_train_config(max_steps=25000,
                                           scale_schedules=True)
  # Default: gin constants unchanged.
  assert base.warp_alpha_schedule == ('linear', 0, 4, 50000)
  # Scaled: 25000/250000 = 1/10 of every horizon.
  assert scaled.warp_alpha_schedule == ('linear', 0, 4, 5000)
  assert scaled.norm_input_alpha_schedule[1][0][0] == 1000
  sharp = scaled.sharp_mask_std_schedule[1]
  assert sharp[0][0] == 3000 and sharp[0][1][3] == 3000
  assert sharp[1][0] == 22000
  x4 = scaled.x_for_rgb_alpha_schedule[1]
  assert [seg[0] for seg in x4] == [5000, 5000, 15000]
  # max_steps itself and the lr horizon follow max_steps in both.
  assert base.lr_schedule[3] == 25000 and scaled.lr_schedule[3] == 25000
  # The full-length config is identical under either flag.
  assert (config_lib.nerf_ds_train_config(max_steps=250000,
                                          scale_schedules=True)
          == config_lib.nerf_ds_train_config(max_steps=250000))


def test_nerf_ds_pod_preset():
  """nerf_ds_pod applies the validated large-batch rule: lr scaled by
  min(batch/512, 4) + 5% warmup (linear x16 measurably diverges; the
  ~4e-3 peak won both paired seeds at 16x), equal total ray budget,
  compressed schedule horizons (BENCHMARKS round 5)."""
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.training.schedules import from_config
  model_cfg, train_cfg = config_lib.nerf_ds_pod(num_chips=16,
                                                per_chip_batch=512)
  assert model_cfg == config_lib.nerf_ds()
  assert train_cfg.batch_size == 8192
  assert train_cfg.max_steps == 15625           # 250000 / 16
  assert train_cfg.max_steps * train_cfg.batch_size == 250000 * 512
  lr = from_config(train_cfg.lr_schedule)
  warmup = train_cfg.max_steps // 20
  # Warmup ramps to the CAPPED peak (1e-3 * min(16, 4)), then decays.
  assert float(lr(0)) == pytest.approx(4e-4, rel=1e-5)
  assert float(lr(warmup)) == pytest.approx(4e-3, rel=1e-3)
  assert float(lr(train_cfg.max_steps)) == pytest.approx(4e-5, rel=1e-2)
  # Horizons compressed to the shorter run.
  assert train_cfg.warp_alpha_schedule[3] == 3125  # 50000/16
  # At 4x batch the cap is inactive: pure linear scaling.
  _, tc4 = config_lib.nerf_ds_pod(num_chips=4, per_chip_batch=512)
  lr4 = from_config(tc4.lr_schedule)
  assert float(lr4(tc4.max_steps // 20)) == pytest.approx(4e-3, rel=1e-3)
