"""Dual-quaternion math (golden parity vs the reference module) and the
``warp_field_type='dual_quaternion'`` field variant."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu import config as config_lib
from nerfds_tpu.models import NerfDSModel, default_extra_params
from nerfds_tpu.ops import dual_quaternion as dq
from nerfds_tpu.ops import quaternion, rigid

from ref_loader import load_reference, reference_available


def rand_dq(rng, n=5):
  return jnp.asarray(rng.randn(n, 8).astype(np.float32))


@pytest.mark.skipif(not reference_available(),
                    reason='reference tree not mounted')
def test_math_parity_vs_reference():
  """Golden parity vs the reference's (dead) dual_quaternion.py:29-129.

  The reference multiply is single-dq only (its quaternion.multiply uses
  jnp.dot); ours is batched — compare per element."""
  ref = load_reference(names=('utils', 'quaternion', 'dual_quaternion'))
  rng = np.random.RandomState(0)
  a, b = rand_dq(rng), rand_dq(rng)
  want = np.stack([np.asarray(ref.dual_quaternion.multiply(a[i], b[i]))
                   for i in range(a.shape[0])])
  np.testing.assert_allclose(np.asarray(dq.multiply(a, b)), want,
                             rtol=1e-5, atol=1e-5)
  for fn in ('quaternion_conjugate', 'dual_conjugate',
             'quaternion_dual_conjugate', 'normalize'):
    want = np.stack([np.asarray(getattr(ref.dual_quaternion, fn)(a[i]))
                     for i in range(a.shape[0])])
    got = np.asarray(getattr(dq, fn)(a))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5, err_msg=fn)
  unit = dq.normalize(a)
  want_t = np.stack([np.asarray(ref.dual_quaternion.get_translation(unit[i]))
                     for i in range(a.shape[0])])
  np.testing.assert_allclose(np.asarray(dq.get_translation(unit)), want_t,
                             rtol=1e-4, atol=1e-5)
  q = quaternion.normalize(jnp.asarray(rng.randn(5, 4), jnp.float32))
  t = jnp.asarray(rng.randn(5, 3), jnp.float32)
  want_rt = np.stack([np.asarray(
      ref.dual_quaternion.from_rotation_translation(q[i], t[i]))
      for i in range(5)])
  np.testing.assert_allclose(
      np.asarray(dq.from_rotation_translation(q, t)), want_rt,
      rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(ref.dual_quaternion.identity()),
                             np.asarray(dq.identity()))


def test_transform_point_matches_rotation_translation():
  """dq action == R(q) x + t for the dq built from (q, t)."""
  rng = np.random.RandomState(1)
  q = quaternion.normalize(jnp.asarray(rng.randn(6, 4), jnp.float32))
  t = jnp.asarray(rng.randn(6, 3), jnp.float32)
  x = jnp.asarray(rng.randn(6, 3), jnp.float32)
  d = dq.from_rotation_translation(q, t)
  want = np.einsum('nij,nj->ni',
                   np.asarray(quaternion.to_rotation_matrix(q)),
                   np.asarray(x)) + np.asarray(t)
  np.testing.assert_allclose(np.asarray(dq.transform_point(d, x)), want,
                             rtol=1e-4, atol=1e-5)
  # Round trip: translation/rotation extraction.
  np.testing.assert_allclose(np.asarray(dq.get_translation(d)),
                             np.asarray(t), rtol=1e-4, atol=1e-5)


def test_motion_surface_matches_screw_semantics():
  """DualQuatMotion built from a screw's (R, t) acts identically to the
  screw through the rigid.* dispatch surface."""
  rng = np.random.RandomState(2)
  screw = rigid.screw_from_raw(
      jnp.asarray(rng.randn(4, 3) * 0.6, jnp.float32),
      jnp.asarray(rng.randn(4, 3), jnp.float32))
  q = quaternion.from_axis_angle(screw.w, screw.theta)
  t = rigid.translation(screw)
  motion = dq.DualQuatMotion(dq.from_rotation_translation(q, t))
  x = jnp.asarray(rng.randn(4, 3), jnp.float32)
  for fn in (rigid.rotate, rigid.rotate_inverse, rigid.transform_point):
    np.testing.assert_allclose(
        np.asarray(fn(motion, x)), np.asarray(fn(screw, x)),
        rtol=1e-4, atol=1e-5, err_msg=fn.__name__)
  np.testing.assert_allclose(np.asarray(rigid.translation(motion)),
                             np.asarray(t), rtol=1e-4, atol=1e-5)


def test_axis_matches_screw_axis_semantics():
  """DualQuatMotion.axis returns the SAME unit screw axis [w, v] as
  Screw.axis for the identical rigid motion — so screw_input_mode rgb
  conditioning is scale-identical under either warp parameterisation."""
  rng = np.random.RandomState(5)
  screw = rigid.screw_from_raw(
      jnp.asarray(rng.randn(8, 3) * 0.7, jnp.float32),
      jnp.asarray(rng.randn(8, 3), jnp.float32))
  q = quaternion.from_axis_angle(screw.w, screw.theta)
  t = rigid.translation(screw)
  motion = dq.DualQuatMotion(dq.from_rotation_translation(q, t))
  got = np.asarray(motion.axis)
  want = np.asarray(screw.axis)
  # Quaternion double cover: log may return the -θ/-w representation;
  # (w, v) -> (-w, -v) is the same screw line, compare up to sign.
  sign = np.sign(np.sum(got[:, :3] * want[:, :3], axis=-1, keepdims=True))
  np.testing.assert_allclose(sign * got, want, rtol=1e-3, atol=1e-4)


def test_axis_small_rotation_stable():
  """Near-identity rotations (the init regime, θ≈1e-4) produce a finite,
  correctly-scaled axis: v ≈ t/θ dominates, no NaN from the cot(θ/2) term."""
  rng = np.random.RandomState(6)
  w_raw = jnp.asarray(rng.randn(4, 3) * 1e-4, jnp.float32)
  v_raw = jnp.asarray(rng.randn(4, 3) * 1e-4, jnp.float32)
  screw = rigid.screw_from_raw(w_raw, v_raw)
  q = quaternion.from_axis_angle(screw.w, screw.theta)
  t = rigid.translation(screw)
  motion = dq.DualQuatMotion(dq.from_rotation_translation(q, t))
  got = np.asarray(motion.axis)
  want = np.asarray(screw.axis)
  assert np.isfinite(got).all()
  sign = np.sign(np.sum(got[:, :3] * want[:, :3], axis=-1, keepdims=True))
  np.testing.assert_allclose(sign * got, want, rtol=1e-2, atol=1e-3)


def _small_dq_model():
  cfg = dataclasses.replace(
      config_lib.nerf_ds(), warp_field_type='dual_quaternion',
      num_coarse_samples=6, num_fine_samples=4, nerf_trunk_depth=2,
      nerf_trunk_width=32, se3_trunk_depth=2, se3_trunk_width=16,
      hyper_sheet_depth=2, hyper_sheet_width=16, mask_mlp_depth=2,
      mask_mlp_width=16, nerf_skips=(), se3_skips=(), hyper_sheet_skips=(),
      mask_skips=())
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4,
                      near=0.2, far=2.0)
  return model, model.init(jax.random.PRNGKey(0))


def _rays(num_rays=6):
  rng = np.random.RandomState(3)
  d = rng.randn(num_rays, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  return {
      'origins': jnp.asarray(rng.randn(num_rays, 3).astype(np.float32) * .1),
      'directions': jnp.asarray(d),
      'metadata': {'warp': jnp.asarray(
          rng.randint(0, 4, (num_rays, 1)), jnp.int32)},
      'mask': jnp.asarray(rng.rand(num_rays, 1).astype(np.float32)),
  }


def test_dq_field_near_identity_at_init():
  model, params = _small_dq_model()
  pts = jnp.asarray(np.random.RandomState(4).randn(10, 3), jnp.float32)
  embed = jnp.zeros((10, 9))  # 8 embed + 1 mask channel
  warped = model.warp_field.warp(params['warp_field'], pts, embed, 4.0)
  np.testing.assert_allclose(np.asarray(warped), np.asarray(pts), atol=1e-2)


def test_dq_full_model_forward_and_grads():
  """Full NeRF-DS pipeline with the dual-quaternion warp: forward finite,
  second-order σ-gradient training grads finite and warp field receives
  gradient."""
  model, params = _small_dq_model()
  rays = _rays()
  extra = default_extra_params(model.config)

  def loss(p):
    out = model.render(p, rays, jax.random.PRNGKey(1), extra)
    total = jnp.mean(out['fine']['rgb'] ** 2)
    total += jnp.mean((out['fine']['predicted_norm']
                       - out['fine']['target_norm']) ** 2)
    return total

  l, g = jax.jit(jax.value_and_grad(loss))(params)
  assert np.isfinite(float(l))
  leaves = jax.tree_util.tree_leaves(g)
  assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
  warp_g = jax.tree_util.tree_leaves(g['warp_field'])
  assert any(float(jnp.abs(x).max()) > 0 for x in warp_g)
  assert set(g['warp_field']) == {'trunk', 'q', 't'}
