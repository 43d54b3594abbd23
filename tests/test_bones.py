"""Bone (skeleton) warp field: shapes, identity-at-init, blending."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu.models.bones import BoneSE3Field, bone_probs


def test_bone_probs_prefer_near_bone():
  points = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
  centers = jnp.broadcast_to(
      jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])[None], (2, 2, 3))
  scales = jnp.full((2, 3), 0.05)
  rotations = jnp.broadcast_to(jnp.eye(3), (2, 2, 3, 3))
  probs = np.asarray(bone_probs(points, centers, scales, rotations))
  assert probs[0, 0] > probs[0, 1]
  assert probs[1, 1] > probs[1, 0]


def test_bone_field_forward():
  field = BoneSE3Field(num_bones=3, trunk_depth=2, trunk_width=16, skips=(),
                       moving_mlp_depth=2, moving_mlp_width=16)
  params = field.init(jax.random.PRNGKey(0), metadata_dim=8)
  n = 12
  rng = np.random.RandomState(0)
  points = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
  embed = jnp.asarray(rng.randn(n, 8).astype(np.float32) * 0.05)
  out = field.warp(params, points, embed)
  assert out['warped_points'].shape == (n, 3)
  assert out['bone_weights'].shape == (n, 3)
  assert out['moving_mask'].shape == (n, 1)
  np.testing.assert_allclose(np.asarray(out['bone_weights']).sum(-1),
                             np.ones(n), rtol=1e-5)
  # Tiny-init screws: warp is near-identity regardless of the mask gate.
  np.testing.assert_allclose(np.asarray(out['warped_points']),
                             np.asarray(points), atol=5e-2)
  # Gradients flow to bone parameters.
  def loss(p):
    return jnp.sum(field.warp(p, points, embed)['warped_points'] ** 2)
  grads = jax.grad(loss)(params)
  assert np.isfinite(
      np.asarray(grads['bone_centers'])).all()


@pytest.mark.slow
def test_bone_mode_in_full_model():
  import sys
  sys.path.insert(0, 'tests')
  from test_model import make_rays, small
  from nerfds_tpu import config as config_lib
  from nerfds_tpu.models import NerfDSModel, default_extra_params
  cfg = small(config_lib.nerf_ds, use_bone=True, num_bones=2,
              bone_trunk_depth=2, bone_trunk_width=16,
              bone_moving_mlp_depth=2, bone_moving_mlp_width=16)
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)
  params = model.init(jax.random.PRNGKey(0))
  assert 'bone_warp_field' in params and 'warp_field' not in params
  rays = make_rays()
  out = model.render(params, rays, jax.random.PRNGKey(1),
                     default_extra_params(cfg))
  assert out['fine']['ray_moving_mask'].shape == (8, 1)
  assert np.all(np.isfinite(np.asarray(out['fine']['rgb'])))
  # Gradients flow into bone params through the full model.
  def loss(p):
    o = model.render(p, rays, jax.random.PRNGKey(1),
                     default_extra_params(cfg))
    return jnp.mean(o['fine']['rgb'] ** 2)
  g = jax.grad(loss)(params)
  leaves = jax.tree_util.tree_leaves(g['bone_warp_field'])
  assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
