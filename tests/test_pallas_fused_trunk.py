"""Fused trunk σ+∂σ/∂feat kernel: forward and hand-derived VJP vs autodiff.

The custom VJP must reproduce JAX's autodiff of the unfused graph exactly
(including the second-order g-path terms), so every test compares against
``trunk_sigma_grad_reference`` differentiated by plain JAX. Interpret mode,
f32 compute dtype.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu.models.mlp import NerfMLP
from nerfds_tpu.pallas import fused_trunk as ft


def make_case(seed=0, n=37, depth=3, width=32, skips=(2,), in_dim=12,
              norm_dim=3, has_bottleneck=True):
  mlp = NerfMLP(trunk_depth=depth, trunk_width=width, skips=skips,
                rgb_branch_depth=1, rgb_branch_width=16,
                alpha_channels=1, predict_norm=norm_dim > 0,
                norm_dim=max(norm_dim, 3))
  params = mlp.init(jax.random.PRNGKey(seed), in_dim, 0, 8, has_bottleneck)
  nerf_params = {'trunk': params['trunk'], 'alpha': params['alpha']}
  if has_bottleneck:
    nerf_params['bottleneck'] = params['bottleneck']
  spec = ft.TrunkSpec(depth=depth, width=width, skips=skips, in_dim=in_dim,
                      alpha_channels=1, norm_dim=norm_dim,
                      has_bottleneck=has_bottleneck)
  feat = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, in_dim),
                           jnp.float32)
  return spec, nerf_params, feat


@pytest.mark.parametrize('has_bottleneck', [True, False])
@pytest.mark.parametrize('norm_dim', [3, 0])
def test_forward_matches_reference(has_bottleneck, norm_dim):
  spec, nerf_params, feat = make_case(norm_dim=norm_dim,
                                      has_bottleneck=has_bottleneck)
  f = ft.make_trunk_sigma_grad(spec, tile=16, bwd_tile=16, interpret=True,
                               compute_dtype=jnp.float32)
  flat = ft.trunk_params_flat(spec, nerf_params)
  sigma, norm, trunk_out, bneck, g = f(feat, *flat)
  r_sigma, r_norm, r_trunk, r_bneck, r_g = ft.trunk_sigma_grad_reference(
      feat, nerf_params, spec)
  np.testing.assert_allclose(sigma, r_sigma, atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(trunk_out, r_trunk, atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(bneck, r_bneck, atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(g, r_g, atol=1e-5, rtol=1e-5)
  if norm_dim > 0:
    np.testing.assert_allclose(norm, r_norm, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('has_bottleneck', [True, False])
def test_custom_vjp_matches_autodiff(has_bottleneck):
  spec, nerf_params, feat = make_case(n=23, has_bottleneck=has_bottleneck)
  f = ft.make_trunk_sigma_grad(spec, tile=16, bwd_tile=16, interpret=True,
                               compute_dtype=jnp.float32)
  # Random projection weights make every output cotangent nontrivial,
  # including Ḡ (the second-order g-path).
  k = jax.random.PRNGKey(7)
  ks = jax.random.split(k, 5)
  w_s = jax.random.normal(ks[0], (23, 1))
  w_n = jax.random.normal(ks[1], (23, 3))
  w_t = jax.random.normal(ks[2], (23, spec.width))
  w_b = jax.random.normal(ks[3], (23, spec.width))
  w_g = jax.random.normal(ks[4], (23, spec.in_dim))

  def loss_fused(feat, nerf_params):
    flat = ft.trunk_params_flat(spec, nerf_params)
    sigma, norm, trunk_out, bneck, g = f(feat, *flat)
    out = (jnp.sum(w_s * sigma) + jnp.sum(w_t * jnp.tanh(trunk_out))
           + jnp.sum(w_b * bneck) + jnp.sum(w_g * jnp.sin(g)))
    if norm is not None:
      out = out + jnp.sum(w_n * norm)
    return out

  def loss_ref(feat, nerf_params):
    sigma, norm, trunk_out, bneck, g = ft.trunk_sigma_grad_reference(
        feat, nerf_params, spec)
    out = (jnp.sum(w_s * sigma) + jnp.sum(w_t * jnp.tanh(trunk_out))
           + jnp.sum(w_b * bneck) + jnp.sum(w_g * jnp.sin(g)))
    if norm is not None:
      out = out + jnp.sum(w_n * norm)
    return out

  v1 = loss_fused(feat, nerf_params)
  v2 = loss_ref(feat, nerf_params)
  np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)

  g1 = jax.grad(loss_fused, argnums=(0, 1))(feat, nerf_params)
  g2 = jax.grad(loss_ref, argnums=(0, 1))(feat, nerf_params)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
      g1, g2)


def test_padding_tail_rows():
  # n not a multiple of the tile: padded rows must not pollute results/grads.
  spec, nerf_params, feat = make_case(n=19)
  f = ft.make_trunk_sigma_grad(spec, tile=16, bwd_tile=16, interpret=True,
                               compute_dtype=jnp.float32)

  def loss(feat):
    flat = ft.trunk_params_flat(spec, nerf_params)
    sigma, _, _, _, g = f(feat, *flat)
    return jnp.sum(sigma ** 2) + jnp.sum(g ** 2)

  def loss_ref(feat):
    sigma, _, _, _, g = ft.trunk_sigma_grad_reference(feat, nerf_params, spec)
    return jnp.sum(sigma ** 2) + jnp.sum(g ** 2)

  np.testing.assert_allclose(loss(feat), loss_ref(feat), rtol=1e-5)
  np.testing.assert_allclose(jax.grad(loss)(feat), jax.grad(loss_ref)(feat),
                             rtol=2e-4, atol=2e-4)
