"""Fused compositing kernel vs the XLA path (interpret mode on CPU),
including gradients through the custom VJP."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu.ops import rendering
from nerfds_tpu.pallas import composite as composite_lib


def _inputs(num_rays=37, num_samples=16, seed=0):
  rng = np.random.RandomState(seed)
  rgb = jnp.asarray(rng.rand(num_rays, num_samples, 3).astype(np.float32))
  sigma = jnp.asarray(rng.rand(num_rays, num_samples).astype(np.float32) * 3)
  z = jnp.sort(jnp.asarray(
      rng.rand(num_rays, num_samples).astype(np.float32) * 3 + 1), -1)
  dirs = jnp.asarray(rng.randn(num_rays, 3).astype(np.float32))
  return rgb, sigma, z, dirs


@pytest.mark.parametrize('sample_at_infinity', [True, False])
def test_composite_matches_xla(sample_at_infinity):
  rgb, sigma, z, dirs = _inputs()
  want = rendering.volumetric_rendering(
      rgb, sigma, z, dirs, use_white_background=False,
      sample_at_infinity=sample_at_infinity, backend='xla')
  out_rgb, depth, acc, weights, alpha, accum = composite_lib.composite(
      rgb, sigma, z, dirs, sample_at_infinity, 1e-10, 16, True)
  np.testing.assert_allclose(np.asarray(weights),
                             np.asarray(want['weights']),
                             rtol=1e-4, atol=1e-6)
  np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(want['rgb']),
                             rtol=1e-4, atol=1e-6)
  np.testing.assert_allclose(np.asarray(depth), np.asarray(want['depth']),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(alpha), np.asarray(want['alpha']),
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(accum),
                             np.asarray(want['accum_prod']),
                             rtol=1e-4, atol=1e-6)


def test_composite_gradients_match_xla():
  rgb, sigma, z, dirs = _inputs(num_rays=12, num_samples=8)
  target = jnp.asarray(
      np.random.RandomState(1).rand(12, 3).astype(np.float32))

  def loss_pallas(rgb, sigma):
    out_rgb, depth, acc, weights, *_ = composite_lib.composite(
        rgb, sigma, z, dirs, True, 1e-10, 8, True)
    return jnp.mean((out_rgb - target) ** 2) + jnp.mean(depth) \
        + jnp.mean(weights ** 2)

  def loss_xla(rgb, sigma):
    out = rendering.volumetric_rendering(rgb, sigma, z, dirs, False,
                                         backend='xla')
    return jnp.mean((out['rgb'] - target) ** 2) + jnp.mean(out['depth']) \
        + jnp.mean(out['weights'] ** 2)

  g_pallas = jax.grad(loss_pallas, argnums=(0, 1))(rgb, sigma)
  g_xla = jax.grad(loss_xla, argnums=(0, 1))(rgb, sigma)
  for a, b in zip(g_pallas, g_xla):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)


def test_volumetric_rendering_pallas_backend_interpret(monkeypatch):
  # Route the model-facing API through the kernel in interpret mode.
  import nerfds_tpu.pallas.composite as c
  orig = c._forward_pallas
  monkeypatch.setattr(
      c, '_forward_pallas',
      functools.partial(orig, interpret=True) if False else
      (lambda rgb, sigma, z, dirs, inf, eps, tile, interp:
       orig(rgb, sigma, z, dirs, inf, eps, tile, True)))
  rgb, sigma, z, dirs = _inputs(num_rays=9)
  out_p = rendering.volumetric_rendering(rgb, sigma, z, dirs, True,
                                         backend='pallas')
  out_x = rendering.volumetric_rendering(rgb, sigma, z, dirs, True,
                                         backend='xla')
  for k in ('rgb', 'depth', 'med_depth', 'acc'):
    np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_x[k]),
                               rtol=1e-4, atol=1e-6, err_msg=k)
