"""Volume rendering: closed-form checks of the compositing math."""
import jax.numpy as jnp
import numpy as np

from nerfds_tpu.ops import rendering


def test_opaque_wall_renders_wall_color():
  # One huge-density sample in the middle: its color dominates.
  R, S = 4, 16
  z = jnp.tile(jnp.linspace(1.0, 2.0, S)[None], (R, 1))
  sigma = jnp.zeros((R, S)).at[:, 8].set(1e6)
  rgb = jnp.zeros((R, S, 3)).at[:, 8, :].set(jnp.asarray([0.2, 0.5, 0.9]))
  dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
  out = rendering.volumetric_rendering(rgb, sigma, z, dirs,
                                       use_white_background=False)
  np.testing.assert_allclose(np.asarray(out['rgb']),
                             np.tile([0.2, 0.5, 0.9], (R, 1)), atol=1e-4)
  np.testing.assert_allclose(np.asarray(out['depth']),
                             np.full(R, float(z[0, 8])), rtol=1e-4)
  np.testing.assert_allclose(np.asarray(out['med_depth']),
                             np.full(R, float(z[0, 8])), rtol=1e-4)
  np.testing.assert_allclose(np.asarray(out['acc']), np.ones(R), atol=1e-4)


def test_empty_space_black_or_white():
  R, S = 3, 8
  z = jnp.tile(jnp.linspace(1.0, 2.0, S)[None], (R, 1))
  sigma = jnp.zeros((R, S))
  rgb = jnp.ones((R, S, 3)) * 0.5
  dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
  out = rendering.volumetric_rendering(rgb, sigma, z, dirs,
                                       use_white_background=False,
                                       sample_at_infinity=False)
  np.testing.assert_allclose(np.asarray(out['rgb']), np.zeros((R, 3)),
                             atol=1e-5)
  out = rendering.volumetric_rendering(rgb, sigma, z, dirs,
                                       use_white_background=True,
                                       sample_at_infinity=False)
  np.testing.assert_allclose(np.asarray(out['rgb']), np.ones((R, 3)),
                             atol=1e-5)


def test_weights_match_analytic_transmittance():
  # Constant sigma: T(i) = prod(1-alpha_j) analytically.
  R, S = 2, 32
  z = jnp.tile(jnp.linspace(0.0, 1.0, S)[None], (R, 1))
  sigma = jnp.full((R, S), 3.0)
  dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (R, 1))  # norm 2 scales dist
  alpha, weights, accum = rendering.compute_alpha_and_weights(
      sigma, z, dirs, sample_at_infinity=True)
  a = np.asarray(alpha)
  dist = (1.0 / (S - 1)) * 2.0
  np.testing.assert_allclose(a[:, 0], 1 - np.exp(-3.0 * dist), rtol=1e-5)
  # Last sample at infinity -> alpha 1.
  np.testing.assert_allclose(a[:, -1], 1.0, atol=1e-6)
  # Weights = alpha * exclusive cumprod(1-alpha+eps).
  want_accum = np.concatenate(
      [np.ones((R, 1)), np.cumprod(1 - a[:, :-1] + 1e-10, axis=-1)], axis=-1)
  np.testing.assert_allclose(np.asarray(accum), want_accum, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(weights), a * want_accum, rtol=1e-5)


def test_sigma_scale_boosts_alpha():
  R, S = 2, 8
  z = jnp.tile(jnp.linspace(0.0, 1.0, S)[None], (R, 1))
  sigma = jnp.full((R, S), 1.0)
  dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
  w1 = rendering.cal_weights(sigma, z, dirs)
  w5 = rendering.cal_weights(sigma, z, dirs, scale=5.0)
  assert float(w5[:, 0].sum()) > float(w1[:, 0].sum())


def test_median_depth_index():
  weights = jnp.asarray([[0.1, 0.1, 0.5, 0.3],
                         [0.6, 0.2, 0.1, 0.1]])
  idx = rendering.compute_depth_index(weights)
  np.testing.assert_array_equal(np.asarray(idx), [2, 0])
  mask = rendering.compute_opaqueness_mask(weights)
  np.testing.assert_allclose(np.asarray(mask).sum(-1), [1.0, 1.0])


def test_sharpen_weights_concentrates():
  R, S = 4, 64
  z = jnp.tile(jnp.linspace(1.0, 2.0, S)[None], (R, 1))
  w = jnp.exp(-0.5 * ((z - 1.5) / 0.2) ** 2)
  w = w / w.sum(-1, keepdims=True)
  sharp = rendering.sharpen_weights(w, z, std=0.05)
  # Normalised and more peaked than the input.
  np.testing.assert_allclose(np.asarray(sharp).sum(-1), np.ones(R), rtol=1e-5)
  assert float(sharp.max()) > float(w.max())
  # Peak stays at the same sample.
  np.testing.assert_array_equal(np.asarray(jnp.argmax(sharp, -1)),
                                np.asarray(jnp.argmax(w, -1)))
