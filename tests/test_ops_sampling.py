"""Stratified + inverse-CDF sampling: statistical and structural checks."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfds_tpu.ops import sampling


def test_sample_along_rays_bounds_and_shape():
  key = jax.random.PRNGKey(0)
  origins = jnp.zeros((16, 3))
  directions = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
  z, pts = sampling.sample_along_rays(key, origins, directions, 64,
                                      near=2.0, far=6.0,
                                      use_stratified_sampling=True,
                                      use_linear_disparity=False)
  assert z.shape == (16, 64) and pts.shape == (16, 64, 3)
  assert float(z.min()) >= 2.0 and float(z.max()) <= 6.0
  # z sorted per ray (stratified bins are disjoint).
  assert np.all(np.diff(np.asarray(z), axis=-1) > 0)
  # points = o + z*d
  np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(z),
                             rtol=1e-6)


def test_sample_along_rays_deterministic_midpoints():
  key = jax.random.PRNGKey(0)
  origins = jnp.zeros((4, 3))
  directions = jnp.ones((4, 3))
  z, _ = sampling.sample_along_rays(key, origins, directions, 5, 1.0, 5.0,
                                    use_stratified_sampling=False,
                                    use_linear_disparity=False)
  np.testing.assert_allclose(np.asarray(z[0]), [1, 2, 3, 4, 5], rtol=1e-6)


def test_linear_disparity():
  key = jax.random.PRNGKey(0)
  z, _ = sampling.sample_along_rays(key, jnp.zeros((1, 3)), jnp.ones((1, 3)),
                                    3, 1.0, 4.0,
                                    use_stratified_sampling=False,
                                    use_linear_disparity=True)
  # disparity linear: 1/z linear in [1, 1/4] -> z = [1, 1.6, 4]
  np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.6, 4.0], rtol=1e-5)


def test_piecewise_constant_pdf_concentrates_mass():
  key = jax.random.PRNGKey(1)
  n_bins = 32
  bins = jnp.tile(jnp.linspace(0.0, 1.0, n_bins + 1)[None], (8, 1))
  weights = jnp.zeros((8, n_bins)).at[:, 20].set(100.0)
  z = sampling.piecewise_constant_pdf(key, bins, weights, 128,
                                      use_stratified_sampling=True)
  z = np.asarray(z)
  lo, hi = 20 / n_bins, 21 / n_bins
  frac_inside = np.mean((z >= lo - 1e-3) & (z <= hi + 1e-3))
  assert frac_inside > 0.9, frac_inside


def test_piecewise_constant_pdf_uniform_weights_uniform_samples():
  key = jax.random.PRNGKey(2)
  bins = jnp.tile(jnp.linspace(2.0, 6.0, 65)[None], (4, 1))
  weights = jnp.ones((4, 64))
  z = sampling.piecewise_constant_pdf(key, bins, weights, 4096, True)
  z = np.asarray(z)
  assert abs(z.mean() - 4.0) < 0.05
  assert z.min() >= 2.0 and z.max() <= 6.0


def test_sample_pdf_merges_sorted():
  key = jax.random.PRNGKey(3)
  origins = jnp.zeros((4, 3))
  directions = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
  z_coarse = jnp.tile(jnp.linspace(2.0, 6.0, 64)[None], (4, 1))
  mids = 0.5 * (z_coarse[:, 1:] + z_coarse[:, :-1])
  weights = jnp.ones((4, 62))
  z_all, pts = sampling.sample_pdf(key, mids, weights, origins, directions,
                                   z_coarse, 64, True)
  assert z_all.shape == (4, 128) and pts.shape == (4, 128, 3)
  assert np.all(np.diff(np.asarray(z_all), axis=-1) >= 0)


def test_pdf_samples_have_no_gradient():
  # stop_gradient: samples must not backprop into weights.
  def f(w):
    bins = jnp.linspace(0.0, 1.0, 9)[None]
    z = sampling.piecewise_constant_pdf(jax.random.PRNGKey(0), bins, w[None],
                                        16, False)
    return jnp.sum(z)

  g = jax.grad(f)(jnp.ones(8))
  np.testing.assert_allclose(np.asarray(g), np.zeros(8))
