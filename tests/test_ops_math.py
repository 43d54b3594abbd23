"""L0 math: posenc/window, robust loss, safe_norm, reflect — golden tests
against tiny numpy reimplementations of the reference formulas."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu.ops import math as m


def _np_posenc(x, min_deg, max_deg, use_identity=False, alpha=None):
  """Straight numpy transcription of the reference formula for parity."""
  batch_shape = x.shape[:-1]
  scales = 2.0 ** np.arange(min_deg, max_deg)
  xb = x[..., None, :] * scales[:, None]
  four_feat = np.sin(np.stack([xb, xb + 0.5 * np.pi], axis=-2))
  if alpha is not None:
    bands = np.arange(min_deg, max_deg)
    xx = np.clip(alpha - bands, 0.0, 1.0)
    window = 0.5 * (1 + np.cos(np.pi * xx + np.pi))
    four_feat = window[..., None, None] * four_feat
  four_feat = four_feat.reshape((*batch_shape, -1))
  if use_identity:
    return np.concatenate([x, four_feat], axis=-1)
  return four_feat


@pytest.mark.parametrize("min_deg,max_deg,use_identity,alpha", [
    (0, 8, False, None),
    (0, 4, True, None),
    (0, 4, False, 1.7),
    (2, 6, True, 3.2),
])
def test_posenc_matches_reference_formula(min_deg, max_deg, use_identity,
                                          alpha):
  x = np.random.RandomState(0).randn(5, 7, 3).astype(np.float32)
  got = m.posenc(jnp.asarray(x), min_deg, max_deg, use_identity, alpha)
  want = _np_posenc(x, min_deg, max_deg, use_identity, alpha)
  np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
  assert got.shape[-1] == m.posenc_dim(3, min_deg, max_deg, use_identity)


def test_posenc_window_eases_bands_in():
  w0 = m.posenc_window(0, 4, 0.0)
  w_mid = m.posenc_window(0, 4, 2.0)
  w_full = m.posenc_window(0, 4, 4.0)
  np.testing.assert_allclose(np.asarray(w0), [0, 0, 0, 0], atol=1e-6)
  np.testing.assert_allclose(np.asarray(w_mid), [1, 1, 0, 0], atol=1e-6)
  np.testing.assert_allclose(np.asarray(w_full), [1, 1, 1, 1], atol=1e-6)


def test_posenc_degenerate_band_is_empty():
  x = jnp.ones((4, 3))
  assert m.posenc(x, 0, 0, use_identity=False).shape == (4, 0)
  np.testing.assert_allclose(m.posenc(x, 0, 0, use_identity=True), x)


def test_general_loss_special_cases():
  x_sq = jnp.asarray(np.random.RandomState(1).rand(64).astype(np.float32))
  scale = 0.03
  # alpha=2 -> scaled L2.
  want_l2 = scale * 0.5 * np.asarray(x_sq) / scale ** 2
  got = m.general_loss_with_squared_residual(x_sq, alpha=2.0, scale=scale)
  np.testing.assert_allclose(np.asarray(got), want_l2, rtol=1e-3)
  # alpha=0 -> Cauchy log1p.
  want_cauchy = scale * np.log1p(0.5 * np.asarray(x_sq) / scale ** 2)
  got = m.general_loss_with_squared_residual(x_sq, alpha=0.0, scale=scale)
  np.testing.assert_allclose(np.asarray(got), want_cauchy, rtol=1e-3)
  # alpha=-2 (Geman-McClure): 2 x²/s² / (x²/s² + 4).
  z = np.asarray(x_sq) / scale ** 2
  want_gm = scale * 2.0 * z / (z + 4.0)
  got = m.general_loss_with_squared_residual(x_sq, alpha=-2.0, scale=scale)
  np.testing.assert_allclose(np.asarray(got), want_gm, rtol=1e-4)


def test_general_loss_monotone_and_finite_gradient():
  grad = jax.grad(
      lambda v: m.general_loss_with_squared_residual(v, -2.0, 0.001).sum())
  g = grad(jnp.asarray([0.0, 1e-8, 1e-4, 1.0, 1e4]))
  assert np.all(np.isfinite(np.asarray(g)))


def test_safe_norm_zero_gradient_at_origin():
  g = jax.grad(lambda x: m.safe_norm(x))(jnp.zeros(3))
  np.testing.assert_allclose(np.asarray(g), np.zeros(3))
  x = jnp.asarray([3.0, 4.0, 0.0])
  np.testing.assert_allclose(float(m.safe_norm(x)), 5.0, rtol=1e-6)
  g = jax.grad(lambda v: m.safe_norm(v))(x)
  np.testing.assert_allclose(np.asarray(g), np.asarray(x) / 5.0, rtol=1e-6)


def test_reflect_mirror_law():
  d = jnp.asarray([[1.0, 0.0, 0.0]])
  n = jnp.asarray([[0.0, 1.0, 0.0]])
  # d ⟂ n: reflection of d about the plane with normal n is −d.
  np.testing.assert_allclose(
      np.asarray(m.reflect(d, n)), [[-1.0, 0.0, 0.0]], atol=1e-6)
  # d ∥ n: reflection is +d.
  np.testing.assert_allclose(
      np.asarray(m.reflect(n, n)), np.asarray(n), atol=1e-6)
  # Norm preserved, unnormalised inputs normalised first.
  d = jnp.asarray([[2.0, 3.0, -1.0]])
  out = m.reflect(d, jnp.asarray([[0.3, -0.5, 1.0]]))
  np.testing.assert_allclose(np.linalg.norm(np.asarray(out)), 1.0, rtol=1e-5)


def test_psnr():
  np.testing.assert_allclose(float(m.compute_psnr(jnp.asarray(0.01))), 20.0,
                             rtol=1e-6)


def test_curl_div():
  jac = jnp.asarray(np.random.RandomState(2).randn(4, 3, 3).astype(np.float32))
  div = m.jacobian_to_div(jac)
  want = np.trace(np.asarray(jac), axis1=-2, axis2=-1) - 3.0
  np.testing.assert_allclose(np.asarray(div), want, rtol=1e-5)
  curl = m.jacobian_to_curl(jac)
  assert curl.shape == (4, 3)
  # curl of a symmetric jacobian is zero
  sym = 0.5 * (jac + jnp.swapaxes(jac, -1, -2))
  np.testing.assert_allclose(np.asarray(m.jacobian_to_curl(sym)),
                             np.zeros((4, 3)), atol=1e-5)


def test_clip_gradients_by_norm():
  grad = {'a': jnp.full((3,), 10.0), 'b': jnp.full((2,), -10.0)}
  clipped = m.clip_gradients(grad, grad_max_norm=1.0)
  total = np.sqrt(sum(np.sum(np.asarray(v) ** 2)
                      for v in jax.tree_util.tree_leaves(clipped)))
  np.testing.assert_allclose(total, 1.0, rtol=1e-4)
  clipped = m.clip_gradients(grad, grad_max_val=0.5)
  assert float(jnp.max(jnp.abs(clipped['a']))) == 0.5


def test_grid_sample_bilinear():
  img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
  # Exact grid points reproduce image values.
  coords = jnp.asarray([[0.0, 0.0], [3.0, 2.0], [1.0, 1.0]])
  got = m.grid_sample(img, coords)
  np.testing.assert_allclose(np.asarray(got), [0.0, 11.0, 5.0], atol=1e-5)
  # Midpoint interpolates.
  got = m.grid_sample(img, jnp.asarray([[0.5, 0.5]]))
  np.testing.assert_allclose(np.asarray(got), [(0 + 1 + 4 + 5) / 4], atol=1e-5)


def test_trilinear_coefficients_partition_of_unity():
  pos = jnp.asarray(np.random.RandomState(3).rand(10, 3).astype(np.float32))
  coef = m.get_trilinear_coefficient(pos)
  np.testing.assert_allclose(np.asarray(coef).sum(-1), np.ones(10), rtol=1e-5)
  # At a corner the matching vertex gets weight 1.
  coef = m.get_trilinear_coefficient(jnp.asarray([[0.0, 0.0, 0.0]]))
  np.testing.assert_allclose(np.asarray(coef)[0],
                             [1, 0, 0, 0, 0, 0, 0, 0], atol=1e-6)
  coef = m.get_trilinear_coefficient(jnp.asarray([[1.0, 1.0, 1.0]]))
  np.testing.assert_allclose(np.asarray(coef)[0],
                             [0, 0, 0, 0, 0, 0, 0, 1], atol=1e-6)
