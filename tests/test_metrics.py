"""Image metrics: cross-validated against tf.image (the reference's metric
backend) and closed forms."""
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu.evaluation import metrics as m


def _images(h=96, w=96, seed=0):
  rng = np.random.RandomState(seed)
  a = rng.rand(h, w, 3).astype(np.float32)
  # b = smoothed + noisy variant of a.
  import scipy.ndimage
  b = scipy.ndimage.gaussian_filter(a, sigma=(1.5, 1.5, 0))
  b = np.clip(b + rng.randn(h, w, 3) * 0.02, 0, 1).astype(np.float32)
  return a, b


def test_psnr_mse():
  a = jnp.zeros((8, 8, 3))
  b = jnp.full((8, 8, 3), 0.1)
  np.testing.assert_allclose(float(m.compute_mse(a, b)), 0.01, rtol=1e-6)
  np.testing.assert_allclose(float(m.compute_psnr(a, b)), 20.0, rtol=1e-5)


def test_ssim_identity_is_one():
  a, _ = _images()
  ssim, _ = m.compute_ssim(jnp.asarray(a), jnp.asarray(a))
  np.testing.assert_allclose(float(ssim), 1.0, atol=1e-5)
  np.testing.assert_allclose(float(m.compute_msssim(jnp.asarray(a),
                                                    jnp.asarray(a))),
                             1.0, atol=1e-4)


def test_ssim_matches_tensorflow():
  tf = pytest.importorskip('tensorflow')
  a, b = _images()
  want = float(tf.image.ssim(tf.constant(a), tf.constant(b), max_val=1.0))
  got = float(m.compute_ssim(jnp.asarray(a), jnp.asarray(b))[0])
  np.testing.assert_allclose(got, want, atol=5e-3)


def test_msssim_matches_tensorflow():
  tf = pytest.importorskip('tensorflow')
  rng = np.random.RandomState(1)
  a = rng.rand(192, 192, 3).astype(np.float32)
  import scipy.ndimage
  b = np.clip(scipy.ndimage.gaussian_filter(a, (2, 2, 0))
              + rng.randn(192, 192, 3) * 0.03, 0, 1).astype(np.float32)
  want = float(tf.image.ssim_multiscale(tf.constant(a), tf.constant(b),
                                        max_val=1.0))
  got = float(m.compute_msssim(jnp.asarray(a), jnp.asarray(b)))
  np.testing.assert_allclose(got, want, atol=2e-2)


def test_ssim_orders_degradations():
  a, _ = _images()
  slight = np.clip(a + np.random.RandomState(2).randn(*a.shape) * 0.01, 0, 1)
  heavy = np.clip(a + np.random.RandomState(3).randn(*a.shape) * 0.2, 0, 1)
  s_slight = float(m.compute_ssim(jnp.asarray(a),
                                  jnp.asarray(slight.astype(np.float32)))[0])
  s_heavy = float(m.compute_ssim(jnp.asarray(a),
                                 jnp.asarray(heavy.astype(np.float32)))[0])
  assert s_slight > s_heavy > 0


def test_compute_all_keys():
  a, b = _images(64, 64)
  out = m.compute_all(a, b)
  assert set(out) == {'mse', 'psnr', 'ssim', 'ms_ssim'}
  assert all(np.isfinite(v) for v in out.values())


def test_msssim_bounded_on_degenerate_patches():
  """SSIM/MS-SSIM must stay <= 1: float cancellation in E[x^2]-mu^2 used
  to push the cs term past 1 on near-constant patches (observed 1.0102 on
  real renders); the variance/covariance clamps restore the bound."""
  import numpy as np
  import jax.numpy as jnp
  from nerfds_tpu.evaluation import metrics as m
  rng = np.random.RandomState(0)
  for trial in range(30):
    # Large constant regions + small structured patches: the degenerate
    # regime for the variance estimator.
    a = np.full((64, 64, 3), rng.uniform(0.5, 1.0), np.float32)
    h = rng.randint(4, 20)
    a[:h, :h] = rng.rand(h, h, 3)
    b = a + rng.randn(64, 64, 3).astype(np.float32) * rng.uniform(0, 0.02)
    s = float(m.compute_ssim(jnp.asarray(a), jnp.asarray(b))[0])
    v = float(m.compute_msssim(jnp.asarray(a), jnp.asarray(b)))
    assert s <= 1.0 + 1e-6, s
    assert v <= 1.0 + 1e-6, v
    assert np.isfinite(s) and np.isfinite(v)
