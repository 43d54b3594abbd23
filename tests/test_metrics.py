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


def test_lpips_prep_matches_reference_convention():
  """LpipsMetric.prep reproduces the reference's im2tensor input
  convention (utils/calculate_quantitative_results.py:23-49): [H,W,C]
  float [0,1] -> [1,C,H,W] torch tensor scaled to [-1,1]. Structural test:
  the lpips weights themselves are not fetchable in this environment
  (README metrics note), so the prep is pinned separately."""
  torch = pytest.importorskip('torch')
  from nerfds_tpu.evaluation.metrics import LpipsMetric
  rng = np.random.RandomState(0)
  img = rng.rand(8, 6, 3).astype(np.float32)
  t = LpipsMetric.prep(img, torch)
  assert tuple(t.shape) == (1, 3, 8, 6)
  assert float(t.min()) >= -1.0 and float(t.max()) <= 1.0
  # channel c, pixel (y, x) comes from img[y, x, c], affinely mapped.
  np.testing.assert_allclose(t[0].permute(1, 2, 0).numpy(),
                             img * 2.0 - 1.0, atol=1e-7)
  # black -> -1, white -> +1 (the [-1, 1] domain lpips expects).
  np.testing.assert_allclose(
      LpipsMetric.prep(np.zeros((2, 2, 3), np.float32), torch).numpy(), -1.0)
  np.testing.assert_allclose(
      LpipsMetric.prep(np.ones((2, 2, 3), np.float32), torch).numpy(), 1.0)


def test_lpips_golden_when_available():
  """Full LPIPS golden values — runs only where the `lpips` package (and
  its pretrained weights) exist; everywhere else the metric is
  environment-gated (constructing raises ImportError, which eval.py and
  metrics_pipeline.py catch and continue without the lpips column)."""
  pytest.importorskip('lpips')
  from nerfds_tpu.evaluation.metrics import LpipsMetric
  metric = LpipsMetric()
  rng = np.random.RandomState(1)
  a = rng.rand(64, 64, 3).astype(np.float32)
  assert metric(a, a) == pytest.approx(0.0, abs=1e-6)
  b = np.clip(a + 0.3 * rng.randn(64, 64, 3), 0, 1).astype(np.float32)
  d = metric(a, b)
  assert 0.0 < d < 1.5  # a real perceptual distance for heavy noise


def test_metrics_pipeline_grayscale_mask(tmp_path):
  """metrics_pipeline handles single-channel .png.png masks: grayscale
  PNGs decode 2-D and naive [..., :1] slicing silently indexed image
  COLUMNS (caught on the round-5 vrig run); masked_psnr must be computed
  on the foreground region."""
  import importlib.util
  from pathlib import Path as P
  import cv2
  spec = importlib.util.spec_from_file_location(
      'metrics_pipeline',
      P(__file__).resolve().parent.parent / 'scripts' / 'metrics_pipeline.py')
  mp = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mp)

  rng = np.random.RandomState(0)
  gt = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
  pred = gt.copy()
  pred[:16] = np.clip(pred[:16].astype(int) + 40, 0, 255).astype(np.uint8)
  (tmp_path / 'pred').mkdir(); (tmp_path / 'gt').mkdir()
  (tmp_path / 'mask').mkdir()
  cv2.imwrite(str(tmp_path / 'pred' / 'f0.png'), pred)
  cv2.imwrite(str(tmp_path / 'gt' / 'f0.png'), gt)
  # Grayscale mask, stored inverted (static=255), moving region = top half.
  mask = np.full((32, 32), 255, np.uint8)
  mask[:16] = 0
  cv2.imwrite(str(tmp_path / 'mask' / 'f0.png.png'), mask)
  rows = mp.evaluate_dir(tmp_path / 'pred', tmp_path / 'gt',
                         tmp_path / 'mask')
  assert len(rows) == 1
  row = rows[0]
  assert 'masked_psnr' in row
  # The perturbation lives entirely in the masked (moving) half: masked
  # MSE is ~2x the whole-image MSE.
  assert row['masked_mse'] == pytest.approx(2 * row['mse'], rel=0.05)
