"""Image quality metrics (L5): PSNR, SSIM, MS-SSIM, optional LPIPS.

The reference computes MSE/PSNR in jnp (eval.py:84-106) but reaches for
``tf.image.ssim_multiscale`` and the PyTorch ``lpips`` package for the rest
(utils/calculate_quantitative_results.py:23-88). Here SSIM / MS-SSIM are
implemented natively in JAX (Wang et al. 2003 formulation, 11×11 Gaussian
window, standard power factors) so the whole eval path is jittable; LPIPS is
provided behind an optional torch import.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def compute_mse(a, b):
  return jnp.mean((a - b) ** 2)


def compute_psnr(a, b, max_val: float = 1.0):
  mse = compute_mse(a, b)
  return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
  x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
  g = jnp.exp(-0.5 * (x / sigma) ** 2)
  return g / g.sum()


def _filter2d_separable(img, kernel):
  """Depthwise separable 2D filter, img [H, W, C], valid padding."""
  k = kernel.shape[0]
  img = jnp.moveaxis(img, -1, 0)[:, None]  # [C, 1, H, W]
  kh = kernel.reshape(1, 1, k, 1)
  kw = kernel.reshape(1, 1, 1, k)
  out = jax.lax.conv_general_dilated(img, kh, (1, 1), 'VALID')
  out = jax.lax.conv_general_dilated(out, kw, (1, 1), 'VALID')
  return jnp.moveaxis(out[:, 0], 0, -1)  # [H', W', C]


def compute_ssim(a, b, max_val: float = 1.0, filter_size: int = 11,
                 filter_sigma: float = 1.5, k1: float = 0.01,
                 k2: float = 0.03, return_map: bool = False):
  """Single-scale SSIM for [H, W, C] float images."""
  kernel = _gaussian_kernel(filter_size, filter_sigma)
  mu_a = _filter2d_separable(a, kernel)
  mu_b = _filter2d_separable(b, kernel)
  mu_aa = mu_a * mu_a
  mu_bb = mu_b * mu_b
  mu_ab = mu_a * mu_b
  sigma_aa = _filter2d_separable(a * a, kernel) - mu_aa
  sigma_bb = _filter2d_separable(b * b, kernel) - mu_bb
  sigma_ab = _filter2d_separable(a * b, kernel) - mu_ab
  # Float cancellation in E[x²]−µ² can produce slightly negative variances
  # and covariances beyond the Cauchy–Schwarz bound; on near-constant
  # patches that pushes the cs term past 1 and MS-SSIM above 1 (observed
  # 1.01 on real renders). Clamping restores the mathematical guarantees
  # (variance ≥ 0, |σ_ab| ≤ √(σ_aa σ_bb)) so SSIM/MS-SSIM ∈ [−1, 1].
  sigma_aa = jnp.maximum(sigma_aa, 0.0)
  sigma_bb = jnp.maximum(sigma_bb, 0.0)
  bound = jnp.sqrt(sigma_aa * sigma_bb)
  sigma_ab = jnp.clip(sigma_ab, -bound, bound)
  c1 = (k1 * max_val) ** 2
  c2 = (k2 * max_val) ** 2
  luminance = (2 * mu_ab + c1) / (mu_aa + mu_bb + c1)
  cs = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
  ssim_map = luminance * cs
  if return_map:
    return ssim_map
  return jnp.mean(ssim_map), jnp.mean(cs)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _downsample2x(img):
  """2x average-pool downsample, [H, W, C]."""
  h, w, c = img.shape
  h2, w2 = h // 2, w // 2
  img = img[:h2 * 2, :w2 * 2]
  return img.reshape(h2, 2, w2, 2, c).mean(axis=(1, 3))


def compute_msssim(a, b, max_val: float = 1.0):
  """Multi-scale SSIM (5 scales, standard weights) — the jnp analog of
  ``tf.image.ssim_multiscale``. Images must be at least 176×176 for the full
  5 scales; fewer scales are used (renormalised weights) when smaller."""
  levels = len(_MSSSIM_WEIGHTS)
  min_dim = min(a.shape[0], a.shape[1])
  usable = min(levels, max(1, int(np.floor(np.log2(min_dim / 11))) + 1))
  weights = np.asarray(_MSSSIM_WEIGHTS[:usable])
  weights = weights / weights.sum()
  mcs = []
  ssim_val = None
  for i in range(usable):
    ssim_val, cs = compute_ssim(a, b, max_val)
    if i < usable - 1:
      mcs.append(jnp.maximum(cs, 0.0))
      a = _downsample2x(a)
      b = _downsample2x(b)
  result = jnp.asarray(1.0)
  for i, cs in enumerate(mcs):
    result = result * cs ** weights[i]
  return result * jnp.maximum(ssim_val, 0.0) ** weights[-1]


class LpipsMetric:
  """LPIPS via torch (optional; AlexNet features, matching the reference's
  utils/calculate_quantitative_results.py:23-49). Gated: constructing raises
  ImportError when the `lpips` package is unavailable (it needs pretrained
  AlexNet + learned linear weights, which cannot be fetched offline — see
  README "metrics" note; tests/test_metrics.py covers the prep structurally
  and importorskips the full metric)."""

  def __init__(self, net: str = 'alex'):
    import lpips  # noqa: F401 (optional dependency)
    import torch
    self._torch = torch
    self._model = lpips.LPIPS(net=net)

  @staticmethod
  def prep(x: np.ndarray, torch=None):
    """[H, W, C] float image in [0, 1] -> [1, C, H, W] tensor in [-1, 1].

    The exact input convention of the reference's LPIPS call
    (calculate_quantitative_results.py:34-41: ``im2tensor``-style CHW +
    [-1, 1] scaling). Separated from __call__ so the convention is
    testable without the lpips weights."""
    if torch is None:
      import torch
    t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
    return t * 2.0 - 1.0

  def __call__(self, a: np.ndarray, b: np.ndarray) -> float:
    torch = self._torch
    with torch.no_grad():
      return float(self._model(self.prep(a, torch),
                               self.prep(b, torch)).item())


def compute_all(pred: np.ndarray, target: np.ndarray,
                lpips_metric: Optional[LpipsMetric] = None):
  """The reference's metric set over one image pair."""
  pred_j = jnp.asarray(pred)
  target_j = jnp.asarray(target)
  out = {
      'mse': float(compute_mse(pred_j, target_j)),
      'psnr': float(compute_psnr(pred_j, target_j)),
      'ssim': float(compute_ssim(pred_j, target_j)[0]),
      'ms_ssim': float(compute_msssim(pred_j, target_j)),
  }
  if lpips_metric is not None:
    out['lpips'] = lpips_metric(pred, target)
  return out
