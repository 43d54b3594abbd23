"""Core math primitives (L0).

Pure jnp functions: positional encoding with windowed annealing, safe norms,
robust (Barron) losses, reflection, PSNR. Behavioural parity targets are the
reference's ``hypernerf/model_utils.py`` (posenc :398-436, normalize :438-442,
cal_ref_radiance :473-484) and ``hypernerf/utils.py`` (safe_norm :56-90,
general loss :207-264, curl/div :93-113, psnr :116-125, clip :32-47).
All functions are shape-polymorphic over leading batch dims and are designed
to fuse into the surrounding computation under XLA (elementwise + small
reductions only; no data-dependent shapes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

F32_EPS = jnp.finfo(jnp.float32).eps


def matmul_hp(a, b):
  """Highest-precision matmul (TPU otherwise lowers f32 dots to bf16 passes)."""
  return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def posenc_window(min_deg: int, max_deg: int, alpha) -> jnp.ndarray:
  """Truncated-Hann coarse-to-fine window over frequency bands.

  Eases band ``b`` in as ``alpha`` sweeps past it (BARF-style annealing;
  reference model_utils.py:420-436). Returns shape ``[max_deg - min_deg]``.
  """
  bands = jnp.arange(min_deg, max_deg, dtype=jnp.float32)
  x = jnp.clip(alpha - bands, 0.0, 1.0)
  return 0.5 * (1.0 + jnp.cos(jnp.pi * x + jnp.pi))


def posenc(x: jnp.ndarray,
           min_deg: int,
           max_deg: int,
           use_identity: bool = False,
           alpha=None) -> jnp.ndarray:
  """Sinusoidal encoding at frequencies 2^[min_deg, max_deg).

  Feature layout matches the reference (model_utils.py:398-417): per band
  ``[sin(sx), sin(sy), sin(sz), cos(sx), cos(sy), cos(sz)]``, bands stacked
  along the channel dim, optionally prefixed by the identity.
  """
  if max_deg == min_deg:
    return x if use_identity else jnp.zeros_like(x[..., :0])
  batch_shape = x.shape[:-1]
  num_bands = max_deg - min_deg
  channels = x.shape[-1]
  # TPU note: all heavy math runs on rank-2 [batch, F*C] tensors. Stacking
  # sin/cos on an inner axis first (the reference layout) puts C=2..3 in the
  # tiled minor dims, padding every vector op out to the (8, 128) tile —
  # measured ~5% of the whole training step in pure lane-padding waste.
  scales = 2.0 ** jnp.arange(min_deg, max_deg, dtype=x.dtype)
  xb = (x[..., None, :] * scales[:, None]).reshape(*batch_shape, -1)  # (*, F*C)
  sin_feat = jnp.sin(xb)
  cos_feat = jnp.sin(xb + 0.5 * jnp.pi)  # reference computes cos this way
  if alpha is not None:
    window = posenc_window(min_deg, max_deg, alpha)
    window = jnp.repeat(window, channels)                   # (F*C,)
    sin_feat = window * sin_feat
    cos_feat = window * cos_feat
  # Interleave to the reference channel order (band-major, sin block then
  # cos block per band); XLA fuses the concat+reshape into the output write.
  four_feat = jnp.concatenate(
      [sin_feat.reshape(*batch_shape, num_bands, 1, channels),
       cos_feat.reshape(*batch_shape, num_bands, 1, channels)],
      axis=-2).reshape(*batch_shape, -1)
  if use_identity:
    return jnp.concatenate([x, four_feat], axis=-1)
  return four_feat


def posenc_dim(in_dim: int, min_deg: int, max_deg: int,
               use_identity: bool = False) -> int:
  """Static channel count of :func:`posenc` for shape planning."""
  return in_dim * 2 * (max_deg - min_deg) + (in_dim if use_identity else 0)


def normalize(v: jnp.ndarray, eps: float = float(F32_EPS)) -> jnp.ndarray:
  """Safe L2 normalisation (reference normalize_vector, model_utils.py:438)."""
  return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


# pylint: disable=unused-argument
@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def safe_norm(x, axis=-1, keepdims=False, tol=1e-9):
  """L2 norm whose gradient is zeroed near 0 (reference utils.py:56-90)."""
  return jnp.linalg.norm(x, axis=axis, keepdims=keepdims)


@safe_norm.defjvp
def _safe_norm_jvp(axis, keepdims, tol, primals, tangents):
  (x,) = primals
  (x_dot,) = tangents
  safe_tol = max(tol, 1e-30)
  y = safe_norm(x, tol=safe_tol, axis=axis, keepdims=True)
  y_safe = jnp.maximum(y, tol)
  y_dot = jnp.where(y > safe_tol, x_dot * x / y_safe, jnp.zeros_like(x))
  y_dot = jnp.sum(y_dot, axis=axis, keepdims=True)
  if not keepdims:
    y = jnp.squeeze(y, axis=axis)
    y_dot = jnp.squeeze(y_dot, axis=axis)
  return y, y_dot


def safe_sqrt(x, eps: float = 1e-7):
  safe_x = jnp.where(x == 0, jnp.ones_like(x) * eps, x)
  return jnp.sqrt(safe_x)


def general_loss_with_squared_residual(x_sq, alpha, scale):
  """Barron's general robust loss on squared residuals (utils.py:207-264).

  alpha=-2 -> Geman-McClure, 0 -> Cauchy, 2 -> L2, ±inf -> Welsch/exp.
  """
  eps = F32_EPS
  scale = jnp.maximum(eps, scale)
  loss_two = 0.5 * x_sq / (scale ** 2)
  log1p_safe = lambda v: jnp.log1p(jnp.minimum(v, 3e37))
  expm1_safe = lambda v: jnp.expm1(jnp.minimum(v, 87.5))
  a = jnp.where(alpha >= 0, jnp.ones_like(alpha),
                -jnp.ones_like(alpha)) * jnp.maximum(eps, jnp.abs(alpha))
  b = jnp.maximum(eps, jnp.abs(alpha - 2))
  loss_ow = (b / a) * ((loss_two / (0.5 * b) + 1) ** (0.5 * alpha) - 1)
  return scale * jnp.where(
      alpha == -jnp.inf, -expm1_safe(-loss_two),
      jnp.where(
          alpha == 0, log1p_safe(loss_two),
          jnp.where(alpha == 2, loss_two,
                    jnp.where(alpha == jnp.inf, expm1_safe(loss_two),
                              loss_ow))))


def l2_loss(x):
  return x ** 2


def shrinkage_loss(x, a: float = 10.0, c: float = 1e-2):
  """Shrinkage loss (reference utils.py:496-497)."""
  return (x ** 2) / (1 + jnp.exp(a * (c - x)))


def gm_loss(x, scale):
  """Geman-McClure loss (reference utils.py:267-274)."""
  square = jnp.square(x / scale)
  return 2 * square / jnp.maximum(square + 4, F32_EPS)


def compute_psnr(mse):
  """PSNR from MSE assuming max pixel value 1 (reference utils.py:116-125)."""
  return -10.0 * jnp.log(mse) / jnp.log(10.0)


def reflect(d, n):
  """Reflected radiance direction 2(d·n)n − d (model_utils.py:473-484).

  Both inputs are normalised internally, matching the reference.
  """
  d = normalize(d)
  n = normalize(n)
  return 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n - d


def jacobian_to_curl(jacobian):
  """Curl from a (*, 3, 3) Jacobian (reference utils.py:93-106)."""
  dfx_dy = jacobian[..., 0, 1]
  dfx_dz = jacobian[..., 0, 2]
  dfy_dx = jacobian[..., 1, 0]
  dfy_dz = jacobian[..., 1, 2]
  dfz_dx = jacobian[..., 2, 0]
  dfz_dy = jacobian[..., 2, 1]
  return jnp.stack(
      [dfz_dy - dfy_dz, dfx_dz - dfz_dx, dfy_dx - dfx_dy], axis=-1)


def jacobian_to_div(jacobian):
  """Divergence (trace − 3) from a (*, 3, 3) Jacobian (utils.py:109-113)."""
  return jnp.trace(jacobian, axis1=-2, axis2=-1) - 3.0


def clip_gradients(grad, grad_max_val: float = 0.0, grad_max_norm: float = 0.0,
                   eps: float = 1e-7):
  """Value- then norm-clip a gradient pytree (reference utils.py:32-47)."""
  if grad_max_val > 0:
    grad = jax.tree_util.tree_map(
        lambda z: jnp.clip(z, -grad_max_val, grad_max_val), grad)
  if grad_max_norm > 0:
    grad_norm = safe_sqrt(
        jax.tree_util.tree_reduce(
            lambda x, y: x + jnp.sum(y ** 2), grad, initializer=0.0))
    mult = jnp.minimum(1.0, grad_max_norm / (eps + grad_norm))
    grad = jax.tree_util.tree_map(lambda z: mult * z, grad)
  return grad


def grid_sample(image: jnp.ndarray, coord: jnp.ndarray) -> jnp.ndarray:
  """2D bilinear sampling of an ``[H, W]`` image at float (x, y) coords.

  Edge-padded, clamped to bounds; matches reference utils.py:438-489 (used by
  the mask-consistency loss). ``coord[..., 0]`` is x, ``coord[..., 1]`` is y.
  """
  batch_shape = coord.shape[:-1]
  coord = coord.reshape([-1, 2])
  coord = jnp.stack([coord[:, 1], coord[:, 0]], axis=-1)  # (y, x)

  height, width = image.shape
  max_bounds = jnp.array([height, width], dtype=coord.dtype)
  coord = jnp.clip(coord, 0, max_bounds)

  image = jnp.pad(image, 1, mode='edge')
  coord = coord + 1

  floor_coord = jnp.floor(coord).astype(jnp.int32)
  offsets = jnp.array([[0, 0], [0, 1], [1, 0], [1, 1]])
  corner_coord = floor_coord[:, None, :] + offsets            # N x 4 x 2
  corner_values = image[corner_coord[..., 0], corner_coord[..., 1]]  # N x 4

  local = coord - floor_coord
  ly, lx = local[..., 0], local[..., 1]
  weights = jnp.stack(
      [(1 - lx) * (1 - ly), lx * (1 - ly), (1 - lx) * ly, lx * ly], axis=-1)
  return jnp.sum(corner_values * weights, axis=-1).reshape(batch_shape)


def get_trilinear_coefficient(pos: jnp.ndarray) -> jnp.ndarray:
  """Trilinear interp weights for unit-cube positions (model_utils.py:445-471).

  pos: [N, 3] in [0, 1]. Returns [N, 8] weights ordered
  [C000, C100, C010, C110, C001, C101, C011, C111].
  """
  neg = 1.0 - pos
  x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
  nx, ny, nz = neg[:, 0], neg[:, 1], neg[:, 2]
  cx = jnp.stack([nx, x, nx, x, nx, x, nx, x], axis=-1)
  cy = jnp.stack([ny, ny, y, y, ny, ny, y, y], axis=-1)
  cz = jnp.stack([nz, nz, nz, nz, z, z, z, z], axis=-1)
  return cx * cy * cz
