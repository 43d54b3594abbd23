"""Batched rigid-body math (L0).

TPU-first restructuring of the reference's per-point SE(3) exponential
(``hypernerf/rigid_body.py:26-109``): the reference builds a 4x4 homogeneous
matrix per sample point under two nested ``vmap``s; here every op is a closed
Rodrigues-form expression over ``[..., 3]`` arrays — pure VPU elementwise math
with no small matmuls, no matrix assembly and no vmap. This is both faster and
transposes cleanly for the second-order AD used by the sigma-gradient path.

Identities used (Modern Robotics eqns 3.51 / 3.88):
  R x   = x cosθ + (w × x) sinθ + w (w·x)(1 − cosθ)
  p     = θ v + (1 − cosθ)(w × v) + (θ − sinθ)(w (w·v) − v)
with ``w, v`` the unit screw axis halves and θ the rotation magnitude.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Screw(NamedTuple):
  """A batch of screw motions: unit rotation axis, unit-θ translation, angle."""
  w: jnp.ndarray      # [..., 3] unit rotation axis
  v: jnp.ndarray      # [..., 3] translation part of the screw axis
  theta: jnp.ndarray  # [...] rotation magnitude

  @property
  def axis(self) -> jnp.ndarray:
    """The 6-dim screw axis [w, v] (reference warping.py:222)."""
    return jnp.concatenate([self.w, self.v], axis=-1)


def screw_from_raw(w_raw: jnp.ndarray, v_raw: jnp.ndarray,
                   eps: float = 1e-12) -> Screw:
  """Normalises raw (w, v) MLP outputs into a screw, θ = ‖w‖.

  Matches reference warping.py:219-222 (division by θ) except for the
  ``eps`` clamp: the reference divides by θ unguarded and NaNs if a ReLU
  trunk emits an exact-zero row (its 128-wide trunks make that improbable;
  narrow configs hit it at init). θ at init is ~1e-5, so the 1e-12 clamp is
  numerically inert on any real trajectory; at θ=0 it yields the identity
  transform instead of NaN.
  """
  theta = jnp.linalg.norm(w_raw, axis=-1)
  denom = jnp.maximum(theta, eps)[..., None]
  w = w_raw / denom
  v = v_raw / denom
  return Screw(w=w, v=v, theta=theta)


def _cross(a, b):
  return jnp.cross(a, b)


def rotate(screw, x: jnp.ndarray) -> jnp.ndarray:
  """Applies R = exp(θ[w]ₓ) to vectors x, Rodrigues form. x: [..., 3].

  Accepts any motion object exposing ``.rotate`` (e.g.
  ``dual_quaternion.DualQuatMotion``); the closed form below is the
  :class:`Screw` fast path.
  """
  if not isinstance(screw, Screw):
    return screw.rotate(x)
  theta = screw.theta[..., None]
  cos, sin = jnp.cos(theta), jnp.sin(theta)
  w = screw.w
  return (x * cos + _cross(w, x) * sin
          + w * jnp.sum(w * x, axis=-1, keepdims=True) * (1.0 - cos))


def rotate_inverse(screw, x: jnp.ndarray) -> jnp.ndarray:
  """Applies Rᵀ to vectors x (rotation by −θ about the same axis)."""
  if not isinstance(screw, Screw):
    return screw.rotate_inverse(x)
  theta = screw.theta[..., None]
  cos, sin = jnp.cos(theta), jnp.sin(theta)
  w = screw.w
  return (x * cos - _cross(w, x) * sin
          + w * jnp.sum(w * x, axis=-1, keepdims=True) * (1.0 - cos))


def translation(screw) -> jnp.ndarray:
  """p = (θI + (1−cosθ)[w]ₓ + (θ−sinθ)[w]ₓ²) v  (rigid_body.py:94-95)."""
  if not isinstance(screw, Screw):
    return screw.translation_vec()
  theta = screw.theta[..., None]
  cos, sin = jnp.cos(theta), jnp.sin(theta)
  w, v = screw.w, screw.v
  wxv = _cross(w, v)
  wwv = w * jnp.sum(w * v, axis=-1, keepdims=True) - v  # [w]ₓ² v
  return theta * v + (1.0 - cos) * wxv + (theta - sin) * wwv


def transform_point(screw, x: jnp.ndarray) -> jnp.ndarray:
  """Full SE(3) action R x + p (reference exp_se3 + homogeneous apply)."""
  if not isinstance(screw, Screw):
    return screw.transform_point(x)
  return rotate(screw, x) + translation(screw)


def transform_point_inverse(screw: Screw, x: jnp.ndarray) -> jnp.ndarray:
  """Inverse SE(3) action Rᵀ(x − p) (reference exp_se3 inverse=True)."""
  return rotate_inverse(screw, x - translation(screw))


def rotation_matrix(screw: Screw) -> jnp.ndarray:
  """Materialises R as [..., 3, 3] (only needed for tests/diagnostics)."""
  eye = jnp.broadcast_to(jnp.eye(3), (*screw.theta.shape, 3, 3))
  cols = [rotate(screw, eye[..., i, :]) for i in range(3)]
  # rotate() maps basis row-vectors through R, giving R's columns.
  return jnp.stack(cols, axis=-1)


# -- Matrix-form reference API (kept for parity tests and the bone field) ----


def skew(w: jnp.ndarray) -> jnp.ndarray:
  """Batched cross-product matrix, w: [..., 3] -> [..., 3, 3]."""
  zeros = jnp.zeros_like(w[..., 0])
  wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
  rows = jnp.stack([
      jnp.stack([zeros, -wz, wy], axis=-1),
      jnp.stack([wz, zeros, -wx], axis=-1),
      jnp.stack([-wy, wx, zeros], axis=-1),
  ], axis=-2)
  return rows


def exp_so3(w: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
  """Batched Rodrigues formula -> [..., 3, 3] (reference rigid_body.py:59-74)."""
  big_w = skew(w)
  theta = theta[..., None, None]
  eye = jnp.broadcast_to(jnp.eye(3), big_w.shape)
  return (eye + jnp.sin(theta) * big_w
          + (1.0 - jnp.cos(theta)) * jnp.matmul(
              big_w, big_w, precision=jax.lax.Precision.HIGHEST))


def exp_se3_matrix(screw_axis: jnp.ndarray, theta: jnp.ndarray,
                   rotation_only: bool = False,
                   inverse: bool = False) -> jnp.ndarray:
  """Batched 4x4 homogeneous exp map (reference rigid_body.py:77-101).

  Kept only as the golden matrix-form implementation; the hot paths use the
  vector-form helpers above.
  """
  w, v = jnp.split(screw_axis, 2, axis=-1)
  big_w = skew(w)
  rot = exp_so3(w, theta)
  th = theta[..., None, None]
  eye = jnp.broadcast_to(jnp.eye(3), big_w.shape)
  p_mat = (th * eye + (1.0 - jnp.cos(th)) * big_w
           + (th - jnp.sin(th)) * jnp.matmul(
               big_w, big_w, precision=jax.lax.Precision.HIGHEST))
  p = jnp.matmul(p_mat, v[..., None],
                 precision=jax.lax.Precision.HIGHEST)[..., 0]
  if rotation_only:
    p = p * 0
  if inverse:
    rot_t = jnp.swapaxes(rot, -1, -2)
    p = -jnp.matmul(rot_t, p[..., None],
                    precision=jax.lax.Precision.HIGHEST)[..., 0]
    rot = rot_t
  top = jnp.concatenate([rot, p[..., None]], axis=-1)
  bottom = jnp.broadcast_to(
      jnp.array([0.0, 0.0, 0.0, 1.0]), (*top.shape[:-2], 1, 4))
  return jnp.concatenate([top, bottom], axis=-2)


def to_homogenous(v):
  return jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)


def from_homogenous(v):
  return v[..., :3] / v[..., -1:]


def batched_jacobian(fn, points: jnp.ndarray,
                     *args) -> jnp.ndarray:
  """Jacobian d fn(points)/d points for a pointwise-batched fn, via 3 JVPs.

  ``fn(points, *args) -> [..., 3]`` must act independently per point.
  Returns [..., 3, 3] with J[..., i, j] = d out_i / d x_j — equivalent to the
  reference's ``jax.jacfwd`` per point (warping.py:276-279) but batched:
  three forward-mode passes with basis tangents instead of a vmap'd jacfwd.
  """
  cols = []
  for j in range(3):
    tangent = jnp.zeros_like(points).at[..., j].set(1.0)
    _, jvp_out = jax.jvp(lambda p: fn(p, *args), (points,), (tangent,))
    cols.append(jvp_out)
  return jnp.stack(cols, axis=-1)
