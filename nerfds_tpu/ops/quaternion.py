"""Quaternion math (L0), xyzw convention, batched over leading dims.

Parity target: reference ``hypernerf/quaternion.py:26-227`` (used by the
skeleton/bone warp field). All ops broadcast over leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

from nerfds_tpu.ops.math import safe_norm


def im(q):
  """Imaginary (vector) part."""
  return q[..., :3]


def re(q):
  """Real (scalar) part."""
  return q[..., 3:]


def identity(dtype=jnp.float32):
  return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def conjugate(q):
  return jnp.concatenate([-im(q), re(q)], axis=-1)


def norm(q):
  return safe_norm(q, axis=-1, keepdims=True)


def normalize(q):
  return q / norm(q)


def inverse(q):
  return conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def multiply(q1, q2):
  """Hamilton product (xyzw)."""
  c = (re(q1) * im(q2) + re(q2) * im(q1)
       + jnp.cross(im(q1), im(q2)))
  w = re(q1) * re(q2) - jnp.sum(im(q1) * im(q2), axis=-1, keepdims=True)
  return jnp.concatenate([c, w], axis=-1)


def rotate(q, v):
  """Rotate vectors v by unit quaternions q."""
  qv = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
  return im(multiply(multiply(q, qv), conjugate(q)))


def log(q, eps: float = 1e-8):
  """Quaternion logarithm."""
  mag = norm(q)
  v = im(q)
  s = re(q)
  w = jnp.log(mag)
  denom = jnp.maximum(
      safe_norm(v, axis=-1, keepdims=True), eps * jnp.ones_like(v[..., :1]))
  xyz = v / denom * jnp.arccos(jnp.clip(s / mag, -1.0, 1.0))
  return jnp.concatenate([xyz, w], axis=-1)


def exp(q, eps: float = 1e-8):
  """Quaternion exponential."""
  v = im(q)
  s = re(q)
  norm_v = jnp.maximum(
      safe_norm(v, axis=-1, keepdims=True), eps * jnp.ones_like(v[..., :1]))
  scale = jnp.exp(s)
  xyz = scale * v / norm_v * jnp.sin(norm_v)
  w = scale * jnp.cos(norm_v)
  return jnp.concatenate([xyz, w], axis=-1)


def from_axis_angle(axis, theta):
  """Unit quaternion from rotation axis (unit) and angle. theta: [...]."""
  half = theta[..., None] * 0.5
  return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def to_rotation_matrix(q):
  """Unit quaternion (xyzw) -> rotation matrix [..., 3, 3]."""
  x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                    2 * (x * z + w * y)], axis=-1)
  row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x)], axis=-1)
  row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y)], axis=-1)
  return jnp.stack([row0, row1, row2], axis=-2)


def from_rotation_matrix(m, eps: float = 1e-9):
  """Rotation matrix [..., 3, 3] -> unit quaternion (xyzw), Shepperd-free.

  Uses the numerically-safe branchless trace construction.
  """
  trace = jnp.trace(m, axis1=-2, axis2=-1)
  w = 0.5 * jnp.sqrt(jnp.maximum(trace + 1.0, eps))
  denom = jnp.maximum(4.0 * w, eps)
  x = (m[..., 2, 1] - m[..., 1, 2]) / denom
  y = (m[..., 0, 2] - m[..., 2, 0]) / denom
  z = (m[..., 1, 0] - m[..., 0, 1]) / denom
  return normalize(jnp.stack([x, y, z, w], axis=-1))
