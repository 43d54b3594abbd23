"""Dual-quaternion math + rigid motion (L0).

Batched rebuild of the reference's ``hypernerf/dual_quaternion.py`` (:29-129
— dead code there: nothing imports it, but the BASELINE north star names
"SE(3)/dual-quaternion deformation-field warping", so the capability exists
here as a live warp-field variant, ``warp_field_type='dual_quaternion'``).

Encoding matches the reference: ``[rx, ry, rz, rw, dx, dy, dz, dw]`` for
r + εd with xyzw quaternions (``ops/quaternion.py``). All ops are batched
over leading axes.

:class:`DualQuatMotion` adapts a unit dual quaternion to the rigid-motion
surface the model consumes (`rotate`, `rotate_inverse`, `translation_vec`,
`transform_point`, `.axis`) — the same contract :class:`ops.rigid.Screw`
satisfies, so the NeRF-DS normal-transport machinery works with either
parameterisation unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from nerfds_tpu.ops import quaternion


def real_part(dq):
  return dq[..., :4]


def dual_part(dq):
  return dq[..., 4:]


def join_parts(real, dual):
  return jnp.concatenate([real, dual], axis=-1)


def identity(dtype=jnp.float32):
  return jnp.asarray([0., 0., 0., 1., 0., 0., 0., 0.], dtype=dtype)


def multiply(dq1, dq2):
  """(a + εb)(c + εd) = ac + ε(ad + bc). Batched."""
  a, b = real_part(dq1), dual_part(dq1)
  c, d = real_part(dq2), dual_part(dq2)
  real = quaternion.multiply(a, c)
  dual = quaternion.multiply(a, d) + quaternion.multiply(b, c)
  return join_parts(real, dual)


def quaternion_conjugate(dq):
  return join_parts(quaternion.conjugate(real_part(dq)),
                    quaternion.conjugate(dual_part(dq)))


def dual_conjugate(dq):
  return join_parts(real_part(dq), -dual_part(dq))


def quaternion_dual_conjugate(dq):
  return join_parts(-quaternion.conjugate(real_part(dq)),
                    -quaternion.conjugate(dual_part(dq)))


def normalize(dq, eps: float = 1e-12):
  real, dual = real_part(dq), dual_part(dq)
  real_norm = jnp.maximum(quaternion.norm(real), eps)
  return join_parts(real / real_norm, dual / real_norm)


def get_rotation(dq):
  return real_part(dq)


def get_translation(dq):
  """t = 2 · Im(d r*) for a unit dual quaternion."""
  real, dual = real_part(dq), dual_part(dq)
  return 2.0 * quaternion.im(
      quaternion.multiply(dual, quaternion.conjugate(real)))


def from_rotation_translation(q, t):
  """Unit dual quaternion for 'rotate by q then translate by t'."""
  t4 = jnp.concatenate([t, jnp.zeros_like(t[..., -1:])], axis=-1)
  ident = jnp.broadcast_to(quaternion.identity(q.dtype), q.shape)
  dq_t = join_parts(ident, 0.5 * t4)
  dq_r = join_parts(q, jnp.zeros_like(q))
  return multiply(dq_t, dq_r)


def transform_point(dq, p):
  """Applies the rigid motion: p' = R(r) p + t, computed quaternionically."""
  r = real_part(dq)
  return quaternion.rotate(r, p) + get_translation(dq)


class DualQuatMotion(NamedTuple):
  """A batch of rigid motions parameterised by a unit dual quaternion.

  Exposes the same motion surface as :class:`ops.rigid.Screw` so the model's
  shared-motion machinery (point warp, inverse normal transport, field
  visualisations, screw-axis rgb conditioning) is parameterisation-agnostic.
  """
  dq: jnp.ndarray  # [..., 8], unit (normalized real part)

  def rotate(self, x):
    return quaternion.rotate(real_part(self.dq), x)

  def rotate_inverse(self, x):
    return quaternion.rotate(quaternion.conjugate(real_part(self.dq)), x)

  def translation_vec(self):
    return get_translation(self.dq)

  def transform_point(self, x):
    return transform_point(self.dq, x)

  @property
  def axis(self) -> jnp.ndarray:
    """6-dim motion descriptor [rotation vector, translation] — the
    dual-quaternion analog of the screw axis used by
    ``screw_input_mode`` rgb conditioning (rotation part = axis·angle/2
    from the quaternion log, translation part = t)."""
    rot_vec = quaternion.im(quaternion.log(
        quaternion.normalize(real_part(self.dq))))
    return jnp.concatenate([rot_vec, self.translation_vec()], axis=-1)
