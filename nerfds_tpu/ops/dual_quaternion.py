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
    """The 6-dim unit screw axis [w, v] — same semantics as
    :attr:`ops.rigid.Screw.axis` (reference warping.py:222), so the
    ``screw_input_mode`` rgb conditioning sees an identical descriptor
    scale under either warp parameterisation.

    w is the unit rotation axis; v is the unit-θ translation component,
    recovered from (R, t) via the closed-form SE(3) log:
    t = G(θ, w) v with G = θI + (1−cosθ)[w]ₓ + (θ−sinθ)[w]ₓ², whose
    inverse is G⁻¹ = I/θ − [w]ₓ/2 + (1/θ − cot(θ/2)/2)[w]ₓ².
    """
    eps = 1e-12
    # q = [sin(θ/2)·w, cos(θ/2)]; θ/2 = atan2(‖im‖, re) is stable at small
    # angles where arccos(re) collapses to 0 in f32 (the init regime).
    qn = quaternion.normalize(real_part(self.dq))
    v_im = quaternion.im(qn)
    sin_half = jnp.linalg.norm(v_im, axis=-1)
    theta = 2.0 * jnp.arctan2(sin_half, qn[..., 3])
    w = v_im / jnp.maximum(sin_half, eps)[..., None]
    t = self.translation_vec()
    safe_theta = jnp.maximum(theta, eps)[..., None]
    # c(θ) = 1/θ − cot(θ/2)/2, Taylor θ/12 + θ³/720 + … near 0.
    small = theta < 1e-3
    guarded = jnp.where(small, 1.0, theta)
    c_exact = 1.0 / guarded - 0.5 / jnp.tan(guarded / 2.0)
    c = jnp.where(small, theta / 12.0, c_exact)[..., None]
    wxt = jnp.cross(w, t)
    v = t / safe_theta - 0.5 * wxt + c * jnp.cross(w, wxt)
    return jnp.concatenate([w, v], axis=-1)
