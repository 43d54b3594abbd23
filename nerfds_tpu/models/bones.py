"""Skeleton (bone) warp field (L3).

Parity target: reference ``hypernerf/warping.py`` BoneSE3Field (:284-531) +
``bone_utils.py`` (:8-72): per-bone SE(3) screws from an MLP conditioned on
(bone one-hot, warp embed); warped Gaussian bones; Mahalanobis skinning
probabilities -> softmax weights; inverse LBS blend; a moving-mask MLP
gating deformation. Disabled in every shipped config (``use_bone=False``,
models.py:225).

The reference implementation contains shape bugs for batches > 1 point
(its ``broadcast_to`` calls only typecheck for N==1, warping.py:428-430);
this is a corrected batched formulation: everything is ``[N, B, ...]``
einsum-style with no per-point vmap.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from nerfds_tpu.models import mlp as mlp_lib
from nerfds_tpu.ops import quaternion, rigid


def bone_probs(points, bone_centers, bone_scales, bone_rotations,
               eps: float = 1e-6):
  """Gaussian membership of points in oriented bones.

  points [N, 3]; bone_centers [N, B, 3]; bone_scales [B, 3] (variances);
  bone_rotations [N, B, 3, 3]. Returns [N, B].
  """
  delta = points[:, None, :] - bone_centers                       # N, B, 3
  # Rotate into each bone's frame: Rᵀ δ.
  delta = jnp.einsum('nbij,nbi->nbj', bone_rotations, delta)
  scales = jnp.abs(bone_scales) + eps                             # B, 3
  m_sq = jnp.sum(jnp.square(delta) / scales[None], axis=-1)       # N, B
  normalizer = 1.0 / jnp.sqrt(2 * jnp.pi * jnp.prod(scales, axis=-1))
  return normalizer[None] * jnp.exp(-0.5 * m_sq)


@dataclasses.dataclass(frozen=True)
class BoneSE3Field:
  """Per-bone rigid motion + Mahalanobis skinning + moving-mask gate."""
  num_bones: int = 3
  trunk_depth: int = 4
  trunk_width: int = 32
  skips: Tuple[int, ...] = (4,)
  moving_mlp_depth: int = 6
  moving_mlp_width: int = 128

  @property
  def trunk(self) -> mlp_lib.MLP:
    return mlp_lib.MLP(depth=self.trunk_depth, width=self.trunk_width,
                       skips=self.skips,
                       hidden_init=jax.nn.initializers.xavier_uniform())

  @property
  def moving_mlp(self) -> mlp_lib.MLP:
    return mlp_lib.MLP(depth=self.moving_mlp_depth,
                       width=self.moving_mlp_width,
                       hidden_init=jax.nn.initializers.xavier_uniform(),
                       output_init=jax.nn.initializers.uniform(scale=1e-4),
                       output_channels=1)

  def init(self, key, metadata_dim: int):
    k_trunk, k_w, k_v, k_bones, k_moving = jax.random.split(key, 5)
    kc, ks, kq = jax.random.split(k_bones, 3)
    xavier = jax.nn.initializers.xavier_uniform()
    return {
        'trunk': self.trunk.init(k_trunk, self.num_bones + metadata_dim),
        'w': mlp_lib.dense_init(
            k_w, self.trunk_width, 3,
            kernel_init=jax.nn.initializers.uniform(scale=1e-4)),
        'v': mlp_lib.dense_init(
            k_v, self.trunk_width, 3,
            kernel_init=jax.nn.initializers.uniform(scale=1e-4)),
        'bone_centers': xavier(kc, (self.num_bones, 3), jnp.float32),
        'bone_scales': xavier(ks, (self.num_bones, 3), jnp.float32),
        'bone_quaternions': xavier(kq, (self.num_bones, 4), jnp.float32),
        'moving_mlp': self.moving_mlp.init(k_moving, 3 + metadata_dim),
    }

  def bone_screws(self, params, metadata_embed, precision=None):
    """Per-(point, bone) screws from (one-hot bone id ⊕ embed). [N,B]."""
    n = metadata_embed.shape[0]
    bone_idx = jnp.broadcast_to(jnp.eye(self.num_bones)[None],
                                (n, self.num_bones, self.num_bones))
    embed = jnp.broadcast_to(metadata_embed[:, None, :],
                             (n, self.num_bones, metadata_embed.shape[-1]))
    inputs = jnp.concatenate([bone_idx, embed], axis=-1)
    flat = inputs.reshape(n * self.num_bones, -1)
    trunk_out = self.trunk.apply(params['trunk'], flat, precision=precision)
    w = mlp_lib.dense_apply(params['w'], trunk_out, precision=precision)
    v = mlp_lib.dense_apply(params['v'], trunk_out, precision=precision)
    screw = rigid.screw_from_raw(w, v)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(n, self.num_bones, *x.shape[1:]), screw)

  def moving_mask(self, params, points, metadata_embed, precision=None):
    inputs = jnp.concatenate([points, metadata_embed], axis=-1)
    return jax.nn.sigmoid(
        self.moving_mlp.apply(params['moving_mlp'], inputs,
                              precision=precision))

  def warp(self, params, points, metadata_embed, precision=None):
    """Inverse-LBS warp of observation points into canonical space.

    points [N, 3], metadata_embed [N, E]. Returns dict with
    warped_points [N, 3], bone_weights [N, B], moving_mask [N, 1].
    """
    n = points.shape[0]
    screws = self.bone_screws(params, metadata_embed, precision)  # [N, B]

    # Forward-warped bones for skinning weights.
    centers = jnp.broadcast_to(params['bone_centers'][None],
                               (n, self.num_bones, 3))
    warped_centers = rigid.transform_point(screws, centers)
    base_rot = quaternion.to_rotation_matrix(
        quaternion.normalize(params['bone_quaternions']))        # B, 3, 3
    # Rotation matrices of the screws, batched over (N, B).
    eye = jnp.broadcast_to(jnp.eye(3), (n, self.num_bones, 3, 3))
    screw_rot = jnp.stack(
        [rigid.rotate(screws, eye[..., i, :]) for i in range(3)], axis=-1)
    warped_rot = jnp.einsum('nbij,bjk->nbik', screw_rot, base_rot)

    weights = jax.nn.softmax(
        bone_probs(points, warped_centers, params['bone_scales'],
                   warped_rot), axis=-1)                          # N, B

    # Backward (inverse) warp of the point by each bone, blended.
    points_b = jnp.broadcast_to(points[:, None, :], (n, self.num_bones, 3))
    back = rigid.transform_point_inverse(screws, points_b)        # N, B, 3
    blended = jnp.sum(weights[..., None] * back, axis=1)          # N, 3

    moving = self.moving_mask(params, points, metadata_embed, precision)
    warped = moving * blended + (1.0 - moving) * points
    return {'warped_points': warped, 'bone_weights': weights,
            'moving_mask': moving}
