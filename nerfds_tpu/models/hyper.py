"""Hyper-coordinate slicing surface and 3D mask field (L3).

Parity targets: reference ``hypernerf/modules.py`` HyperSheetMLP (:351-392)
and MaskMLP (:394-434). Both are posenc(x) ⊕ embed -> small MLP; everything
runs on flattened ``[N, C]`` arrays.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nerfds_tpu.models import mlp as mlp_lib
from nerfds_tpu.ops import math as math_ops


@dataclasses.dataclass(frozen=True)
class HyperSheetMLP:
  """The HyperNeRF 'bendy sheet': maps (x, embed) to ambient coordinates."""
  output_channels: int = 2
  min_deg: int = 0
  max_deg: int = 1
  depth: int = 6
  width: int = 64
  skips: Tuple[int, ...] = (4,)
  use_residual: bool = False
  concat_input: bool = False

  @property
  def mlp(self) -> mlp_lib.MLP:
    return mlp_lib.MLP(
        depth=self.depth, width=self.width, skips=self.skips,
        hidden_activation='relu', output_channels=self.output_channels,
        output_init=jax.nn.initializers.normal(1e-5),
        concat_input=self.concat_input)

  def init(self, key, embed_dim: int):
    in_dim = math_ops.posenc_dim(3, self.min_deg, self.max_deg) + embed_dim
    return {'mlp': self.mlp.init(key, in_dim)}

  def apply(self, params, points, embed, alpha=None, precision=None,
            dtype=None, storage_dtype=None):
    points_feat = math_ops.posenc(points, self.min_deg, self.max_deg,
                                  use_identity=False, alpha=alpha)
    inputs = [points_feat, embed]  # virtual concat (split-weight)
    out = self.mlp.apply(params['mlp'], inputs, precision=precision,
                         dtype=dtype, storage_dtype=storage_dtype)
    if self.use_residual:
      out = out + embed
    return out


@dataclasses.dataclass(frozen=True)
class MaskMLP:
  """3D foreground-mask field over observation-space points."""
  output_channels: int = 1
  min_deg: int = 0
  max_deg: int = 6
  depth: int = 8
  width: int = 128
  skips: Tuple[int, ...] = (4,)
  output_activation: Optional[str] = 'relu'
  concat_input: bool = False

  @property
  def mlp(self) -> mlp_lib.MLP:
    return mlp_lib.MLP(
        depth=self.depth, width=self.width, skips=self.skips,
        hidden_activation='relu', output_channels=self.output_channels,
        output_init=jax.nn.initializers.normal(1e-5),
        output_activation=self.output_activation,
        concat_input=self.concat_input)

  def init(self, key, embed_dim: int):
    in_dim = math_ops.posenc_dim(3, self.min_deg, self.max_deg) + embed_dim
    return {'mlp': self.mlp.init(key, in_dim)}

  def apply(self, params, points, embed, alpha=None, use_embed=True,
            precision=None, dtype=None, storage_dtype=None):
    points_feat = math_ops.posenc(points, self.min_deg, self.max_deg,
                                  use_identity=False, alpha=alpha)
    if use_embed:
      inputs = [points_feat, embed]  # virtual concat (split-weight)
    else:
      inputs = points_feat
    return self.mlp.apply(params['mlp'], inputs, precision=precision,
                          dtype=dtype, storage_dtype=storage_dtype)
