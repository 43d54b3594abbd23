"""GLO latent-code embeddings (L3).

Parity target: reference ``hypernerf/modules.py`` GLOEmbed (:316-348) and the
3-channel (left, right, progression) interpolation lerp
(``models.py:271-294``). The embedding lookup is a gather; under jit this
fuses into the surrounding program.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GLOEmbed:
  num_embeddings: int
  num_dims: int = 8
  init_scale: float = 0.05  # U[0, scale), matching nn.initializers.uniform

  def init(self, key):
    table = jax.nn.initializers.uniform(scale=self.init_scale)(
        key, (self.num_embeddings, self.num_dims), jnp.float32)
    return {'embedding': table}

  def lookup(self, params, ids: jnp.ndarray) -> jnp.ndarray:
    """ids: integer [..., 1] or [...]."""
    if ids.ndim > 0 and ids.shape[-1] == 1:
      ids = jnp.squeeze(ids, axis=-1)
    # mode='clip': out-of-range ids (e.g. a val frame whose warp id exceeds
    # the train table) clamp to the nearest row instead of jnp.take's
    # default NaN fill.
    return jnp.take(params['embedding'], ids.astype(jnp.int32), axis=0,
                    mode='clip')

  def encode(self, params, metadata: jnp.ndarray) -> jnp.ndarray:
    """Encode metadata that is either an id ``[..., 1]`` or an interpolation
    triple ``[..., 3]`` of (left id, right id, progression)."""
    if metadata.shape[-1] == 3:
      left, right, progression = jnp.split(metadata, 3, axis=-1)
      left = self.lookup(params, left.astype(jnp.int32))
      right = self.lookup(params, right.astype(jnp.int32))
      return (1.0 - progression) * left + progression * right
    return self.lookup(params, metadata)
