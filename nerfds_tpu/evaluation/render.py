"""Chunked full-image renderer (L5).

Parity target: reference ``hypernerf/evaluation.py`` render_image (:53-149).
TPU-first differences: one jitted render fn over a data-sharded Mesh instead
of pmap+all_gather; chunks are padded to a fixed static size so every chunk
reuses the same executable (the reference recompiles for the ragged last
chunk); metadata embeddings are pre-encoded once (encode_metadata).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfds_tpu.models.nerfds import NerfDSModel
from nerfds_tpu.parallel import mesh as mesh_lib


@functools.lru_cache(maxsize=16)
def make_render_fn(model: NerfDSModel, mesh=None, use_sample_at_infinity=None,
                   return_full: bool = True,
                   compute_sigma_gradient: bool = False):
  """Builds a jitted chunk renderer: (params, rays, key, extra) -> out.

  lru-cached on (model, mesh, flags): jax.jit caches executables by
  function identity, so returning a fresh closure per image would retrace
  AND recompile per rendered image (measured: minutes per eval pass on the
  production architecture). All arguments are hashable statics.

  ``compute_sigma_gradient=False`` (default) skips the per-point ∇σ during
  rendering — it only feeds the *training* normal-supervision target, while
  the rgb path uses the predicted normal — saving the extra backward pass
  per chunk. Pass True to also render target_norm maps; in that case any
  configured ``norm_grad_topk`` speed mode is ignored so ``target_norm``
  always comes back full-sample ``[R, S, 3]`` (the restricted ``[R, k, 3]``
  + index form is a training-step implementation detail)."""
  if compute_sigma_gradient and model.config.norm_grad_topk:
    import dataclasses
    model = dataclasses.replace(
        model, config=dataclasses.replace(model.config, norm_grad_topk=None))

  def render_chunk(params, rays, key, extra_params):
    return model.render(
        params, rays, key, extra_params,
        metadata_encoded=True, return_points=False, return_weights=False,
        use_sample_at_infinity=use_sample_at_infinity,
        return_full=return_full,
        compute_sigma_gradient=compute_sigma_gradient)

  if mesh is not None:
    in_shardings = (mesh_lib.replicated_sharding(mesh),
                    mesh_lib.batch_sharding(mesh),
                    mesh_lib.replicated_sharding(mesh),
                    mesh_lib.replicated_sharding(mesh))
    return jax.jit(render_chunk, in_shardings=in_shardings)
  return jax.jit(render_chunk)


# Keys whose per-ray outputs are worth assembling into images.
DEFAULT_KEYS = ('rgb', 'depth', 'med_depth', 'acc', 'ray_norm',
                'ray_delta_x', 'ray_hyper_points', 'ray_predicted_mask',
                'med_points', 'ray_rotation_field', 'ray_translation_field')


def render_image(model: NerfDSModel, params, rays_dict: Dict[str, Any],
                 key, extra_params, *, chunk: int = 8192, mesh=None,
                 render_fn=None, level: Optional[str] = None,
                 keys=DEFAULT_KEYS) -> Dict[str, np.ndarray]:
  """Renders every pixel of an image by fixed-size chunks.

  rays_dict arrays are image-shaped ``[H, W, C]`` (or ``[N, C]``); metadata
  may be raw ids (encoded here) and is assumed constant across the image —
  the per-chunk metadata is broadcast, as in reference render.py:198-240.
  """
  if render_fn is None:
    render_fn = make_render_fn(model, mesh=mesh)

  rays_dict = dict(rays_dict)
  metadata = rays_dict.pop('metadata', {})
  batch_shape = rays_dict['origins'].shape[:-1]
  num_rays = int(np.prod(batch_shape))
  flat = jax.tree_util.tree_map(
      lambda x: np.asarray(x).reshape((num_rays, -1)), rays_dict)
  encoded = model.encode_metadata(params, jax.tree_util.tree_map(
      lambda x: jnp.asarray(
          np.asarray(x).reshape(-1, np.asarray(x).shape[-1])[:1]),
      metadata))
  # Fixed-size chunks: pad the tail chunk by edge replication.
  if mesh is not None:
    chunk = mesh_lib.pad_to_multiple(chunk, mesh.devices.size)
  level = level or ('fine' if model.config.num_fine_samples > 0 else 'coarse')

  outs = []
  for start in range(0, num_rays, chunk):
    sl = {k: v[start:start + chunk] for k, v in flat.items()}
    n = sl['origins'].shape[0]
    pad = chunk - n
    if pad:
      sl = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)], 0)
            for k, v in sl.items()}
    chunk_rays = {
        'origins': jnp.asarray(sl['origins']),
        'directions': jnp.asarray(sl['directions']),
        'metadata': jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (chunk, x.shape[-1])), encoded),
    }
    if 'mask' in sl:
      chunk_rays['mask'] = jnp.asarray(sl['mask'])
    else:
      chunk_rays['mask'] = jnp.zeros((chunk, 1), jnp.float32)
    if mesh is not None:
      chunk_rays = mesh_lib.shard_batch(chunk_rays, mesh)
    out = render_fn(params, chunk_rays, key, extra_params)[level]
    out = {k: np.asarray(v)[:n] for k, v in out.items() if k in keys}
    outs.append(out)

  result = {}
  for k in outs[0]:
    stacked = np.concatenate([o[k] for o in outs], axis=0)
    result[k] = stacked.reshape((*batch_shape, *stacked.shape[1:]))
  return result
