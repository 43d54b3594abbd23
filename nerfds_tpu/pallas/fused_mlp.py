"""Fully-fused MLP forward kernel (Pallas TPU).

Motivation: profiling the NeRF-DS step on v5e shows a bandwidth-bound,
fusion-fragmented profile — no XLA op above ~0.7% of step time, with
several-hundred-MB ``[R·S, width]`` activations streamed between every
layer (~165 GB touched per training step, ≈100% of HBM bandwidth). The
classic fix (tiny-cuda-nn-style fully-fused MLP) keeps the whole layer
stack's activations in on-chip memory: this kernel loads a row tile of
inputs into VMEM, holds *all* layer weights resident in VMEM (~2 MB for the
8×256 trunk), runs every layer back-to-back on the MXU, and writes only the
final output. HBM traffic drops from (depth+1) activations per point to
input + output.

Scope: forward/inference only (the chunked renderer and benchmark paths).
Training still uses the XLA path — the σ-gradient requires jvp/transpose
rules that a pallas_call does not provide. Equivalence with
``models.mlp.MLP.apply`` is A/B-tested (interpret mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


def _apply_act(x, name: Optional[str]):
  if name is None or name in ('none', 'identity'):
    return x
  if name == 'relu':
    return jnp.maximum(x, 0.0)
  if name == 'sigmoid':
    return jax.nn.sigmoid(x)
  if name == 'softplus':
    return jax.nn.softplus(x)
  if name == 'tanh':
    return jnp.tanh(x)
  raise NotImplementedError(name)


def fused_mlp_forward(x: jnp.ndarray,
                      layers: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                      skips: Tuple[int, ...] = (),
                      hidden_activation: str = 'relu',
                      output_activation: Optional[str] = None,
                      has_output_layer: bool = False,
                      tile: int = 512,
                      compute_dtype=None,
                      interpret: bool = False) -> jnp.ndarray:
  """Runs the whole Dense stack in one kernel invocation.

  x: [N, C_in]; layers: [(W, b), ...] — hidden layers then (optionally, when
  ``has_output_layer``) the final logit layer. ``skips`` re-concatenates the
  original input at those hidden-layer indices, matching
  ``models.mlp.MLP.apply``. N is padded to the row tile internally.
  """
  n, c_in = x.shape
  num_layers = len(layers)
  num_hidden = num_layers - (1 if has_output_layer else 0)
  out_dim = layers[-1][0].shape[-1]
  n_pad = _round_up(max(n, 8), tile)
  if n_pad != n:
    x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

  cdt = compute_dtype or x.dtype

  def kernel(x_ref, *refs):
    out_ref = refs[-1]
    wb = refs[:-1]
    x_tile = x_ref[:].astype(cdt)
    h = x_tile
    for i in range(num_hidden):
      w = wb[2 * i][:].astype(cdt)
      b = wb[2 * i + 1][:].astype(cdt)
      if i in skips:
        h = jnp.concatenate([h, x_tile], axis=-1)
      h = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(cdt) + b
      h = _apply_act(h, hidden_activation)
    if has_output_layer:
      w = wb[2 * num_hidden][:].astype(cdt)
      b = wb[2 * num_hidden + 1][:].astype(cdt)
      h = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(cdt) + b
      h = _apply_act(h, output_activation)
    out_ref[:] = h.astype(out_ref.dtype)

  weight_specs = []
  operands = [x]
  for w, b in layers:
    weight_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.ANY
                                     if False else pltpu.VMEM))
    weight_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    operands.extend([w, b.reshape(1, -1)])

  grid = (n_pad // tile,)
  out = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((tile, c_in), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          *weight_specs,
      ],
      out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n_pad, out_dim), jnp.float32),
      interpret=interpret,
  )(*operands)
  return out[:n]


def mlp_params_to_layers(mlp, params) -> Tuple[list, bool]:
  """Extracts [(W, b), ...] from an ``models.mlp.MLP`` param dict."""
  layers = []
  for i in range(mlp.depth):
    p = params[f'hidden_{i}']
    layers.append((p['kernel'], p['bias']))
  has_output = mlp.output_channels > 0
  if has_output:
    layers.append((params['logit']['kernel'], params['logit']['bias']))
  return layers, has_output


def fused_apply(mlp, params, x, compute_dtype=None, tile: int = 512,
                interpret: bool = False) -> jnp.ndarray:
  """Drop-in fused equivalent of ``mlp.apply(params, x)`` (forward only)."""
  layers, has_output = mlp_params_to_layers(mlp, params)
  return fused_mlp_forward(
      x, layers, skips=tuple(mlp.skips),
      hidden_activation=mlp.hidden_activation,
      output_activation=mlp.output_activation,
      has_output_layer=has_output, tile=tile,
      compute_dtype=compute_dtype, interpret=interpret)
