"""Functional MLP core (L3).

A deliberately minimal parameter system: params are plain nested dicts of
jnp arrays, modules are frozen dataclasses holding *static* architecture and
exposing ``init(key, in_dim) -> params`` and ``apply(params, x) -> y``.

Why not flax: the NeRF-DS forward takes a VJP of a sub-network *inside* the
model (the batched σ-gradient) and the training loss then differentiates
through that VJP (second-order AD). With plain pytrees + pure functions this
is ordinary JAX; no lifted-transform machinery is needed, optax/orbax consume
the pytrees directly, and parameter-subtree freezing is a path predicate.

Parity target: reference ``hypernerf/modules.py`` MLP (:44-83) and NerfMLP
(:86-313) — same skip semantics (re-concat the layer input at skip layers),
same glorot init, same output heads.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Initializer = Callable[..., jnp.ndarray]

glorot = jax.nn.initializers.glorot_uniform()
uniform_scale = jax.nn.initializers.uniform  # U[0, scale)
normal_init = jax.nn.initializers.normal


def get_activation(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
  if name is None or name == 'none' or name == 'identity':
    return lambda x: x
  return {
      'relu': jax.nn.relu,
      'elu': jax.nn.elu,
      'gelu': jax.nn.gelu,
      'silu': jax.nn.silu,
      'tanh': jnp.tanh,
      'sigmoid': jax.nn.sigmoid,
      'softplus': jax.nn.softplus,
      'sin': jnp.sin,
  }[name]


def apply_norm(x, norm_type: Optional[str], num_groups: int = 32):
  """Parameter-free feature normalisation between Dense and activation.

  Parity target: reference ``modules.py:30-41`` (``get_norm_layer``) — flax
  Layer/Group/BatchNorm with ``use_scale=False, use_bias=False``, i.e. pure
  normalisation with no learned affine, wired into the MLP at
  ``modules.py:70-71`` (after the Dense, before the activation) and selected
  by ``NerfModel.norm_type`` (``models.py:359``; off in all shipped configs).

  'batch' normalises over the batch axes using *batch statistics* (the
  training-mode behaviour); there are no running averages — the reference's
  flax BatchNorm would need a mutable ``batch_stats`` collection that its
  own train step never threads, so batch norm is unusable there too and the
  batch-stat form is the only well-defined semantics to match.
  """
  if norm_type is None or norm_type == 'none':
    return x
  if norm_type == 'layer':
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-6)
  if norm_type == 'group':
    c = x.shape[-1]
    groups = min(num_groups, c)
    if c % groups != 0:
      raise ValueError(f'channels {c} not divisible by {groups} groups')
    g = x.reshape(*x.shape[:-1], groups, c // groups)
    mean = jnp.mean(g, axis=-1, keepdims=True)
    var = jnp.var(g, axis=-1, keepdims=True)
    return ((g - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(x.shape)
  if norm_type == 'batch':
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)
  raise ValueError(f'Unknown norm type {norm_type!r}')


def dense_init(key, in_dim: int, out_dim: int,
               kernel_init: Initializer = glorot,
               use_bias: bool = True):
  kernel = kernel_init(key, (in_dim, out_dim), jnp.float32)
  params = {'kernel': kernel}
  if use_bias:
    params['bias'] = jnp.zeros((out_dim,), jnp.float32)
  return params


def quantize_storage(x, storage_dtype):
  """Round-trips ``x`` through a narrower storage dtype (bf16).

  The training step is HBM-bandwidth-bound (round-2 profile: DMA engines
  ~97% busy; the largest buffers are the [R·S, width] layer activations and
  their backward residuals). Writing activations through
  ``astype(bf16).astype(f32)`` makes the buffer that crosses XLA fusion
  boundaries bf16 — the converts fuse into producer/consumer — halving that
  traffic, while weights and matmul accumulation stay f32.

  Unlike bf16 *compute* (``compute_dtype='bfloat16'``, −7 dB novel-time
  PSNR) this only quantises the stored value; and unlike a custom-VJP
  "save-as-bf16" it is plain ops, so the gradient is the exact gradient of
  the (quantised) forward and second-order AD — which the σ-gradient
  supervision requires — works unchanged.
  """
  if storage_dtype is None or x.dtype == storage_dtype:
    return x
  # The optimization_barrier is load-bearing: XLA's algebraic simplifier
  # (xla_allow_excess_precision, on by default) folds a bare
  # convert(convert(x, bf16), f32) pair back to x, silently undoing the
  # quantisation (verified: under jit the round-trip is a no-op without the
  # barrier). The barrier pins the bf16 value as a real materialisation
  # point, so the buffer crossing the fusion boundary is bf16.
  narrow = jax.lax.optimization_barrier(x.astype(storage_dtype))
  return narrow.astype(x.dtype)


def dense_apply(params, x, precision=None, dtype=None):
  """Dense layer; ``x`` may be a list of feature blocks.

  A list is treated as the concatenation ``concat(x, -1)`` WITHOUT
  materialising it: the kernel is row-sliced per block and the partial
  matmuls are summed (`concat([a,b]) @ W == a @ W[:da] + b @ W[da:]`).
  Concat→Dense is the dominant pattern in this model (trunk skips, rgb
  conditions, embed⊕posenc inputs); on TPU the fused form avoids writing the
  wide concatenated activation to HBM and the layout copies XLA inserts
  around it — the step is HBM-bound, so this is a measured win. Weight
  layout/ckpt format is unchanged (slicing the [in,out] kernel is free).
  """
  kernel = params['kernel']
  if isinstance(x, (list, tuple)):
    if len(x) == 1:
      return dense_apply(params, x[0], precision=precision, dtype=dtype)
    if dtype is not None:
      x = [p.astype(dtype) for p in x]
      kernel = kernel.astype(dtype)
    y = None
    offset = 0
    for p in x:
      d = p.shape[-1]
      w = jax.lax.slice_in_dim(kernel, offset, offset + d, axis=0)
      contrib = jnp.matmul(p, w, precision=precision)
      y = contrib if y is None else y + contrib
      offset += d
    if offset != kernel.shape[0]:
      raise ValueError(
          f'feature blocks sum to {offset}, kernel rows {kernel.shape[0]}')
  else:
    if dtype is not None:
      x = x.astype(dtype)
      kernel = kernel.astype(dtype)
    y = jnp.matmul(x, kernel, precision=precision)
  if 'bias' in params:
    bias = params['bias'].astype(dtype) if dtype is not None else params['bias']
    y = y + bias
  return y


@dataclasses.dataclass(frozen=True)
class MLP:
  """Dense stack with input re-concat skips and an optional output head."""
  depth: int
  width: int
  skips: Tuple[int, ...] = ()
  hidden_activation: str = 'relu'
  # Parameter-free norm between Dense and activation (see `apply_norm`):
  # None | 'layer' | 'group' | 'batch'.
  hidden_norm: Optional[str] = None
  output_channels: int = 0
  output_activation: Optional[str] = None
  use_bias: bool = True
  hidden_init: Initializer = glorot
  output_init: Optional[Initializer] = None
  # Materialise concatenated inputs before the matmul instead of the
  # split-weight form (reproduces the reference's op graph for A/B
  # baselines; the split form is the TPU-fast default).
  concat_input: bool = False

  def layer_in_dim(self, i: int, in_dim: int) -> int:
    d = in_dim if i == 0 else self.width
    if i in self.skips:
      d += in_dim
    return d

  def init(self, key, in_dim: int):
    params = {}
    keys = jax.random.split(key, self.depth + 1)
    for i in range(self.depth):
      params[f'hidden_{i}'] = dense_init(
          keys[i], self.layer_in_dim(i, in_dim), self.width,
          kernel_init=self.hidden_init, use_bias=self.use_bias)
    if self.output_channels > 0:
      out_in = self.width if self.depth > 0 else in_dim
      params['logit'] = dense_init(
          keys[-1], out_in, self.output_channels,
          kernel_init=self.output_init or glorot, use_bias=self.use_bias)
    return params

  def apply(self, params, x, precision=None, dtype=None,
            storage_dtype=None):
    """``x``: input array or a list of feature blocks (their virtual concat
    is the input — see `dense_apply`; skip layers re-feed the blocks without
    materialising the concat either).

    dtype: compute dtype for the dense stack (e.g. bf16). Inputs are cast
    once at entry, activations stay in that dtype between layers (halving
    the HBM traffic of layer activations and backward residuals), and the
    output is cast back to f32.

    storage_dtype: narrow dtype for the *stored* activations only (see
    `quantize_storage`) — compute/weights stay in the compute dtype. A no-op
    when `dtype` is already that narrow."""
    act = get_activation(self.hidden_activation)
    input_parts = list(x) if isinstance(x, (list, tuple)) else [x]
    if self.concat_input and len(input_parts) > 1:
      input_parts = [jnp.concatenate(input_parts, axis=-1)]
    out_dtype = input_parts[0].dtype
    if dtype is not None:
      input_parts = [p.astype(dtype) for p in input_parts]
    elif storage_dtype is not None:
      input_parts = [quantize_storage(p, storage_dtype) for p in input_parts]
    h = None
    for i in range(self.depth):
      layer_in = input_parts if i == 0 else [h]
      if i in self.skips:
        layer_in = layer_in + input_parts  # reference order: [x, inputs]
        if self.concat_input and len(layer_in) > 1:
          layer_in = [jnp.concatenate(layer_in, axis=-1)]
      h = dense_apply(params[f'hidden_{i}'], layer_in,
                      precision=precision, dtype=dtype)
      h = act(apply_norm(h, self.hidden_norm))
      if dtype is None:
        h = quantize_storage(h, storage_dtype)
    x = h if self.depth > 0 else input_parts
    if self.output_channels > 0:
      x = dense_apply(params['logit'], x, precision=precision, dtype=dtype)
      if self.output_activation is not None:
        x = get_activation(self.output_activation)(x)
    if isinstance(x, (list, tuple)):  # depth=0, no head: identity module
      x = x[0] if len(x) == 1 else jnp.concatenate(x, axis=-1)
    if dtype is not None:
      x = x.astype(out_dtype)
    return x


@dataclasses.dataclass(frozen=True)
class NerfMLP:
  """Trunk + bottleneck + σ/normal head + rgb branch, staged query API.

  The staged API mirrors the reference's split queries
  (modules.py:243-313): the trunk/bottleneck runs once, σ (+ predicted
  normal) reads the trunk output, rgb reads [bottleneck ⊕ conditions].
  Everything operates on flattened ``[N, C]`` arrays.
  """
  trunk_depth: int = 8
  trunk_width: int = 256
  rgb_branch_depth: int = 1
  rgb_branch_width: int = 128
  rgb_channels: int = 3
  alpha_channels: int = 1
  activation: str = 'relu'
  skips: Tuple[int, ...] = (4,)
  predict_norm: bool = False
  norm_dim: int = 3
  concat_input: bool = False
  # Hidden-layer normalisation for trunk AND rgb branch (reference wires
  # the same `norm` into both, modules.py:127-137): None|'layer'|'group'|
  # 'batch'.
  hidden_norm: Optional[str] = None

  @property
  def trunk(self) -> MLP:
    return MLP(depth=self.trunk_depth, width=self.trunk_width,
               skips=self.skips, hidden_activation=self.activation,
               hidden_norm=self.hidden_norm,
               concat_input=self.concat_input)

  @property
  def alpha_head_channels(self) -> int:
    return self.alpha_channels + (self.norm_dim if self.predict_norm else 0)

  def init(self, key, in_dim: int, alpha_cond_dim: int, rgb_cond_dim: int,
           has_condition: bool):
    """alpha_cond_dim/rgb_cond_dim: channel counts of the conditions (0 if
    absent). rgb_cond_dim must include every rgb-side condition channel
    (viewdirs, extra conditions, normals)."""
    k_trunk, k_bottleneck, k_alpha, k_rgb = jax.random.split(key, 4)
    params = {'trunk': self.trunk.init(k_trunk, in_dim)}
    if has_condition:
      params['bottleneck'] = dense_init(
          k_bottleneck, self.trunk_width, self.trunk_width)
    alpha_in = (self.trunk_width + alpha_cond_dim if alpha_cond_dim > 0
                else self.trunk_width)
    alpha_mlp = MLP(depth=0, width=0,
                    output_channels=self.alpha_head_channels)
    params['alpha'] = alpha_mlp.init(k_alpha, alpha_in)
    # rgb input = (bottleneck | trunk_out) ⊕ every rgb-side condition;
    # extra conditions (e.g. hyper-c features) are consumed even without a
    # bottleneck (reference query_rgb, modules.py:291-313), so the extra
    # dims always count. bottleneck width == trunk width, so the formula
    # holds in both branches.
    rgb_in = self.trunk_width + rgb_cond_dim
    rgb_mlp = MLP(depth=self.rgb_branch_depth, width=self.rgb_branch_width,
                  hidden_activation=self.activation,
                  output_channels=self.rgb_channels)
    params['rgb'] = rgb_mlp.init(k_rgb, rgb_in)
    return params

  def query_bottleneck(self, params, x, precision=None, dtype=None,
                       storage_dtype=None):
    trunk_out = self.trunk.apply(params['trunk'], x, precision=precision,
                                 dtype=dtype, storage_dtype=storage_dtype)
    if 'bottleneck' in params:
      bottleneck = dense_apply(params['bottleneck'], trunk_out,
                               precision=precision, dtype=dtype)
      if dtype is not None:
        bottleneck = bottleneck.astype(trunk_out.dtype)
      elif storage_dtype is not None:
        bottleneck = quantize_storage(bottleneck, storage_dtype)
    else:
      bottleneck = trunk_out
    return trunk_out, bottleneck

  def query_sigma(self, params, trunk_out, bottleneck, alpha_condition=None,
                  precision=None, dtype=None):
    if alpha_condition is not None:
      alpha_in = [bottleneck, alpha_condition]
      if self.concat_input:
        # Reference op graph materialises the concat (modules.py:272-277).
        alpha_in = jnp.concatenate(alpha_in, axis=-1)
    else:
      alpha_in = trunk_out
    out = dense_apply(params['alpha']['logit'], alpha_in, precision=precision,
                      dtype=dtype)
    if dtype is not None:
      out = out.astype(jnp.float32)
    sigma = out[..., :self.alpha_channels]
    norm = (out[..., self.alpha_channels:self.alpha_channels + self.norm_dim]
            if self.predict_norm else None)
    return sigma, norm

  def query_rgb(self, params, trunk_out, bottleneck, rgb_condition=None,
                extra_rgb_condition=None, screw_condition=None, norm=None,
                precision=None, dtype=None, storage_dtype=None):
    """Concat order matches reference query_rgb (modules.py:288-313):
    [bottleneck, rgb_condition], extra, screw, norm."""
    def extend(acc, cond):
      if isinstance(cond, (list, tuple)):
        acc.extend(cond)
      else:
        acc.append(cond)
    if rgb_condition is not None:
      rgb_in = [bottleneck]
      extend(rgb_in, rgb_condition)
    else:
      rgb_in = [trunk_out]
    if extra_rgb_condition is not None:
      extend(rgb_in, extra_rgb_condition)
    if screw_condition is not None:
      rgb_in.append(screw_condition)
    if norm is not None:
      rgb_in.append(norm)
    rgb_mlp = MLP(depth=self.rgb_branch_depth, width=self.rgb_branch_width,
                  hidden_activation=self.activation,
                  hidden_norm=self.hidden_norm,
                  output_channels=self.rgb_channels,
                  concat_input=self.concat_input)
    return rgb_mlp.apply(params['rgb'], rgb_in, precision=precision,
                         dtype=dtype, storage_dtype=storage_dtype)
