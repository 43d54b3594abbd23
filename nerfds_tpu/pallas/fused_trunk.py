"""Fully-fused NeRF trunk kernel: σ, heads and ∂σ/∂feat in one pass (Pallas).

The hot loop of NeRF-DS training is the per-point σ-gradient: the reference
evaluates ``vmap(vmap(value_and_grad))`` of warp+hyper+trunk per sample point
(``/root/reference/hypernerf/models.py:1065-1073``) and the training loss then
differentiates *through* that gradient (second-order AD, because the predicted
normal is supervised against ∇σ and ∇σ feeds the radiance branch). Under XLA
this lowers to dozens of bandwidth-bound ``[R·S, 256]`` activation round-trips
to HBM per step (measured ≈100% of v5e HBM bandwidth, see BENCHMARKS.md).

This kernel restructures the trunk portion (8×256 MLP + σ/normal head +
bottleneck — ~80% of the FLOPs) the TPU way:

* **forward kernel**: one VMEM-resident pass computes trunk_out, bottleneck,
  (σ, predicted normal) *and* g = ∂σ/∂feat via an in-register reverse sweep
  over the relu masks. HBM traffic = inputs + final outputs only.
* **backward kernel** (hand-derived, registered as the custom VJP): given
  cotangents (σ̄, n̄, T̄, B̄, Ḡ) it recomputes the forward in VMEM and runs
  three additional masked sweeps. Because relu'' = 0 a.e., g is *bilinear*
  in (weights, mask pattern): with Ḡ·g = w_σᵀ τ_L where τ is the forward
  tangent sweep seeded with Ḡ at every input injection point, the exact
  second-order contributions are ∂(Ḡ·g)/∂W_i = τ̃_iᵀ c_i (c the w_σ-seeded
  reverse sweep) and ∂(Ḡ·g)/∂feat = 0. This reproduces JAX's autodiff of the
  unfused graph exactly (same a.e. treatment of the relu kink), which the
  A/B tests assert to float tolerance.

Because the σ-gradient is computed *inside* the forward primitive, the outer
training backward only ever needs this primitive's (first-order) VJP — the
model's second-order structure is preserved without nested custom rules.

**Matmul layout rule (load-bearing on this Mosaic toolchain).** A bf16
``dot_general`` is only fast when the contraction dim is the *minor* (lane)
dim of BOTH operands; any other orientation lowers through a pathological
relayout (measured 2.9 ms → 2000 ms for the same 8×[512,256]×[256,256]
chain). Therefore every matmul here is the ``(((1,), (1,)), ...)`` form:

* forward-direction ``h @ W`` takes the transposed weight ``Wᵀ [out, in]``;
* reverse-direction ``c @ Wᵀ`` takes the original ``W [in, out]``;
* weight grads ``zᵀ c`` (contraction over rows) first explicitly transpose
  the activation tile (cheap) and then contract ``(((1,), (0,)), ...)`` —
  the one non-minor form Mosaic handles well.

Both weight orientations are materialised outside the kernel (≤2 MB VMEM).

Matmul numerics match the XLA path's default TPU precision: bf16 operands,
f32 accumulation (``preferred_element_type``). Weight layouts are the
``models.mlp`` param dicts, unchanged.

Composition (see ``models/nerfds.py`` ``sigma_gradient_mode='fused'``):
∇_p σ = feat-pullbackᵀ g, where the feat pullback (posenc ∘ warp ∘ hyper —
the *small* MLPs) stays ordinary differentiable XLA.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


def _mm(a, b_t, cdt):
  """a @ B with B passed as Bᵀ — the fast minor-minor (1,1) contraction."""
  return jax.lax.dot_general(
      a.astype(cdt), b_t.astype(cdt), (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)


def _wgrad(zin, c, cdt):
  """zinᵀ @ c (contraction over rows) via explicit LHS transpose."""
  zt = jnp.swapaxes(zin.astype(cdt), 0, 1)
  return jax.lax.dot_general(
      zt, c.astype(cdt), (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)


@dataclasses.dataclass(frozen=True)
class TrunkSpec:
  """Static architecture mirror of NerfMLP's trunk+heads (relu only)."""
  depth: int
  width: int
  skips: Tuple[int, ...]
  in_dim: int
  alpha_channels: int
  norm_dim: int
  has_bottleneck: bool

  def __post_init__(self):
    object.__setattr__(self, 'skips', tuple(sorted(self.skips)))

  def layer_in_dim(self, i: int) -> int:
    d = self.in_dim if i == 0 else self.width
    if i in self.skips:
      d += self.in_dim
    return d

  def is_skip(self, i: int) -> bool:
    return i != 0 and i in self.skips

  def n_kernel_ops(self) -> int:
    """Operand count of the dual-orientation weight list (`_build_ops`)."""
    n = 0
    for i in range(self.depth):
      n += 5 if self.is_skip(i) else 3
    n += 3  # alpha head
    if self.has_bottleneck:
      n += 3
    return n


def _flatten_params(spec: TrunkSpec, nerf_params):
  """[(W, b), ...] trunk layers + bottleneck + alpha head, flat operand list."""
  ops = []
  for i in range(spec.depth):
    p = nerf_params['trunk'][f'hidden_{i}']
    ops.extend([p['kernel'], p['bias'].reshape(1, -1)])
  if spec.has_bottleneck:
    ops.extend([nerf_params['bottleneck']['kernel'],
                nerf_params['bottleneck']['bias'].reshape(1, -1)])
  p = nerf_params['alpha']['logit']
  ops.extend([p['kernel'], p['bias'].reshape(1, -1)])
  return ops


def _build_ops(spec: TrunkSpec, flat_ops, cdt):
  """Dual-orientation kernel operands from the `_flatten_params` list.

  Per trunk layer: (Wᵀ, W, b) or for skip layers (Whᵀ, Wxᵀ, Wh, Wx, b)
  with the row split done here so the kernel never slices; then
  (Wᵀ, W, b) for the bottleneck (if any) and the alpha head. Weight
  matrices are cast to the compute dtype once here (in-kernel casts each
  allocate a scoped-VMEM copy); biases stay f32 (they add into the f32
  accumulators)."""
  ops = []

  def add(w):
    ops.extend([jnp.swapaxes(w, 0, 1).astype(cdt), w.astype(cdt)])

  for i in range(spec.depth):
    w, b = flat_ops[2 * i], flat_ops[2 * i + 1]
    if spec.is_skip(i):
      wh, wx = w[:spec.width], w[spec.width:]
      ops.extend([jnp.swapaxes(wh, 0, 1).astype(cdt),
                  jnp.swapaxes(wx, 0, 1).astype(cdt),
                  wh.astype(cdt), wx.astype(cdt)])
    else:
      add(w)
    ops.append(b)
  rest = flat_ops[2 * spec.depth:]
  if spec.has_bottleneck:
    add(rest[0])
    ops.append(rest[1])
    rest = rest[2:]
  add(rest[0])
  ops.append(rest[1])
  return ops


class _Weights:
  """Kernel-side view over the `_build_ops` operand refs."""

  def __init__(self, spec: TrunkSpec, refs):
    self.spec = spec
    self.trunk = []
    i = 0
    for layer in range(spec.depth):
      if spec.is_skip(layer):
        self.trunk.append(tuple(r[...] for r in refs[i:i + 5]))
        i += 5
      else:
        self.trunk.append(tuple(r[...] for r in refs[i:i + 3]))
        i += 3
    if spec.has_bottleneck:
      self.bn_t, self.bn, self.bn_b = (r[...] for r in refs[i:i + 3])
      i += 3
    self.alpha_t, self.alpha, self.alpha_b = (r[...] for r in refs[i:i + 3])
    self.n_refs = i + 3

  def fwd_layer(self, i: int, h, x, cdt):
    """Pre-activation of trunk layer i (h = prev post-relu, x = input)."""
    ws = self.trunk[i]
    if self.spec.is_skip(i):
      wh_t, wx_t, _, _, b = ws
      return _mm(h, wh_t, cdt) + _mm(x, wx_t, cdt) + b
    w_t, _, b = ws
    return _mm(x if i == 0 else h, w_t, cdt) + b

  def rev_layer(self, i: int, c, cdt):
    """(cotangent to prev h or None, cotangent to x) of trunk layer i."""
    ws = self.trunk[i]
    if self.spec.is_skip(i):
      _, _, wh, wx, _ = ws
      return _mm(c, wh, cdt), _mm(c, wx, cdt)
    _, w, _ = ws
    d = _mm(c, w, cdt)
    return (None, d) if i == 0 else (d, None)


def trunk_sigma_grad_reference(feat, nerf_params, spec: TrunkSpec):
  """Unfused jnp reference of the primitive (for tests and CPU fallback)."""
  weights = []
  for i in range(spec.depth):
    p = nerf_params['trunk'][f'hidden_{i}']
    weights.append((p['kernel'], p['bias'].reshape(1, -1)))

  def trunk_only(f):
    h = None
    for i in range(spec.depth):
      w, b = weights[i]
      if i == 0:
        zt = f
      elif i in spec.skips:
        zt = jnp.concatenate([h, f], axis=-1)
      else:
        zt = h
      h = jnp.maximum(zt @ w + b, 0.0)
    return h

  trunk_out = trunk_only(feat)
  p = nerf_params['alpha']['logit']
  head = trunk_out @ p['kernel'] + p['bias']
  sigma = head[:, :spec.alpha_channels]
  norm = (head[:, spec.alpha_channels:spec.alpha_channels + spec.norm_dim]
          if spec.norm_dim > 0 else None)
  if spec.has_bottleneck:
    pb = nerf_params['bottleneck']
    bneck = trunk_out @ pb['kernel'] + pb['bias']
  else:
    bneck = trunk_out
  w_sigma = p['kernel'][:, 0]

  def sigma_scalar(f_row):
    h = trunk_only(f_row[None])
    return (h @ w_sigma)[0] + p['bias'][0]

  g = jax.vmap(jax.grad(sigma_scalar))(feat)
  return sigma, norm, trunk_out, bneck, g


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(spec: TrunkSpec, cdt, x_ref, *refs):
  """Forward + in-VMEM σ-gradient sweep.

  Per-layer relu masks live in a single scratch buffer (Python-level value
  lists keep every layer's activation live and OOM the 16 MB VMEM stack)."""
  n_w = spec.n_kernel_ops()
  wts = _Weights(spec, refs[:n_w])
  sigma_ref, norm_ref, trunk_ref, bneck_ref, g_ref = refs[n_w:n_w + 5]
  mask_store = refs[n_w + 5]       # scratch [depth, tile, width]

  x = x_ref[...].astype(cdt)
  h = None
  h_f32 = None
  for i in range(spec.depth):
    a = wts.fwd_layer(i, h, x, cdt)
    mask_store[i] = (a > 0.0).astype(mask_store.dtype)
    h_f32 = jnp.maximum(a, 0.0)
    h = h_f32.astype(cdt)
  trunk_ref[...] = h_f32
  head = _mm(h, wts.alpha_t, cdt) + wts.alpha_b
  sigma_ref[...] = head[:, :sigma_ref.shape[-1]]
  if spec.norm_dim > 0:
    norm_ref[...] = head[
        :, spec.alpha_channels:spec.alpha_channels + spec.norm_dim]
  else:
    norm_ref[...] = jnp.zeros_like(norm_ref)
  if spec.has_bottleneck:
    bneck_ref[...] = _mm(h, wts.bn_t, cdt) + wts.bn_b
  else:
    bneck_ref[...] = h_f32

  # Reverse masked sweep: g = ∂σ/∂x.
  n = x.shape[0]
  r = jnp.broadcast_to(wts.alpha_t[0:1].astype(jnp.float32), (n, spec.width))
  g = None
  for i in range(spec.depth - 1, -1, -1):
    c = r * mask_store[i].astype(jnp.float32)
    r, gx = wts.rev_layer(i, c, cdt)
    if gx is not None:
      g = gx if g is None else g + gx
  g_ref[...] = g


def _bwd_kernel(spec: TrunkSpec, cdt, x_ref, *refs):
  """Hand-derived VJP: forward recompute + tangent sweep + two interleaved
  reverse sweeps with fused weight-grad accumulation (see module docstring
  for the math). Scratch: post-relu activations and tangent-sweep outputs,
  one [depth, tile, width] buffer each; the g-path reverse state (c_g) is
  consumed in lockstep with the first-order sweep so it needs no storage."""
  n_w = spec.n_kernel_ops()
  wts = _Weights(spec, refs[:n_w])
  (sbar_ref, nbar_ref, tbar_ref, bbar_ref, gbar_ref) = refs[n_w:n_w + 5]
  n_flat = 2 * (spec.depth + (1 if spec.has_bottleneck else 0) + 1)
  out_refs = refs[n_w + 5:n_w + 5 + 1 + n_flat]
  xbar_ref = out_refs[0]
  wgrad_refs = out_refs[1:]
  h_store = refs[n_w + 5 + 1 + n_flat]
  tau_store = refs[n_w + 5 + 1 + n_flat + 1]

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for ref in wgrad_refs:
      ref[...] = jnp.zeros_like(ref)

  x = x_ref[...].astype(cdt)
  n = x.shape[0]

  # Forward recompute, storing post-relu activations (mask_i ≡ h_i > 0).
  h = None
  h_L = None
  for i in range(spec.depth):
    a = wts.fwd_layer(i, h, x, cdt)
    h_L = jnp.maximum(a, 0.0)
    h = h_L.astype(cdt)
    h_store[i] = h

  def mask(i):
    # f32 compare: the VPU has no bf16 comparison.
    return (h_store[i].astype(jnp.float32) > 0.0).astype(jnp.float32)

  # Tangent sweep seeded with Ḡ at every x-injection site (forward
  # direction → transposed weights).
  gbar = gbar_ref[...].astype(cdt)
  t = None
  for i in range(spec.depth):
    ws = wts.trunk[i]
    if spec.is_skip(i):
      wh_t, wx_t = ws[0], ws[1]
      t = (_mm(t, wh_t, cdt) + _mm(gbar, wx_t, cdt)) * mask(i)
    elif i == 0:
      t = _mm(gbar, ws[0], cdt) * mask(i)
    else:
      t = _mm(t, ws[0], cdt) * mask(i)
    tau_store[i] = t.astype(tau_store.dtype)
  tau_L = t

  # Head cotangents and head weight grads.
  sbar = sbar_ref[...]
  head_bar_parts = [sbar]
  if spec.norm_dim > 0:
    head_bar_parts.append(nbar_ref[...])
  head_bar = (jnp.concatenate(head_bar_parts, axis=-1)
              if len(head_bar_parts) > 1 else sbar)
  r1 = tbar_ref[...] + _mm(head_bar, wts.alpha, cdt)
  idx = 2 * spec.depth
  if spec.has_bottleneck:
    bbar = bbar_ref[...]
    r1 = r1 + _mm(bbar, wts.bn, cdt)
    wgrad_refs[idx][...] += _wgrad(h_L, bbar, cdt)
    wgrad_refs[idx + 1][...] += jnp.sum(bbar, axis=0, keepdims=True)
    idx += 2
  # alpha head: h_Lᵀ [σ̄, n̄] everywhere + τ_L into the σ column (g-path).
  wa_grad = _wgrad(h_L, head_bar, cdt)
  n_alpha_cols = wts.alpha.shape[1]
  pad_cols = n_alpha_cols - head_bar.shape[1]
  if pad_cols > 0:
    wa_grad = jnp.pad(wa_grad, ((0, 0), (0, pad_cols)))
  tau_sum = jnp.sum(tau_L, axis=0, keepdims=True)  # [1, width]
  sigma_col = jnp.pad(tau_sum.T, ((0, 0), (0, n_alpha_cols - 1)))
  wgrad_refs[idx][...] += wa_grad + sigma_col
  wgrad_refs[idx + 1][...] += jnp.pad(
      jnp.sum(head_bar, axis=0, keepdims=True), ((0, 0), (0, pad_cols)))

  # Interleaved reverse sweeps: first-order (r) and g-path (r_g, w_σ-seeded).
  r = r1
  r_g = jnp.broadcast_to(wts.alpha_t[0:1].astype(jnp.float32),
                         (n, spec.width))
  xbar = None
  for i in range(spec.depth - 1, -1, -1):
    m = mask(i)
    c1 = r * m
    cg = r_g * m
    zin = x if i == 0 else h_store[i - 1]
    tin = gbar if i == 0 else tau_store[i - 1]
    wg = _wgrad(zin, c1, cdt) + _wgrad(tin, cg, cdt)
    if spec.is_skip(i):
      wg_x = _wgrad(x, c1, cdt) + _wgrad(gbar, cg, cdt)
      wg = jnp.concatenate([wg, wg_x], axis=0)
    wgrad_refs[2 * i][...] += wg
    wgrad_refs[2 * i + 1][...] += jnp.sum(c1, axis=0, keepdims=True)
    r_prev, gx = wts.rev_layer(i, c1, cdt)
    if gx is not None:
      xbar = gx if xbar is None else xbar + gx
    if i > 0:
      r = r_prev if r_prev is not None else r
      rg_prev, _ = wts.rev_layer(i, cg, cdt)
      r_g = rg_prev if rg_prev is not None else r_g
  xbar_ref[...] = xbar


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------


def _pallas_forward(feat, flat_ops, spec: TrunkSpec, tile: int,
                    interpret: bool, cdt=jnp.bfloat16):
  ops = _build_ops(spec, flat_ops, cdt)
  n, d = feat.shape
  n_pad = _round_up(max(n, 8), tile)
  if n_pad != n:
    feat = jnp.pad(feat, ((0, n_pad - n), (0, 0)))
  grid = (n_pad // tile,)
  w_specs = [pl.BlockSpec(op.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for op in ops]
  out_shapes = (
      jax.ShapeDtypeStruct((n_pad, spec.alpha_channels), jnp.float32),
      jax.ShapeDtypeStruct((n_pad, max(spec.norm_dim, 1)), jnp.float32),
      jax.ShapeDtypeStruct((n_pad, spec.width), jnp.float32),
      jax.ShapeDtypeStruct((n_pad, spec.width), jnp.float32),
      jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
  )
  row = lambda c: pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
  out_specs = (row(spec.alpha_channels), row(max(spec.norm_dim, 1)),
               row(spec.width), row(spec.width), row(d))
  kernel = functools.partial(_fwd_kernel, spec, cdt)
  sigma, norm, trunk_out, bneck, g = pl.pallas_call(
      kernel, grid=grid,
      in_specs=[row(d), *w_specs],
      out_specs=out_specs,
      out_shape=out_shapes,
      scratch_shapes=[pltpu.VMEM((spec.depth, tile, spec.width), cdt)],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(feat, *ops)
  return (sigma[:n], norm[:n] if spec.norm_dim > 0 else None,
          trunk_out[:n], bneck[:n], g[:n])


def _pallas_backward(feat, flat_ops, cots, spec: TrunkSpec, tile: int,
                     interpret: bool, cdt=jnp.bfloat16):
  wgrad_shapes = [jax.ShapeDtypeStruct(op.shape, jnp.float32)
                  for op in flat_ops]
  ops = _build_ops(spec, flat_ops, cdt)
  n, d = feat.shape
  sbar, nbar, tbar, bbar, gbar = cots
  n_pad = _round_up(max(n, 8), tile)
  pad = lambda a: jnp.pad(a, ((0, n_pad - n), (0, 0))) if n_pad != n else a
  feat = pad(feat)
  sbar, nbar, tbar, bbar, gbar = map(pad, (sbar, nbar, tbar, bbar, gbar))
  grid = (n_pad // tile,)
  w_specs = [pl.BlockSpec(op.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for op in ops]
  row = lambda c: pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
  wgrad_specs = [pl.BlockSpec(s.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for s in wgrad_shapes]
  out_shapes = (jax.ShapeDtypeStruct((n_pad, d), jnp.float32), *wgrad_shapes)
  out_specs = (row(d), *wgrad_specs)
  kernel = functools.partial(_bwd_kernel, spec, cdt)
  outs = pl.pallas_call(
      kernel, grid=grid,
      in_specs=[row(d), *w_specs,
                row(spec.alpha_channels), row(max(spec.norm_dim, 1)),
                row(spec.width), row(spec.width), row(d)],
      out_specs=out_specs,
      out_shape=out_shapes,
      scratch_shapes=[pltpu.VMEM((spec.depth, tile, spec.width), cdt),
                      pltpu.VMEM((spec.depth, tile, spec.width), cdt)],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(feat, *ops, sbar, nbar, tbar, bbar, gbar)
  xbar = outs[0][:n]
  wgrads = outs[1:]
  return xbar, list(wgrads)


def make_trunk_sigma_grad(spec: TrunkSpec, tile: int = 512,
                          bwd_tile: int = 256,
                          interpret: bool = False,
                          compute_dtype=jnp.bfloat16):
  """Returns f(feat, flat_ops) -> (σ, norm, trunk_out, bottleneck, g) with a
  hand-derived VJP. ``flat_ops`` = `_flatten_params` list (kernels/biases).

  compute_dtype: matmul operand dtype (accumulation is always f32). bf16
  matches XLA's default TPU matmul precision; tests use f32."""

  @jax.custom_vjp
  def f(feat, *flat_ops):
    return _pallas_forward(feat, flat_ops, spec, tile, interpret,
                           compute_dtype)

  def f_fwd(feat, *flat_ops):
    out = _pallas_forward(feat, flat_ops, spec, tile, interpret,
                          compute_dtype)
    return out, (feat, flat_ops)

  def f_bwd(res, cots):
    feat, flat_ops = res
    sbar, nbar, tbar, bbar, gbar = cots
    zeros = lambda c: jnp.zeros((feat.shape[0], c), jnp.float32)
    sbar = zeros(spec.alpha_channels) if sbar is None else sbar
    nbar = (zeros(max(spec.norm_dim, 1))
            if (nbar is None or spec.norm_dim == 0) else nbar)
    tbar = zeros(spec.width) if tbar is None else tbar
    bbar = zeros(spec.width) if bbar is None else bbar
    gbar = zeros(feat.shape[1]) if gbar is None else gbar
    if not spec.has_bottleneck:
      # bottleneck output aliases trunk_out: fold its cotangent in.
      tbar = tbar + bbar
      bbar = jnp.zeros_like(bbar)
    xbar, wgrads = _pallas_backward(
        feat, flat_ops, (sbar, nbar, tbar, bbar, gbar), spec, bwd_tile,
        interpret, compute_dtype)
    # biases were reshaped (1, -1); grads already in that shape.
    return (xbar, *wgrads)

  f.defvjp(f_fwd, f_bwd)
  return f


def trunk_params_flat(spec: TrunkSpec, nerf_params):
  return _flatten_params(spec, nerf_params)


@functools.lru_cache(maxsize=32)
def cached_trunk_sigma_grad(spec: TrunkSpec, tile: int = 512,
                            bwd_tile: int = 256, interpret: bool = False,
                            compute_dtype=jnp.bfloat16):
  """lru-cached builder so repeated traces reuse one custom_vjp fn."""
  return make_trunk_sigma_grad(spec, tile=tile, bwd_tile=bwd_tile,
                               interpret=interpret,
                               compute_dtype=compute_dtype)
