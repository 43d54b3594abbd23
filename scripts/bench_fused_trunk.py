#!/usr/bin/env python3
"""Isolated fused-trunk kernel benchmark (fwd+bwd) vs the XLA path.

Times the Pallas trunk+∇σ primitive (pallas/fused_trunk.py) on the
production trunk (8x256 skip@4, in_dim 52) at --n points, including the
outer backward through its custom VJP — the isolated version of the work
`sigma_gradient_mode='fused'` replaces per level. Run configs one at a
time; each is a separate process invocation so a kernel fault doesn't take
the sweep down.

Usage:
  python scripts/bench_fused_trunk.py --tile 512 --bwd_tile 256
  python scripts/bench_fused_trunk.py --xla        # XLA vmap baseline
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--n', type=int, default=262144)
  p.add_argument('--in_dim', type=int, default=52)
  p.add_argument('--tile', type=int, default=512)
  p.add_argument('--bwd_tile', type=int, default=256)
  p.add_argument('--xla', action='store_true')
  p.add_argument('--iters', type=int, default=6)
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  from nerfds_tpu.models.mlp import NerfMLP
  from nerfds_tpu.pallas import fused_trunk as ft

  spec = ft.TrunkSpec(depth=8, width=256, skips=(4,), in_dim=args.in_dim,
                      alpha_channels=1, norm_dim=3, has_bottleneck=True)
  mlp = NerfMLP(trunk_depth=8, trunk_width=256, skips=(4,),
                predict_norm=True)
  params = mlp.init(jax.random.PRNGKey(0), args.in_dim, 0, 24, True)
  flat = ft.trunk_params_flat(spec, params)
  feat = jnp.asarray(
      np.random.RandomState(0).randn(args.n, args.in_dim), jnp.float32)

  if args.xla:
    fn = lambda f, *ops: ft.trunk_sigma_grad_reference(f, params, spec)
    f = jax.jit(lambda feat: fn(feat))
    def loss(feat):
      s, norm, t, b, g = f(feat)
      return (jnp.sum(s) + jnp.sum(norm) + 0.1 * jnp.sum(t)
              + 0.1 * jnp.sum(b) + jnp.sum(g ** 2))
    step = jax.jit(jax.grad(loss))
  else:
    kernel = ft.cached_trunk_sigma_grad(spec, tile=args.tile,
                                        bwd_tile=args.bwd_tile)
    def loss(feat):
      s, norm, t, b, g = kernel(feat, *flat)
      return (jnp.sum(s) + jnp.sum(norm) + 0.1 * jnp.sum(t)
              + 0.1 * jnp.sum(b) + jnp.sum(g ** 2))
    step = jax.jit(jax.grad(loss))

  g = step(feat)
  s0 = float(jnp.sum(g))  # fence
  assert np.isfinite(s0), s0
  t0 = time.perf_counter()
  for _ in range(args.iters):
    g = step(feat + g * 0.0)
  _ = float(jnp.sum(g))
  dt = (time.perf_counter() - t0) / args.iters
  mode = 'xla' if args.xla else f'pallas t{args.tile}/{args.bwd_tile}'
  print(f'{mode}: {dt*1e3:.1f} ms fwd+bwd @ n={args.n}')


if __name__ == '__main__':
  main()
