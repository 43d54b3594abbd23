#!/usr/bin/env python3
"""XLA TPU flag sweep on the training step (subprocess per flag set).

XLA_FLAGS must be set before backend init, so each candidate runs in its
own subprocess executing bench-style chained timing at --batch. Prints one
line per flag set; flags that fail to compile/run are reported, not fatal.

Usage: python scripts/bench_xla_flags.py [--batch 2048] [--quick]
"""
import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CANDIDATES = {
    'baseline': '',
    'scoped_vmem_128m': '--xla_tpu_scoped_vmem_limit_kib=131072',
    'scoped_vmem_64m': '--xla_tpu_scoped_vmem_limit_kib=65536',
    'no_min_dist_sched': '--xla_tpu_enable_latency_hiding_scheduler=false',
    'flash_opt': '--xla_tpu_enable_flash_attention=false',
    'async_fusion': '--xla_tpu_enable_async_collective_fusion=true',
    'licm': '--xla_tpu_enable_while_loop_double_buffering=true',
    'dot_reorder': '--xla_tpu_enable_dot_strength_reduction=false',
}

_WORKER = r'''
import sys, time, json
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
import bench
batch = {batch}
state, step_fn, b = bench.build(batch, naive=False)
sec = bench.time_steps(state, step_fn, b, warmup={warmup}, iters={iters},
                       chains={chains})
print('RESULT ' + json.dumps({{'ms': round(sec * 1e3, 1),
                               'rays_s': round(batch / sec)}}))
'''


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--batch', type=int, default=2048)
  p.add_argument('--quick', action='store_true')
  p.add_argument('--only', default='')
  args = p.parse_args()
  warmup, iters, chains = (2, 4, 3) if args.quick else (3, 6, 3)
  script = _WORKER.format(repo=str(REPO), batch=args.batch,
                          warmup=warmup, iters=iters, chains=chains)
  names = args.only.split(',') if args.only else list(CANDIDATES)
  for name in names:
    flags = CANDIDATES[name]
    env = dict(os.environ)
    if flags:
      env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') + ' ' + flags).strip()
    proc = subprocess.run([sys.executable, '-c', script],
                          capture_output=True, text=True, timeout=900,
                          env=env)
    line = [l for l in proc.stdout.splitlines() if l.startswith('RESULT')]
    if proc.returncode == 0 and line:
      print(f'{name}: {line[0][7:]} [{flags}]', flush=True)
    else:
      err = (proc.stderr or proc.stdout).strip().splitlines()
      print(f'{name}: FAILED {err[-1][:160] if err else ""} [{flags}]',
            flush=True)


if __name__ == '__main__':
  main()
