"""Capture a jax.profiler trace of the training step and print the top ops.

Writes the raw trace under --logdir and, when tensorboard_plugin_profile is
available, prints the top-k self-time HLO ops so kernel work can be
attributed without a TensorBoard UI.

Usage: python scripts/profile_step.py [--batch N] [--logdir DIR]
"""
import argparse
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--batch', type=int, default=2048)
  p.add_argument('--logdir', default='/tmp/nerfds_profile')
  p.add_argument('--steps', type=int, default=3)
  p.add_argument('--top', type=int, default=40)
  args = p.parse_args()

  from scripts.bench_ablate import build, time_steps  # noqa: E402

  state, step_fn, batch = build(args.batch, {})
  # Warm up / compile outside the trace.
  sec = time_steps(state, step_fn, batch, 2, 3)
  print(f'# step time {sec*1e3:.1f} ms', flush=True)

  key = jax.random.PRNGKey(1)
  jax.profiler.start_trace(args.logdir)
  for i in range(args.steps):
    state, stats = step_fn(state, batch, jax.random.fold_in(key, i))
  _ = float(jax.device_get(stats['coarse']['loss/total']))
  jax.profiler.stop_trace()

  planes = sorted(glob.glob(
      args.logdir + '/**/*.xplane.pb', recursive=True))
  if not planes:
    print('no xplane captured', file=sys.stderr)
    return
  plane = planes[-1]
  print(f'# xplane: {plane}')
  try:
    from tensorboard_plugin_profile.convert import raw_to_tool_data
  except ImportError:
    print('tensorboard_plugin_profile unavailable; raw trace only')
    return
  data, _ = raw_to_tool_data.xspace_to_tool_data(
      [plane], 'framework_op_stats^', {})
  if isinstance(data, bytes):
    data = gzip.decompress(data).decode()
  rows = json.loads(data)
  # framework_op_stats: list of tables; first has per-op rows.
  table = rows[0]['p'] if isinstance(rows, list) else rows
  print(json.dumps(table if isinstance(table, dict) else rows[0],
                   indent=None)[:4000])


if __name__ == '__main__':
  main()
