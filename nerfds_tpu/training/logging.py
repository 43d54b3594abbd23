"""Metrics logging / observability (L4).

Parity target: reference TensorBoard logging (``train.py:57-142`` scalars +
histograms via flax.metrics.tensorboard, time meters ``utils.py:362-435``).
Here: a MetricWriter that mirrors every scalar to TensorBoard (when TF is
importable) and always to a line-delimited JSONL file — greppable without TB
and robust in hermetic environments. Histograms and images are supported on
the TB path.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def _flatten_scalars(tree: Any, prefix: str = '') -> Dict[str, float]:
  out = {}
  if isinstance(tree, dict):
    for k, v in tree.items():
      out.update(_flatten_scalars(v, f'{prefix}{k}/'))
    return out
  arr = np.asarray(tree)
  if arr.size == 1:
    out[prefix[:-1]] = float(arr)
  return out


class MetricWriter:
  """Scalar/histogram/image writer: TB (optional) + JSONL (always)."""

  def __init__(self, log_dir, use_tensorboard: bool = True):
    self._dir = Path(log_dir)
    self._dir.mkdir(parents=True, exist_ok=True)
    self._jsonl = open(self._dir / 'metrics.jsonl', 'a')
    self._tb = None
    if use_tensorboard:
      try:
        from flax.metrics import tensorboard
        self._tb = tensorboard.SummaryWriter(str(self._dir))
      except Exception:
        self._tb = None

  def write_scalars(self, step: int, scalars: Dict[str, Any]) -> None:
    flat = _flatten_scalars(scalars)
    record = {'step': int(step), 'time': time.time(), **flat}
    self._jsonl.write(json.dumps(record) + '\n')
    self._jsonl.flush()
    if self._tb is not None:
      for k, v in flat.items():
        self._tb.scalar(k, v, step)

  def write_histogram(self, step: int, tag: str, values) -> None:
    if self._tb is not None:
      self._tb.histogram(tag, np.asarray(values), step)

  def write_image(self, step: int, tag: str, image) -> None:
    if self._tb is not None:
      self._tb.image(tag, np.asarray(image), step)

  def write_text(self, step: int, tag: str, text: str) -> None:
    if self._tb is not None:
      self._tb.text(tag, text, step)

  def flush(self) -> None:
    if self._tb is not None:
      self._tb.flush()

  def close(self) -> None:
    self._jsonl.close()
    if self._tb is not None:
      self._tb.close()
