"""Checkpoint save/restore (L4) via orbax.

Parity target: reference flax msgpack checkpoints (training.py:59-66,
train.py:327-328,447-448): rolling keep=2, restore-on-start resume, the full
TrainState (params + Adam moments + step). Orbax handles multi-host and
sharded arrays natively; saving is async-capable but kept synchronous here
for determinism.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
  """Rolling checkpoint manager over a TrainState pytree."""

  def __init__(self, directory, keep: int = 2):
    self._dir = Path(directory).absolute()
    self._dir.mkdir(parents=True, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=keep,
                                           create=True)
    self._mgr = ocp.CheckpointManager(self._dir, options=options)

  def save(self, step: int, state) -> None:
    self._mgr.save(step, args=ocp.args.StandardSave(_to_saveable(state)))
    self._mgr.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    return self._mgr.latest_step()

  def restore(self, state_template, step: Optional[int] = None):
    """Restores into the structure of ``state_template`` (same pytree)."""
    if step is None:
      step = self.latest_step()
    if step is None:
      return state_template, 0
    restored = self._mgr.restore(
        step, args=ocp.args.StandardRestore(_to_saveable(state_template)))
    return _from_saveable(state_template, restored), step

  def all_steps(self):
    return self._mgr.all_steps()

  def close(self):
    self._mgr.close()


def _to_saveable(state) -> Any:
  """TrainState dataclass -> plain dict pytree (orbax-friendly)."""
  return {'step': state.step, 'params': state.params,
          'opt_state': state.opt_state}


def _from_saveable(template, d):
  return type(template)(step=d['step'], params=d['params'],
                       opt_state=d['opt_state'])
