"""Annealing schedules (L4) — trace-time-built, device-evaluated.

Parity target: reference ``hypernerf/schedules.py`` (7 schedule types, built
from dicts/tuples). TPU-first difference: the reference evaluates schedules on
the host every step and ships the scalars to the device; here every schedule
compiles to a closed-form jnp expression of the (traced) step, so the entire
training step — schedules included — is one XLA program with no host work
per iteration.

A schedule config is any of:
  * None                          -> constant 0.0 sentinel (NoneSchedule)
  * a number                      -> constant
  * ('linear', a, b, n) tuples    -> positional args of the named type
  * {'type': 'linear', ...} dicts -> keyword args of the named type
matching the reference's ``from_config`` conventions.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax.numpy as jnp

ScheduleFn = Callable[[jnp.ndarray], jnp.ndarray]


def constant(value) -> ScheduleFn:
  def get(step):
    return jnp.full_like(jnp.asarray(step, jnp.float32), value)
  return get


def linear(initial_value, final_value, num_steps) -> ScheduleFn:
  def get(step):
    step = jnp.asarray(step, jnp.float32)
    if num_steps == 0:
      return jnp.full_like(step, final_value)
    alpha = jnp.minimum(step / num_steps, 1.0)
    return (1.0 - alpha) * initial_value + alpha * final_value
  return get


def exponential(initial_value, final_value, num_steps, eps=1e-10) -> ScheduleFn:
  if initial_value <= final_value:
    raise ValueError('Final value must be less than initial value.')

  def get(step):
    step = jnp.asarray(step, jnp.float32)
    final = max(final_value, eps)
    base = final / initial_value
    exponent = step / (num_steps - 1)
    value = initial_value * base ** exponent
    # The reference clamps to final_value for step >= num_steps (host-side
    # branch, schedules.py:114-124); expressed here as a select.
    return jnp.where(step >= num_steps, jnp.full_like(step, final_value),
                     value)
  return get


def cosine_easing(initial_value, final_value, num_steps) -> ScheduleFn:
  def get(step):
    step = jnp.asarray(step, jnp.float32)
    alpha = jnp.minimum(step / num_steps, 1.0)
    scale = final_value - initial_value
    x = jnp.clip(alpha, 0.0, 1.0)
    return initial_value + scale * 0.5 * (1 + jnp.cos(jnp.pi * x + math.pi))
  return get


def step_schedule(initial_value, decay_interval, decay_factor, max_decays,
                  final_value=None) -> ScheduleFn:
  if final_value is None:
    final_value = initial_value * decay_factor ** max_decays

  def get(step):
    step = jnp.asarray(step, jnp.float32)
    phase = jnp.floor(step / decay_interval)
    value = initial_value * decay_factor ** phase
    return jnp.where(phase >= max_decays, jnp.full_like(step, final_value),
                     value)
  return get


def piecewise(schedules: Sequence) -> ScheduleFn:
  """A piecewise chain of (duration, sub-schedule-config) entries.

  Semantics match the reference (schedules.py:172-185): milestones are the
  cumulative durations; the active segment is evaluated at the *local* step
  (step minus its start milestone).
  """
  fns = [from_config(cfg) for _, cfg in schedules]
  durations = [ms for ms, _ in schedules]
  milestones = []
  acc = 0
  for d in durations[:-1]:
    acc += d
    milestones.append(acc)
  starts = [0] + list(milestones)

  def get(step):
    step = jnp.asarray(step, jnp.float32)
    ms = jnp.asarray(milestones, jnp.float32)
    idx = jnp.searchsorted(ms, step, side='right')
    values = jnp.stack(
        [fn(step - start) for fn, start in zip(fns, starts)], axis=0)
    return jnp.take(values, idx, axis=0)
  return get


def delayed(base_schedule, delay_steps, delay_mult) -> ScheduleFn:
  base = from_config(base_schedule)

  def get(step):
    step = jnp.asarray(step, jnp.float32)
    delay_rate = (delay_mult + (1 - delay_mult) * jnp.sin(
        0.5 * jnp.pi * jnp.clip(step / delay_steps, 0, 1)))
    return delay_rate * base(step)
  return get


_SCHEDULE_MAP = {
    'constant': constant,
    'linear': linear,
    'exponential': exponential,
    'cosine_easing': cosine_easing,
    'step': step_schedule,
    'piecewise': piecewise,
    'delayed': delayed,
}


def from_config(config: Any) -> ScheduleFn:
  """Builds a jittable schedule fn from a reference-style config."""
  if config is None:
    return constant(0.0)
  if callable(config):
    return config
  if isinstance(config, (int, float)):
    return constant(float(config))
  if isinstance(config, (tuple, list)):
    schedule_type, *args = config
    return _SCHEDULE_MAP[schedule_type](*args)
  if isinstance(config, dict):
    d = dict(config)
    schedule_type = d.pop('type')
    return _SCHEDULE_MAP[schedule_type](**d)
  raise ValueError(f'Unknown schedule config {config!r}.')
