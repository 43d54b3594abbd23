"""Test environment: run everything on a virtual 8-device CPU mesh.

This is the standard JAX multi-chip simulation trick: the sharding layer
(`nerfds_tpu.parallel`) is exercised against 8 host CPU devices so the pjit
programs compile and execute without TPU hardware.

NOTE: the environment's sitecustomize registers a tunneled TPU backend and
force-sets ``jax_platforms='axon,cpu'`` via ``jax.config`` (overriding the
env var), so we must override it back through ``jax.config`` after import.
Per-op dispatch over the tunnel makes eager tests pathologically slow
otherwise.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_addoption(parser):
  parser.addoption(
      "--runslow", action="store_true", default=False,
      help="run tests marked slow (multi-minute trains / subprocess "
           "pipelines, the exotic parity-ladder rungs); without it the "
           "suite is the fast path — measured ~13 min wall on a cold "
           "2-core host (round 5; scales down with cores: compiles "
           "dominate)")


def pytest_configure(config):
  config.addinivalue_line(
      "markers", "slow: multi-minute test (run with --runslow)")


def pytest_collection_modifyitems(config, items):
  if config.getoption("--runslow"):
    return
  skip_slow = pytest.mark.skip(reason="slow test: pass --runslow")
  for item in items:
    if "slow" in item.keywords:
      item.add_marker(skip_slow)
