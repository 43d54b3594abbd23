"""Imports the ACTUAL reference implementation (/root/reference) for parity
tests and reference-anchored benchmarks. No reference code is copied — the
modules are loaded from the read-only mount with two compat shims:

* ``flax.optim`` (dead flax 0.3 API the reference imports but the loaded
  surfaces never call) is stubbed.
* ``gin`` is stubbed with a no-op ``configurable`` — the reference classes
  are plain dataclass ``nn.Module``s once the decorator is inert, so their
  attributes are set via constructor kwargs instead of gin bindings.

The reference's linen modules (modules.py, warping.py, models.py) are
forward-compatible with the installed flax; only their *driving conventions*
differ (e.g. SE3Field.warp operates on a single point and is vmapped by the
caller, reference models.py:588).
"""
from __future__ import annotations

import importlib.util
import pathlib
import sys
import types

REF = pathlib.Path('/root/reference')

_CACHE = {}


def reference_available() -> bool:
  return REF.exists()


def load_reference(names=('types', 'utils', 'model_utils', 'quaternion',
                          'rigid_body', 'bone_utils', 'modules', 'warping',
                          'schedules', 'models')):
  """Loads reference modules under shims; returns a SimpleNamespace."""
  if 'flax.optim' not in sys.modules:
    optim_mod = types.ModuleType('flax.optim')
    optim_mod.Optimizer = object
    sys.modules['flax.optim'] = optim_mod
  if 'gin' not in sys.modules:
    gin_mod = types.ModuleType('gin')

    def _configurable(*args, **kwargs):
      if args and callable(args[0]) and not kwargs:
        return args[0]
      return lambda fn_or_cls: fn_or_cls

    gin_mod.configurable = _configurable
    gin_mod.REQUIRED = None
    sys.modules['gin'] = gin_mod
  pkg = types.ModuleType('hypernerf')
  pkg.__path__ = [str(REF / 'hypernerf')]
  sys.modules.setdefault('hypernerf', pkg)

  out = types.SimpleNamespace()
  for name in names:
    if name in _CACHE:
      mod = _CACHE[name]
    else:
      spec = importlib.util.spec_from_file_location(
          f'hypernerf.{name}', REF / 'hypernerf' / f'{name}.py')
      mod = importlib.util.module_from_spec(spec)
      sys.modules[f'hypernerf.{name}'] = mod
      spec.loader.exec_module(mod)
      if name == 'models':
        # Flax-version compat: ``NerfModel.render_samples`` guards
        # ``if self.warp_field is not None`` (models.py:1291) but setup only
        # assigns ``warp_field`` when ``use_warp`` (models.py:354-357);
        # flax 0.3 resolved the unassigned attribute to None, modern flax
        # raises. A class-level default restores the old semantics (setup's
        # instance assignment shadows it when the field exists).
        mod.NerfModel.warp_field = None
      _CACHE[name] = mod
    setattr(out, name, mod)
  return out
