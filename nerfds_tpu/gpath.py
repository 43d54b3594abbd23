"""Storage-transparent paths (reference ``hypernerf/gpath.py:20-50``).

The reference wraps ``pathlib.PurePosixPath`` over ``tf.io.gfile`` so data
and experiment directories can live on GCS (``gs://...``) transparently.
The modern equivalent is ``etils.epath`` (the library orbax itself uses
for remote checkpoint directories): a pathlib-compatible ``Path`` that
dispatches ``open/exists/glob/mkdir`` to the right backend per scheme —
no TF dependency.

:func:`GPath` returns an ``epath.Path`` when etils is importable, else a
plain ``pathlib.Path`` (local-only). Data sources route directory handling
through it, so ``data_dir='gs://bucket/scene'`` works wherever gcsfs
credentials are ambient; everything else in the repo keeps plain pathlib
(local scratch, tests).
"""
from __future__ import annotations

import pathlib

try:
  from etils import epath
  _EPATH = True
except ImportError:  # pragma: no cover - etils is in the base image
  epath = None
  _EPATH = False


def GPath(*parts):
  """Path constructor: epath (GCS/S3-transparent) when available."""
  if _EPATH:
    return epath.Path(*parts)
  return pathlib.Path(*parts)


def is_remote(path) -> bool:
  s = str(path)
  return '://' in s or s.startswith('gs:')
