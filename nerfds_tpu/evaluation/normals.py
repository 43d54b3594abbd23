"""Normal-fidelity metric: rendered normals vs an analytic ground truth.

The NeRF-DS raison d'être is normal-aware radiance (reference README.md:1-12,
norm path models.py:1104-1152); nothing in the reference measures normal
*accuracy* — this is the measurement harness the rebuild adds.

Association is by the MEDIAN-WEIGHT SAMPLE: for every ray the sample where
cumulative compositing weight crosses 0.5 (``compute_depth_index`` — the
reference's median-depth / med_points convention, model_utils.py:272-317)
is taken as "the surface the model sees", and the observation-frame normal
at that sample (``norm_input`` — the canonical predicted normal rotated
back through the shared screw's R⁻¹, the frame an analytic scene normal
lives in) is compared against the analytic normal at that sample's 3D
position.

Two rejected associators, both measured: (a) the round-3 median-DEPTH
point + hard radius gate returned an empty pixel set at production scale;
(b) a per-ray weight ARGMAX is unstable under diffuse weight rows — on a
400-step model it lands at median radius 0.65 from the sphere centre
(near-plane and tail samples win the argmax) while the median-weight
sample sits at 0.23, i.e. on the actual surface. The median-weight sample
is robust to diffuse tails yet still indexes a real sample so per-sample
normals can be gathered.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfds_tpu.ops import rendering


def normal_fidelity(model, params, source, extra_params,
                    analytic_normal: Callable[[np.ndarray, float], np.ndarray],
                    item_ids: Optional[Iterable[str]] = None,
                    chunk: int = 2048,
                    min_weight: float = 0.1,
                    surface_filter: Optional[
                        Callable[[np.ndarray, float], np.ndarray]] = None
                    ) -> Dict[str, float]:
  """Mean cosine between rendered and analytic normals on foreground rays.

  analytic_normal(points [N,3], t) -> unit normals [N,3] for the scene
  surface nearest each point at time t (for the synthetic sphere:
  normalize(p - center(t))).

  Returns {'cosine', 'num_pixels', 'frac_selected'} (+ 'surface_cosine',
  'surface_pixels' when ``surface_filter`` is given); selection is
  foreground-mask pixels whose median-weight sample carries more than
  ``min_weight`` compositing weight (the model actually resolved a
  surface there).

  surface_filter(points [N,3], t) -> bool [N]: restricts the reported
  'surface_cosine' to associated points consistent with the true surface.
  The unfiltered cosine is only meaningful once geometry has converged:
  at short horizons the associated point can sit on fog, where the
  analytic normal points away from the camera and the cosine is
  mechanically negative regardless of the normal branch's quality.
  """
  render_chunk = jax.jit(functools.partial(
      model.render, return_full=True, return_weights=True,
      return_points=True))
  if item_ids is None:
    item_ids = source.train_ids[:4]
  coss, n_sel, n_fg = [], 0, 0
  surf_coss, n_surf = [], 0
  for iid in item_ids:
    item = source.load_item(iid)
    o = item['origins'].reshape(-1, 3)
    d = item['directions'].reshape(-1, 3)
    mask2d = item['mask'].reshape(-1) > 0.5
    t = source.frame_time(iid)
    sel_pts, sel_norms, sel_mask = [], [], []
    for s0 in range(0, o.shape[0], chunk):
      n = min(chunk, o.shape[0] - s0)
      sub = {
          'origins': jnp.asarray(o[s0:s0 + n]),
          'directions': jnp.asarray(d[s0:s0 + n]),
          'mask': jnp.asarray(item['mask'].reshape(-1, 1)[s0:s0 + n]),
          'metadata': {
              k: jnp.asarray(np.broadcast_to(
                  v.reshape(-1, v.shape[-1])[:1], (n, v.shape[-1])))
              for k, v in item['metadata'].items()},
      }
      out = render_chunk(params, sub, jax.random.PRNGKey(0), extra_params)
      f = out['fine'] if 'fine' in out else out['coarse']
      w = np.asarray(f['weights'])                       # [R, S]
      tn = np.asarray(f['norm_input'])                   # [R, S, 3]
      pts = np.asarray(f['points'])                      # [R, S, 3]
      idx = np.asarray(rendering.compute_depth_index(jnp.asarray(w)))
      rows = np.arange(w.shape[0])
      sel_pts.append(pts[rows, idx])
      sel_norms.append(tn[rows, idx])
      sel_mask.append(w[rows, idx] > min_weight)
    pts = np.concatenate(sel_pts)
    norms = np.concatenate(sel_norms)
    resolved = np.concatenate(sel_mask)
    select = mask2d & resolved
    n_fg += int(mask2d.sum())
    n_sel += int(select.sum())
    if not select.sum():
      continue
    gt = analytic_normal(pts[select], t)
    pn = norms[select]
    pn = pn / np.maximum(np.linalg.norm(pn, axis=-1, keepdims=True), 1e-8)
    cos_item = (gt * pn).sum(-1)
    coss.append(float(cos_item.mean()))
    if surface_filter is not None:
      on_surf = surface_filter(pts[select], t)
      n_surf += int(on_surf.sum())
      if on_surf.sum():
        surf_coss.append(float(cos_item[on_surf].mean()))
  out = {
      'cosine': float(np.mean(coss)) if coss else float('nan'),
      'num_pixels': n_sel,
      'frac_selected': n_sel / max(n_fg, 1),
  }
  if surface_filter is not None:
    out['surface_cosine'] = (float(np.mean(surf_coss)) if surf_coss
                             else float('nan'))
    out['surface_pixels'] = n_surf
  return out


def sphere_analytic_normal(center_fn):
  """analytic_normal for the synthetic moving sphere: outward radial
  direction from the time-t center."""
  def fn(points: np.ndarray, t: float) -> np.ndarray:
    n = points - center_fn(t)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
  return fn


def sphere_surface_filter(center_fn, max_radius: float = 0.32):
  """surface_filter for the synthetic sphere (σ scale 0.12; the visible
  surface shell sits at radius ≲ 0.3)."""
  def fn(points: np.ndarray, t: float) -> np.ndarray:
    return np.linalg.norm(points - center_fn(t), axis=-1) < max_radius
  return fn
