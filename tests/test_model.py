"""Model layer: init/apply shapes, the batched σ-gradient vs per-point
autodiff, gradient flow, and config variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu import config as config_lib
from nerfds_tpu.models import NerfDSModel, default_extra_params


def make_rays(num_rays=8, seed=0, num_embeds=4):
  rng = np.random.RandomState(seed)
  origins = rng.randn(num_rays, 3).astype(np.float32) * 0.1
  directions = rng.randn(num_rays, 3).astype(np.float32)
  directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
  return {
      'origins': jnp.asarray(origins),
      'directions': jnp.asarray(directions),
      'metadata': {
          'warp': jnp.asarray(
              rng.randint(0, num_embeds, (num_rays, 1)), jnp.int32),
          'appearance': jnp.asarray(
              rng.randint(0, num_embeds, (num_rays, 1)), jnp.int32),
      },
      'mask': jnp.asarray(rng.rand(num_rays, 1).astype(np.float32)),
  }


def small(cfg_fn, **overrides):
  import dataclasses
  cfg = cfg_fn()
  kwargs = dict(
      num_coarse_samples=6, num_fine_samples=4, nerf_trunk_depth=2,
      nerf_trunk_width=32, se3_trunk_depth=2, se3_trunk_width=16,
      hyper_sheet_depth=2, hyper_sheet_width=16, mask_mlp_depth=2,
      mask_mlp_width=16, nerf_skips=(), se3_skips=(), hyper_sheet_skips=(),
      mask_skips=())
  kwargs.update(overrides)
  return dataclasses.replace(cfg, **kwargs)


@pytest.fixture(scope='module')
def nerf_ds_model():
  cfg = small(config_lib.nerf_ds)
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4,
                      near=0.2, far=2.0)
  params = model.init(jax.random.PRNGKey(0))
  return model, params


def test_init_param_tree(nerf_ds_model):
  model, params = nerf_ds_model
  assert set(params) == {'warp_embed', 'warp_field', 'hyper_sheet',
                         'mask_embed', 'mask_mlp', 'nerf'}
  assert set(params['nerf']) == {'coarse', 'fine'}
  assert params['warp_embed']['embedding'].shape == (4, 8)
  # SE3 heads output 3 channels each.
  assert params['warp_field']['w']['kernel'].shape[-1] == 3
  # σ head: 1 sigma + 3 normal channels.
  assert params['nerf']['fine']['alpha']['logit']['kernel'].shape[-1] == 4


def test_forward_shapes_and_finiteness(nerf_ds_model):
  model, params = nerf_ds_model
  rays = make_rays()
  extra = default_extra_params(model.config)
  out = model.render(params, rays, jax.random.PRNGKey(1), extra,
                     return_full=True, return_points=True)
  for level, num_samples in (('coarse', 6), ('fine', 10)):
    o = out[level]
    assert o['rgb'].shape == (8, 3)
    assert o['depth'].shape == (8,)
    assert o['med_depth'].shape == (8,)
    assert o['acc'].shape == (8,)
    assert o['weights'].shape == (8, num_samples)
    assert o['predicted_mask'].shape == (8, num_samples, 1)
    assert o['predicted_norm'].shape == (8, num_samples, 3)
    assert o['target_norm'].shape == (8, num_samples, 3)
    assert o['back_facing'].shape == (8, num_samples)
    assert o['ray_norm'].shape == (8, 3)
    assert o['ray_delta_x'].shape == (8, 3)
    assert o['ray_hyper_points'].shape == (8, 2)
    assert o['ray_predicted_mask'].shape == (8, 1)
    assert o['sharp_weights'].shape == (8, num_samples)
    assert o['warped_points'].shape == (8, num_samples, 5)  # 3 + 2 hyper
    assert o['med_points'].shape == (8, 1, 5)
    assert o['ray_rotation_field'].shape == (8, 3)
    assert o['ray_translation_field'].shape == (8, 3)
    for k, v in o.items():
      assert np.all(np.isfinite(np.asarray(v))), f'{level}/{k} not finite'
    # rgb is sigmoid-bounded.
    assert float(o['rgb'].min()) >= 0 and float(o['rgb'].max()) <= 1


def test_batched_sigma_gradient_matches_per_point_grad(nerf_ds_model):
  """The central TPU rewrite: ones-cotangent VJP == per-point jax.grad.

  Builds the model's own σ function and checks that the pullback of Σσ
  equals the vmap'd per-point gradient (what the reference computes with
  vmap(vmap(value_and_grad)), models.py:1065-1073).
  """
  model, params = nerf_ds_model
  extra = default_extra_params(model.config)
  rng = np.random.RandomState(3)
  n = 12
  pts = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
  warp_embed = jnp.asarray(rng.randn(n, 8).astype(np.float32) * 0.05)
  mask = jnp.asarray(rng.rand(n, 1).astype(np.float32))
  warp_in = jnp.concatenate([warp_embed, mask], axis=-1)

  sigma_fn = model.make_sigma_fn(params, 'coarse', warp_in, warp_in,
                                 warp_embed, None, extra)

  # Batched: one VJP with ones cotangent.
  sigma, vjp_fn, _ = jax.vjp(sigma_fn, pts, has_aux=True)
  (batched_grad,) = vjp_fn(jnp.ones_like(sigma))

  # Per point: the reference formulation.
  def single(p, w_in, h_emb):
    f = model.make_sigma_fn(params, 'coarse', w_in[None], w_in[None],
                            h_emb[None], None, extra)
    return f(p[None])[0][0]

  per_point_grad = jax.vmap(jax.grad(single), in_axes=(0, 0, 0))(
      pts, warp_in, warp_embed)
  np.testing.assert_allclose(np.asarray(batched_grad),
                             np.asarray(per_point_grad),
                             rtol=1e-4, atol=1e-6)
  # And σ itself matches.
  per_point_sigma = jax.vmap(lambda p, w, h: single(p, w, h))(
      pts, warp_in, warp_embed)
  np.testing.assert_allclose(np.asarray(sigma), np.asarray(per_point_sigma),
                             rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sigma_gradient_modes_agree(nerf_ds_model):
  """'vjp', 'jvp' and 'naive' ∇σ modes produce the same forward outputs
  and the same training gradients."""
  import dataclasses
  model, params = nerf_ds_model
  rays = make_rays(num_rays=4)
  extra = default_extra_params(model.config)

  def run(mode):
    cfg = dataclasses.replace(model.config, sigma_gradient_mode=mode)
    m = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)

    def loss_fn(p):
      out = m.render(p, rays, jax.random.PRNGKey(5), extra)
      return (jnp.mean(out['fine']['rgb'] ** 2)
              + jnp.mean((out['fine']['predicted_norm']
                          - out['fine']['target_norm']) ** 2)), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, out, grads

  loss_vjp, out_vjp, g_vjp = run('vjp')
  for mode in ('vmap', 'jvp', 'naive', 'fused'):
    loss_m, out_m, g_m = run(mode)
    np.testing.assert_allclose(float(loss_vjp), float(loss_m), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_vjp['fine']['target_norm']),
                               np.asarray(out_m['fine']['target_norm']),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_vjp),
                    jax.tree_util.tree_leaves(g_m)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_gradients_flow_to_all_params(nerf_ds_model):
  model, params = nerf_ds_model
  rays = make_rays()
  extra = default_extra_params(model.config)

  def loss_fn(p):
    out = model.render(p, rays, jax.random.PRNGKey(2), extra)
    target = jnp.zeros_like(out['fine']['rgb'])
    loss = jnp.mean((out['fine']['rgb'] - target) ** 2)
    loss += jnp.mean((out['coarse']['rgb'] - target) ** 2)
    # Norm supervision engages second-order AD through the σ-VJP.
    loss += jnp.mean(
        (out['fine']['predicted_norm'] - out['fine']['target_norm']) ** 2)
    loss += jnp.mean(out['fine']['ray_predicted_mask'] ** 2)
    return loss

  grads = jax.grad(loss_fn)(params)
  flat = jax.tree_util.tree_leaves_with_path(grads)
  zero_paths = [jax.tree_util.keystr(path) for path, g in flat
                if not np.all(np.isfinite(np.asarray(g)))
                or float(jnp.abs(g).max()) == 0.0]
  # Every parameter should receive a finite, nonzero gradient.
  assert not zero_paths, zero_paths


def test_vanilla_config_runs():
  cfg = small(config_lib.vanilla_nerf, num_fine_samples=0)
  model = NerfDSModel(config=cfg)
  params = model.init(jax.random.PRNGKey(0))
  assert set(params) == {'nerf'}
  assert set(params['nerf']) == {'coarse'}
  rays = make_rays()
  extra = default_extra_params(cfg)
  out = model.render(params, rays, jax.random.PRNGKey(1), extra)
  assert set(out) == {'coarse'}
  assert out['coarse']['rgb'].shape == (8, 3)
  assert np.all(np.isfinite(np.asarray(out['coarse']['rgb'])))


def test_hyper_without_warp_uses_dedicated_embed():
  # Hyper-only ablation: the reference crashes here (hyper_use_warp_embed
  # aliases a warp embed that is never built, models.py:330-340); this
  # framework falls back to a dedicated hyper embed.
  cfg = small(config_lib.nerf_ds, use_warp=False, use_mask_in_warp=False,
              use_predicted_norm=False, predict_norm=False,
              use_ref_radiance=False, screw_input_mode='none',
              use_delta_x_in_rgb_condition=False)
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)
  params = model.init(jax.random.PRNGKey(0))
  assert 'hyper_embed' in params and 'warp_embed' not in params
  rays = make_rays()
  extra = default_extra_params(cfg)
  out = model.render(params, rays, jax.random.PRNGKey(1), extra)
  assert np.all(np.isfinite(np.asarray(out['fine']['rgb'])))


def test_hypernerf_config_runs_with_elastic_jacobian():
  cfg = small(config_lib.hypernerf)
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)
  params = model.init(jax.random.PRNGKey(0))
  rays = make_rays()
  extra = default_extra_params(cfg)
  out = model.render(params, rays, jax.random.PRNGKey(1), extra,
                     return_warp_jacobian=True)
  assert out['coarse']['warp_jacobian'].shape == (8, 6, 3, 3)
  # At init the warp is near-identity (tiny-uniform output heads):
  # jacobian ≈ I to a few percent.
  jac = np.asarray(out['coarse']['warp_jacobian'])
  np.testing.assert_allclose(jac, np.broadcast_to(np.eye(3), jac.shape),
                             atol=6e-2)


def test_metadata_encoded_path(nerf_ds_model):
  model, params = nerf_ds_model
  rays = make_rays()
  extra = default_extra_params(model.config)
  encoded = model.encode_metadata(params, rays['metadata'])
  rays_enc = dict(rays, metadata=encoded)
  out_a = model.render(params, rays, jax.random.PRNGKey(7), extra)
  out_b = model.render(params, rays_enc, jax.random.PRNGKey(7), extra,
                       metadata_encoded=True)
  np.testing.assert_allclose(np.asarray(out_a['fine']['rgb']),
                             np.asarray(out_b['fine']['rgb']), atol=1e-6)


def test_interpolated_metadata():
  cfg = small(config_lib.hypernerf)
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)
  params = model.init(jax.random.PRNGKey(0))
  rays = make_rays()
  # (left, right, progression) triple metadata.
  meta = {'warp': jnp.asarray([[0.0, 1.0, 0.5]] * 8)}
  rays = dict(rays, metadata=meta)
  extra = default_extra_params(cfg)
  out = model.render(params, rays, jax.random.PRNGKey(1), extra)
  assert np.all(np.isfinite(np.asarray(out['fine']['rgb'])))


def test_screw_condition_mode():
  cfg = small(config_lib.nerf_ds, screw_input_mode='rotation')
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)
  params = model.init(jax.random.PRNGKey(0))
  rays = make_rays()
  out = model.render(params, rays, jax.random.PRNGKey(1),
                     default_extra_params(cfg))
  assert np.all(np.isfinite(np.asarray(out['fine']['rgb'])))
  cfg_full = small(config_lib.nerf_ds, screw_input_mode='full')
  model2 = NerfDSModel(config=cfg_full, num_warp_embeds=4, num_hyper_embeds=4)
  params2 = model2.init(jax.random.PRNGKey(0))
  # rgb input is 3 channels wider for 'full' than 'rotation'.
  w1 = params['nerf']['fine']['rgb']['hidden_0']['kernel'].shape[0]
  w2 = params2['nerf']['fine']['rgb']['hidden_0']['kernel'].shape[0]
  assert w2 == w1 + 3
  out2 = model2.render(params2, rays, jax.random.PRNGKey(1),
                       default_extra_params(cfg_full))
  assert np.all(np.isfinite(np.asarray(out2['fine']['rgb'])))


def test_translation_field_full_model():
  """Full NeRF-DS pipeline with warp_field_type='translation': forward
  renders and training grads reach the warp MLP (regression: the
  storage_dtype kwarg was missing from TranslationField.warp, so every
  translation-field forward raised TypeError)."""
  cfg = small(config_lib.nerf_ds, warp_field_type='translation')
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)
  params = model.init(jax.random.PRNGKey(0))
  rays = make_rays()
  extra = default_extra_params(cfg)
  out = model.render(params, rays, jax.random.PRNGKey(1), extra)
  assert np.all(np.isfinite(np.asarray(out['fine']['rgb'])))

  def loss(p):
    o = model.render(p, rays, jax.random.PRNGKey(1), extra)
    return jnp.mean(o['fine']['rgb'] ** 2)

  g = jax.jit(jax.grad(loss))(params)
  warp_g = jax.tree_util.tree_leaves(g['warp_field'])
  assert all(np.isfinite(np.asarray(x)).all() for x in warp_g)
  assert any(float(jnp.abs(x).max()) > 0 for x in warp_g)
  # apply_warp (background-loss path) takes the same storage_dtype slot.
  pts = jnp.asarray(np.random.RandomState(2).randn(5, 3), jnp.float32)
  meta = jnp.zeros((5, 1), jnp.int32)
  warped = model.apply_warp(params, pts, meta, extra)
  assert np.all(np.isfinite(np.asarray(warped)))


@pytest.mark.slow
def test_hyper_c_mode():
  cfg = small(config_lib.nerf_ds, use_hyper_c=True, hyper_c_hyper_input=True,
              use_hyper_c_embed=False)
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)
  params = model.init(jax.random.PRNGKey(0))
  assert 'hyper_c_mlp' in params
  rays = make_rays()
  out = model.render(params, rays, jax.random.PRNGKey(1),
                     default_extra_params(cfg))
  assert out['fine']['ray_hyper_c'].shape == (8, 2)
  assert np.all(np.isfinite(np.asarray(out['fine']['rgb'])))
  # Gradients flow into the hyper_c sheet.
  def loss(p):
    o = model.render(p, rays, jax.random.PRNGKey(1),
                     default_extra_params(cfg))
    return jnp.mean(o['fine']['rgb'] ** 2)
  g = jax.grad(loss)(params)
  gmax = max(float(jnp.abs(x).max())
             for x in jax.tree_util.tree_leaves(g['hyper_c_mlp']))
  assert np.isfinite(gmax) and gmax > 0


def test_canonical_norm_supervision():
  cfg = small(config_lib.nerf_ds, norm_supervision_type='canonical')
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)
  params = model.init(jax.random.PRNGKey(0))
  rays = make_rays()
  out = model.render(params, rays, jax.random.PRNGKey(1),
                     default_extra_params(cfg))
  t = np.asarray(out['fine']['target_norm'])
  assert np.all(np.isfinite(t))
  np.testing.assert_allclose(np.linalg.norm(t, axis=-1),
                             np.ones(t.shape[:-1]), rtol=1e-4)


def test_bf16_zones_restrict_compute_dtype():
  """bf16_zones limits bf16 to named subnetworks; the forward stays finite
  and close to the f32 forward (geometry path f32 => tight agreement)."""
  cfg = small(config_lib.nerf_ds, compute_dtype='bfloat16',
              bf16_zones=('trunk', 'rgb', 'mask'))
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4,
                      near=0.2, far=2.0)
  assert model.cdtype_for('trunk') == jnp.bfloat16
  assert model.cdtype_for('rgb') == jnp.bfloat16
  assert model.cdtype_for('warp') is None
  assert model.cdtype_for('hyper') is None

  import dataclasses
  params = model.init(jax.random.PRNGKey(0))
  rays = make_rays()
  extra = default_extra_params(cfg)
  out = model.render(params, rays, jax.random.PRNGKey(1), extra)
  f32_model = NerfDSModel(
      config=dataclasses.replace(cfg, compute_dtype=None),
      num_warp_embeds=4, num_hyper_embeds=4, near=0.2, far=2.0)
  out_f32 = f32_model.render(params, rays, jax.random.PRNGKey(1), extra)
  for level in ('coarse', 'fine'):
    assert jnp.isfinite(out[level]['rgb']).all()
    np.testing.assert_allclose(out[level]['rgb'], out_f32[level]['rgb'],
                               atol=0.1)


@pytest.mark.slow
def test_concat_dense_inputs_matches_split_weight(nerf_ds_model):
  """Moved to the slow path (70 s of value_and_grad compiles on a cold
  2-core host); the `_with_skips` variant below keeps the split-weight
  equivalence property on the fast path at 1/5 the cost.

  The reference op graph (materialised concat->Dense,
  `concat_dense_inputs=True`, used by the 'naive' A/B baseline) computes the
  same function as the split-weight form — outputs and gradients agree."""
  import dataclasses
  model, params = nerf_ds_model
  rays = make_rays(num_rays=4)
  extra = default_extra_params(model.config)
  cfg = dataclasses.replace(model.config, concat_dense_inputs=True)
  m_cat = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4)

  def loss_fn(m):
    def f(p):
      out = m.render(p, rays, jax.random.PRNGKey(7), extra)
      return jnp.mean(out['fine']['rgb'] ** 2), out['fine']['rgb']
    return jax.value_and_grad(f, has_aux=True)

  (l0, rgb0), g0 = loss_fn(model)(params)
  (l1, rgb1), g1 = loss_fn(m_cat)(params)
  np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(rgb0), np.asarray(rgb1),
                             rtol=1e-5, atol=1e-6)
  for a, b in zip(jax.tree_util.tree_leaves(g0),
                  jax.tree_util.tree_leaves(g1)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=1e-6)


def test_concat_dense_inputs_matches_split_weight_with_skips():
  """Same equivalence with skip layers enabled: the skip-layer re-concat
  (mlp.py input_parts re-feed) is the main concat site in the reference
  (trunk skip@4, modules.py:64-66) — cover its split-weight form too."""
  import dataclasses
  cfg = small(config_lib.nerf_ds, nerf_trunk_depth=3, nerf_skips=(1,),
              se3_trunk_depth=3, se3_skips=(2,), hyper_sheet_depth=3,
              hyper_sheet_skips=(1,), mask_mlp_depth=3, mask_skips=(2,))
  model = NerfDSModel(config=cfg, num_warp_embeds=4, num_hyper_embeds=4,
                      near=0.2, far=2.0)
  params = model.init(jax.random.PRNGKey(0))
  rays = make_rays(num_rays=4)
  extra = default_extra_params(cfg)
  m_cat = NerfDSModel(
      config=dataclasses.replace(cfg, concat_dense_inputs=True),
      num_warp_embeds=4, num_hyper_embeds=4, near=0.2, far=2.0)

  def loss_fn(m):
    def f(p):
      out = m.render(p, rays, jax.random.PRNGKey(7), extra)
      return jnp.mean(out['fine']['rgb'] ** 2), out['fine']['rgb']
    return jax.value_and_grad(f, has_aux=True)

  (l0, rgb0), g0 = loss_fn(model)(params)
  (l1, rgb1), g1 = loss_fn(m_cat)(params)
  np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(rgb0), np.asarray(rgb1),
                             rtol=1e-5, atol=1e-6)
  for a, b in zip(jax.tree_util.tree_leaves(g0),
                  jax.tree_util.tree_leaves(g1)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=1e-6)


def test_quantize_storage_survives_jit_and_second_order():
  """The bf16 storage round-trip must not be folded away by XLA's
  excess-precision simplifier (the optimization_barrier in
  mlp.quantize_storage is load-bearing), and must stay twice
  differentiable for the σ-gradient supervision."""
  from nerfds_tpu.models.mlp import quantize_storage
  x = jnp.asarray(np.random.RandomState(0).randn(8, 16), jnp.float32)
  q = jax.jit(lambda v: quantize_storage(v, jnp.bfloat16))(x)
  assert float(jnp.abs(q - x).max()) > 0  # really quantised under jit
  np.testing.assert_allclose(np.asarray(q), np.asarray(x), atol=2e-2)

  def f(v):
    return jnp.sum(quantize_storage(v, jnp.bfloat16) ** 3)

  g = jax.jit(jax.grad(f))(x)
  assert np.isfinite(np.asarray(g)).all()
  h = jax.jit(jax.grad(lambda v: jnp.sum(jax.grad(f)(v) ** 2)))(x)
  assert np.isfinite(np.asarray(h)).all()
  # Identity when disabled.
  np.testing.assert_array_equal(np.asarray(quantize_storage(x, None)),
                                np.asarray(x))


def _norm_loss_for(model, params, rays, extra):
  """The norm-supervision loss THROUGH the production path: render, then
  training/losses.py compute_loss_and_stats (the same gather/normalisation
  the fused train step differentiates). Extracting stats['loss/norm_diff']
  isolates the norm term while exercising the real loss code, so a drift in
  losses.py's top-k gather is caught by the exactness test below."""
  from nerfds_tpu.training import losses as losses_lib
  from nerfds_tpu.training.step import build_schedules, eval_schedules
  out = model.render(params, rays, jax.random.PRNGKey(7), extra)
  train_cfg = config_lib.TrainConfig()
  scalars = eval_schedules(build_schedules(train_cfg), 0)
  batch = {'rgb': jnp.zeros_like(out['fine']['rgb']), 'mask': rays['mask']}
  _, stats = losses_lib.compute_loss_and_stats(
      model.config, train_cfg, out['fine'], batch, scalars)
  return stats['loss/norm_diff']


def test_norm_grad_topk_full_k_is_exact(nerf_ds_model):
  """norm_grad_topk with k == num_samples is a permutation of the exact
  path: the norm loss AND its parameter gradient (second-order through ∇σ)
  must match the default path to fp tolerance."""
  import dataclasses
  model, params = nerf_ds_model
  cfg_topk = dataclasses.replace(model.config, norm_grad_topk=64)
  model_topk = NerfDSModel(config=cfg_topk, num_warp_embeds=4,
                           num_hyper_embeds=4, near=0.2, far=2.0)
  rays = make_rays()
  extra = default_extra_params(model.config)

  loss_exact, grad_exact = jax.value_and_grad(
      lambda p: _norm_loss_for(model, p, rays, extra))(params)
  loss_topk, grad_topk = jax.value_and_grad(
      lambda p: _norm_loss_for(model_topk, p, rays, extra))(params)

  np.testing.assert_allclose(float(loss_topk), float(loss_exact),
                             rtol=1e-5, atol=1e-7)
  from jax import flatten_util
  flat_e, _ = flatten_util.ravel_pytree(grad_exact)
  flat_t, _ = flatten_util.ravel_pytree(grad_topk)
  np.testing.assert_allclose(np.asarray(flat_t), np.asarray(flat_e),
                             rtol=2e-4, atol=2e-6)


def test_norm_grad_topk_restricted_shapes_and_quality(nerf_ds_model):
  """k < S: target exists only at the k selected samples, the selection is
  the top-k by weight, and the loss approximates the exact value (the
  discarded weight mass bounds the error)."""
  import dataclasses
  model, params = nerf_ds_model
  k = 3
  cfg_topk = dataclasses.replace(model.config, norm_grad_topk=k)
  model_topk = NerfDSModel(config=cfg_topk, num_warp_embeds=4,
                           num_hyper_embeds=4, near=0.2, far=2.0)
  rays = make_rays()
  extra = default_extra_params(model.config)

  out = model_topk.render(params, rays, jax.random.PRNGKey(7), extra)
  o = out['fine']
  assert o['target_norm'].shape == (8, k, 3)
  assert o['norm_topk_idx'].shape == (8, k)
  assert np.all(np.isfinite(np.asarray(o['target_norm'])))
  # The selection really is the k largest weights per ray.
  w = np.asarray(o['weights'])
  idx = np.asarray(o['norm_topk_idx'])
  for r in range(w.shape[0]):
    top = set(np.argsort(w[r])[::-1][:k].tolist())
    assert set(idx[r].tolist()) == top
  # Coarse level has 6 samples; k=3 restricts there too.
  assert out['coarse']['target_norm'].shape == (8, k, 3)

  loss_exact = float(_norm_loss_for(model, params, rays, extra))
  loss_topk = float(_norm_loss_for(model_topk, params, rays, extra))
  # Selected weight mass dominates, so the loss is close in relative terms.
  assert abs(loss_topk - loss_exact) <= 0.35 * abs(loss_exact) + 1e-6


def test_remat_feat_is_exact(nerf_ds_model):
  """`remat_feat` (narrow feeder remat, the round-5 DMA-wall attack) is
  pure recompute: loss and parameter gradients — including the
  second-order norm-supervision path — match the default bit-for-bit up
  to fp tolerance."""
  import dataclasses
  model, params = nerf_ds_model
  m1 = NerfDSModel(config=dataclasses.replace(model.config, remat_feat=True),
                   num_warp_embeds=4, num_hyper_embeds=4, near=0.2, far=2.0)
  rays = make_rays()
  extra = default_extra_params(model.config)

  def loss(m):
    def f(p):
      out = m.render(p, rays, jax.random.PRNGKey(7), extra)
      o = out['fine']
      return (jnp.mean(o['rgb'] ** 2)
              + jnp.mean(o['weights'] * jnp.linalg.norm(
                  o['predicted_norm'] - o['target_norm'], axis=-1)))
    return jax.value_and_grad(f)

  l0, g0 = loss(model)(params)
  l1, g1 = loss(m1)(params)
  np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
  from jax import flatten_util
  f0, _ = flatten_util.ravel_pytree(g0)
  f1, _ = flatten_util.ravel_pytree(g1)
  np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                             rtol=1e-4, atol=1e-6)
