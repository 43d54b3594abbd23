"""NormVoxels: trilinear interpolation and EMA updates."""
import jax.numpy as jnp
import numpy as np

from nerfds_tpu.models.norm_voxels import NormVoxels


def test_init_and_lookup_uniform():
  nv = NormVoxels(voxel_shape=(2, 4, 4, 4))
  params = nv.init()
  assert params['voxel_array'].shape == (2, 4, 4, 4, 3)
  t = jnp.zeros(5, jnp.int32)
  pos = jnp.asarray(np.random.RandomState(0).uniform(-1.2, 1.2, (5, 3)),
                    jnp.float32)
  value, _, coef = nv.lookup(params, t, pos)
  # Uniform grid -> interpolation returns the constant.
  np.testing.assert_allclose(np.asarray(value),
                             np.full((5, 3), np.sqrt(1 / 3.0)), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(coef).sum(-1), np.ones(5), rtol=1e-5)


def test_update_moves_toward_target():
  # One point: no overlapping-vertex double accumulation (with many points
  # sharing vertices the scatter-add can overshoot — true of the reference
  # formulation too; note the reference's own update is a silent no-op, its
  # `.at[].add()` result is discarded at modules.py:536).
  nv = NormVoxels(voxel_shape=(1, 4, 4, 4))
  params = nv.init()
  t = jnp.zeros(1, jnp.int32)
  pos = jnp.asarray([[0.2, -0.3, 0.4]], jnp.float32)
  target = jnp.asarray([[1.0, 0.0, 0.0]])
  sigma = jnp.full((1,), 5.0)  # occupied
  value0, params1 = nv.lookup_and_update(params, t, pos, lr=10.0,
                                         sigma=sigma, target_norm=target)
  value1, _, _ = nv.lookup(params1, t, pos)
  d0 = np.linalg.norm(np.asarray(value0) - np.asarray(target), axis=-1)
  d1 = np.linalg.norm(np.asarray(value1) - np.asarray(target), axis=-1)
  assert (d1 < d0).all()


def test_zero_sigma_small_update():
  nv = NormVoxels(voxel_shape=(1, 4, 4, 4))
  params = nv.init()
  t = jnp.zeros(4, jnp.int32)
  pos = jnp.asarray(np.random.RandomState(2).uniform(-1.0, 1.0, (4, 3)),
                    jnp.float32)
  target = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (4, 1))
  sigma = jnp.zeros((4,))
  _, params1 = nv.lookup_and_update(params, t, pos, lr=10.0, sigma=sigma,
                                    target_norm=target)
  # sigmoid(0) = 0.5 -> still some update, but bounded; grid stays finite.
  assert np.isfinite(np.asarray(params1['voxel_array'])).all()


def test_out_of_range_clamps():
  nv = NormVoxels(voxel_shape=(1, 4, 4, 4))
  params = nv.init()
  pos = jnp.asarray([[5.0, -5.0, 0.0]])
  value, _, _ = nv.lookup(params, jnp.zeros(1, jnp.int32), pos)
  assert np.isfinite(np.asarray(value)).all()
