"""Batched SE(3): the vector-form (Rodrigues) hot path must agree with the
golden matrix-form exponential, and with known closed-form transforms."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfds_tpu.ops import rigid


def _random_screws(n, seed=0):
  rng = np.random.RandomState(seed)
  w_raw = rng.randn(n, 3).astype(np.float32) * 0.5
  v_raw = rng.randn(n, 3).astype(np.float32) * 0.5
  return jnp.asarray(w_raw), jnp.asarray(v_raw)


def test_known_rotation_z_90deg():
  # Screw: rotation about +z by 90°, no translation.
  w = jnp.asarray([[0.0, 0.0, 1.0]]) * (np.pi / 2)
  v = jnp.zeros((1, 3))
  screw = rigid.screw_from_raw(w, v)
  np.testing.assert_allclose(float(screw.theta[0]), np.pi / 2, rtol=1e-6)
  x = jnp.asarray([[1.0, 0.0, 0.0]])
  got = rigid.transform_point(screw, x)
  np.testing.assert_allclose(np.asarray(got), [[0.0, 1.0, 0.0]], atol=1e-6)


def test_pure_translation_limit():
  # Tiny rotation, large v: p ≈ θ v, i.e. the raw v_raw (v = v_raw/θ, p≈θv).
  w = jnp.asarray([[1e-4, 0.0, 0.0]])
  v_raw = jnp.asarray([[0.2, -0.3, 0.5]])
  screw = rigid.screw_from_raw(w, v_raw)
  x = jnp.asarray([[0.0, 0.0, 0.0]])
  got = rigid.transform_point(screw, x)
  np.testing.assert_allclose(np.asarray(got), np.asarray(v_raw),
                             rtol=1e-3, atol=1e-5)


def test_vector_form_matches_matrix_form():
  w_raw, v_raw = _random_screws(64)
  screw = rigid.screw_from_raw(w_raw, v_raw)
  x = jnp.asarray(np.random.RandomState(1).randn(64, 3).astype(np.float32))

  mat = rigid.exp_se3_matrix(screw.axis, screw.theta)
  hom = rigid.to_homogenous(x)[..., None]
  want = rigid.from_homogenous(
      jnp.matmul(mat, hom, precision=jax.lax.Precision.HIGHEST)[..., 0])
  got = rigid.transform_point(screw, x)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=2e-5)

  # Rotation-only (vector transport).
  mat_rot = rigid.exp_se3_matrix(screw.axis, screw.theta, rotation_only=True)
  want = rigid.from_homogenous(
      jnp.matmul(mat_rot, hom, precision=jax.lax.Precision.HIGHEST)[..., 0])
  got = rigid.rotate(screw, x)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=2e-5)

  # Inverse rotation-only (the normal transport obs->canonical inverse).
  mat_inv = rigid.exp_se3_matrix(screw.axis, screw.theta, rotation_only=True,
                                 inverse=True)
  want = rigid.from_homogenous(
      jnp.matmul(mat_inv, hom, precision=jax.lax.Precision.HIGHEST)[..., 0])
  got = rigid.rotate_inverse(screw, x)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=2e-5)


def test_inverse_roundtrip():
  w_raw, v_raw = _random_screws(32, seed=5)
  screw = rigid.screw_from_raw(w_raw, v_raw)
  x = jnp.asarray(np.random.RandomState(2).randn(32, 3).astype(np.float32))
  back = rigid.transform_point_inverse(screw, rigid.transform_point(screw, x))
  np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                             rtol=1e-4, atol=1e-5)
  # Rotation preserves norms.
  rot = rigid.rotate(screw, x)
  np.testing.assert_allclose(np.linalg.norm(np.asarray(rot), axis=-1),
                             np.linalg.norm(np.asarray(x), axis=-1),
                             rtol=1e-5)


def test_rotation_matrix_orthonormal():
  w_raw, v_raw = _random_screws(8, seed=7)
  screw = rigid.screw_from_raw(w_raw, v_raw)
  R = np.asarray(rigid.rotation_matrix(screw))
  eye = np.broadcast_to(np.eye(3), R.shape)
  np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-5)
  np.testing.assert_allclose(np.linalg.det(R), np.ones(8), rtol=1e-5)


def test_batched_jacobian_matches_jacfwd():
  w_raw, v_raw = _random_screws(16, seed=9)

  def warp_fn(pts):
    # A pointwise warp: screw depends on nothing, applied per point.
    screw = rigid.screw_from_raw(w_raw, v_raw)
    return rigid.transform_point(screw, pts)

  pts = jnp.asarray(np.random.RandomState(3).randn(16, 3).astype(np.float32))
  got = rigid.batched_jacobian(warp_fn, pts)

  def single_point_warp(p, wr, vr):
    screw = rigid.screw_from_raw(wr[None], vr[None])
    return rigid.transform_point(screw, p[None])[0]

  want = jax.vmap(jax.jacfwd(single_point_warp), in_axes=(0, 0, 0))(
      pts, w_raw, v_raw)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-4, atol=1e-5)


def test_gradients_flow_through_screw():
  # Second-order-AD readiness: grad of grad through the screw construction.
  def f(w_raw):
    screw = rigid.screw_from_raw(w_raw, jnp.ones_like(w_raw) * 0.1)
    x = jnp.asarray([[0.3, -0.2, 0.9]])
    return jnp.sum(rigid.transform_point(screw, x) ** 2)

  g = jax.grad(f)(jnp.asarray([[0.2, 0.3, -0.1]]))
  assert np.all(np.isfinite(np.asarray(g)))
  h = jax.grad(lambda w: jnp.sum(jax.grad(f)(w) ** 2))(
      jnp.asarray([[0.2, 0.3, -0.1]]))
  assert np.all(np.isfinite(np.asarray(h)))
