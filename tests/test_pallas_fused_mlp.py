"""Fused-MLP pallas kernel vs the XLA MLP (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfds_tpu.models.mlp import MLP
from nerfds_tpu.pallas.fused_mlp import fused_apply


@pytest.mark.parametrize('depth,width,skips,out_ch,out_act', [
    (8, 256, (4,), 0, None),      # the NeRF trunk shape
    (6, 128, (4,), 3, None),      # warp-trunk-like with head
    (2, 64, (), 1, 'relu'),       # mask-like
])
def test_fused_matches_xla(depth, width, skips, out_ch, out_act):
  mlp = MLP(depth=depth, width=width, skips=skips,
            output_channels=out_ch, output_activation=out_act)
  in_dim = 52
  params = mlp.init(jax.random.PRNGKey(0), in_dim)
  x = jnp.asarray(
      np.random.RandomState(1).randn(300, in_dim).astype(np.float32))
  want = mlp.apply(params, x)
  got = fused_apply(mlp, params, x, tile=128, interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_fused_handles_nonmultiple_rows():
  mlp = MLP(depth=2, width=32, output_channels=4)
  params = mlp.init(jax.random.PRNGKey(0), 16)
  x = jnp.asarray(np.random.RandomState(2).randn(77, 16).astype(np.float32))
  want = mlp.apply(params, x)
  got = fused_apply(mlp, params, x, tile=64, interpret=True)
  assert got.shape == (77, 4)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)
