"""nerfds_tpu — a TPU-native dynamic-specular NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JokerYan/NeRF-DS (CVPR 2023): dynamic NeRF with SE(3) deformation fields,
hyper-coordinate ambient slicing, surface-normal-conditioned radiance and
mask-guided deformation — built TPU-first:

  * every hot path is a batched ``[N, C]`` matmul that tiles onto the MXU
    (the reference nests ``vmap(vmap(grad))`` per sample point),
  * the density gradient ∇σ is one batched VJP through the whole
    warp→hyper→trunk stack instead of a per-point ``value_and_grad``,
  * the SE(3) warp trunk is evaluated once per sample and its rotation is
    reused for the normal transport and field visualisations (the reference
    re-evaluates the field up to 4× per level),
  * distribution is ``jit`` over a ``jax.sharding.Mesh`` with rays sharded
    on a ``'data'`` axis and parameters replicated (the reference uses
    ``pmap``/``pmean``),
  * fused Pallas kernels cover the ray-compositing scan.

Layout (mirrors SURVEY.md §2's component inventory):
  ops/         L0 math primitives (posenc, rigid body, sampling, rendering)
  models/      L3 model layer (MLP stacks, warp fields, NeRF-DS model)
  datasets/    L2 data layer (cameras already in camera.py, Nerfies loader)
  training/    L4 training (losses, train step, schedules, checkpoints)
  parallel/    L6 distribution (mesh + shardings)
  evaluation/  L5 eval/render (chunked renderer, metrics, video)
  pallas/      TPU kernels
"""

__version__ = "0.1.0"
