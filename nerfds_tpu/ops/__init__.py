"""L0 math primitives: pure jnp functions with no parameters."""

from nerfds_tpu.ops import math, quaternion, rendering, rigid, sampling  # noqa: F401
