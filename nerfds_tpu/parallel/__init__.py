"""L6 distribution layer."""

from nerfds_tpu.parallel.mesh import (DATA_AXIS, batch_sharding,  # noqa: F401
                                      create_mesh, replicated_sharding,
                                      shard_batch)
