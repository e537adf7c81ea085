"""Device mesh + sharding for data/model-parallel training and sampling."""

from ddqst_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    shard_data,
    replicate,
    data_sharding,
    replicated_sharding,
)
