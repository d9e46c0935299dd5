from mofo_tpu.parallel.mesh import (
    MeshConfig,
    build_mesh,
    batch_sharding,
    param_sharding_rules,
    shard_params,
)
