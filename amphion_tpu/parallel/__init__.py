from amphion_tpu.parallel.mesh import (
    MeshSpec,
    build_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
