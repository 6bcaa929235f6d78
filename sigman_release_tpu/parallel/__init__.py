from sigman_release_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
    initialize_multihost,
)
