from iris_tpu.parallel.sharding import (
    data_mesh, replicate, shard_batch, shard_pytree_batch,
)
