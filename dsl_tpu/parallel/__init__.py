from dsl_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS, batch_sharding, local_batch_size, make_mesh,
    replicate, replicated, shard_batch)
from dsl_tpu.parallel import dist  # noqa: F401
