from graphflow_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from graphflow_tpu.parallel.data_parallel import (
    make_dp_train_step, shard_batch, replicate,
)
