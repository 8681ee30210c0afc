from graphflow_tpu.parallel.mesh import (
    make_mesh, make_hybrid_mesh, init_distributed, data_sharding, replicated,
)
from graphflow_tpu.parallel.data_parallel import (
    make_dp_train_step, shard_batch, replicate,
)
from graphflow_tpu.parallel.partition import (
    plan_partition, plan_partition_batch, make_partitioned_forward,
    make_partitioned_train_step, shard_inputs,
)
