"""Partitioned-graph training demo: vertices sharded over chips, batches
over a second mesh axis.

The scale-out mode the reference lacks entirely (SURVEY.md section 2.8 —
its only "large graph" control is capping receptive fields): each graph's
padded vertex axis is sharded over the "graph" mesh axis, every
message-passing level exchanges only the per-pair boundary rows via ring
``ppermute``s (interior vertices contract while the halo is in flight),
and the batch is sharded over "data".  One jitted SPMD program computes
per-shard partial losses/gradients and psums them over BOTH axes — exact
vs the single-device step (tests/test_partition.py).

Run (CPU dryrun: XLA_FLAGS=--xla_force_host_platform_device_count=8):
    python examples/partitioned_training.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from graphflow_tpu import parallel
from graphflow_tpu.core import prep
from graphflow_tpu.models.smp2d import SMP2DConfig, init_smp2d_params
from graphflow_tpu.optim.optimizers import make_optimizer
from graphflow_tpu.utils.datasets import random_graph


def main():
    devices = jax.devices()
    if len(devices) < 2:
        devices = jax.devices("cpu")
    n_graph = 4 if len(devices) >= 8 else max(1, len(devices) // 2)
    n_data = max(1, len(devices) // n_graph)
    print(f"mesh: data={n_data} x graph={n_graph} "
          f"({devices[0].device_kind})")

    V = 8 * n_graph
    cfg = SMP2DConfig(max_nVertices=V, max_receptive_field=8, nLevels=2,
                      nChanels=8, nFeatures=4, nDepth=3)
    params = init_smp2d_params(jax.random.PRNGKey(0), cfg)

    graphs = [random_graph(V, 0.2, seed=s) for s in range(2 * n_data)]
    targets = jnp.asarray([float(g.nVertices) for g in graphs])
    pgs = [prep.prepare_graph(g, cfg.nLevels, V, cfg.max_receptive_field,
                              cfg.nDepth) for g in graphs]

    plan = parallel.plan_partition_batch(pgs, n_graph)
    print(f"halo rows/shard/level: {plan.rows_targeted} targeted vs "
          f"{plan.rows_allgather} all_gather "
          f"({plan.rows_allgather / max(plan.rows_targeted, 1):.1f}x less)")

    mesh = parallel.make_mesh({"data": n_data, "graph": n_graph},
                              devices=devices)
    opt = make_optimizer("adam")
    step = parallel.make_partitioned_train_step(cfg, plan, opt, mesh)
    inputs = parallel.shard_inputs(plan)
    opt_state = opt.init(params)

    first = None
    for epoch in range(64):
        params, opt_state, loss = step(params, opt_state, inputs, targets,
                                       0.02)
        first = first if first is not None else float(loss)
        if epoch % 8 == 0:
            print(f"epoch {epoch:3d}: loss {float(loss):.4f}")
    print(f"loss {first:.2f} -> {float(loss):.2f}")
    assert np.isfinite(float(loss)) and float(loss) < first


if __name__ == "__main__":
    main()
