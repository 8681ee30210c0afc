"""Partitioned-graph execution tests: vertex sharding + halo exchange must be
exact vs the single-device forward (8-way virtual CPU mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphflow_tpu.core import prep
from graphflow_tpu.models.smp2d import SMP2DConfig, init_smp2d_params, \
    smp2d_forward
from graphflow_tpu.parallel import mesh as mesh_lib
from graphflow_tpu.parallel.partition import (
    plan_partition, make_partitioned_forward, shard_inputs,
)
from graphflow_tpu.utils.datasets import random_graph
from graphflow_tpu.core import batching


N_SHARDS = 8


@pytest.fixture(scope="module")
def setup():
    V = 24  # divisible by 8
    g = random_graph(V, 0.25, seed=5)
    cfg = SMP2DConfig(max_nVertices=V, max_receptive_field=4, nLevels=2,
                      nChanels=6, nFeatures=4, nDepth=3)
    params = init_smp2d_params(jax.random.PRNGKey(0), cfg)
    pg = prep.prepare_graph(g, cfg.nLevels, cfg.max_nVertices,
                            cfg.max_receptive_field, cfg.nDepth)
    return g, cfg, params, pg


def test_plan_partition_shapes(setup):
    _, cfg, _, pg = setup
    plan = plan_partition(pg, N_SHARDS)
    assert plan.Vs == cfg.max_nVertices // N_SHARDS
    assert plan.exp_idx.shape == (N_SHARDS, plan.H)
    # remapped neighbor indices stay in the extended buffer range
    assert plan.nbr_loc.max() < plan.Vs + N_SHARDS * plan.H


def test_partitioned_forward_matches_single_device(setup):
    _, cfg, params, pg = setup
    plan = plan_partition(pg, N_SHARDS)
    m = mesh_lib.make_mesh({"graph": N_SHARDS}, devices=jax.devices("cpu"))
    fwd = make_partitioned_forward(cfg, plan, m)
    pred_p, feat_p = fwd(params, shard_inputs(plan))

    batch = batching.stack_graphs([pg])
    g0 = jax.tree_util.tree_map(lambda x: x[0], batch)
    pred_s, feat_s = smp2d_forward(params, g0, cfg)

    np.testing.assert_allclose(float(pred_p), float(pred_s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(feat_p), np.asarray(feat_s),
                               rtol=1e-4, atol=1e-5)


def test_partition_exchanges_only_boundary(setup):
    """The halo must be a strict subset of vertices (scalability sanity)."""
    _, _, _, pg = setup
    plan = plan_partition(pg, N_SHARDS)
    total_exported = int(plan.exp_mask.sum())
    assert total_exported < pg.vmask.shape[0]  # less than full replication


def test_partitioned_gradients_flow(setup):
    _, cfg, params, pg = setup
    plan = plan_partition(pg, N_SHARDS)
    m = mesh_lib.make_mesh({"graph": N_SHARDS}, devices=jax.devices("cpu"))
    fwd = make_partitioned_forward(cfg, plan, m)
    inputs = shard_inputs(plan)

    def loss(p):
        pred, _ = fwd(p, inputs)
        return (pred - 3.0) ** 2

    grads = jax.grad(loss)(params)
    gn = float(jnp.abs(grads["H"]).sum())
    assert np.isfinite(gn) and gn > 0
