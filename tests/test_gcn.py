"""GCN family tests (GCN_1D/2D/3D, Distance, GCN_MW, NeuralFingerprint),
mirroring tests/test_GCN_1D.cpp's toy-molecule convergence genre."""

import numpy as np
import pytest

from graphflow_tpu.models.gcn import (
    GCN_1D, GCN_2D, GCN_3D, GCN_1D_Distance, GCN_MW, NeuralFingerprint,
)
from tests.molecules import all_molecules


@pytest.fixture(scope="module")
def molecules():
    return all_molecules()


@pytest.mark.parametrize("ctor", [GCN_1D, GCN_2D, GCN_3D])
def test_gcn_orders_converge(ctor, molecules):
    graphs, targets = molecules
    m = ctor(nLevels=2, max_nVertices=10, nFeatures=4, nHiddens=6, nDepth=3,
             max_Radius=2, momentum_param=0.85)
    l0 = m.getLoss(graphs, targets)
    for _ in range(80):
        _, l1 = m.BatchLearn(graphs, targets, 0.002)
    assert np.isfinite(l1)
    assert l1 < 0.6 * l0, (l0, l1)


def test_gcn_distance_channel(molecules):
    graphs, targets = molecules
    # Give the molecules synthetic geometric distances = shortest paths.
    from graphflow_tpu.core import prep as prep_mod
    for g in graphs:
        sp = prep_mod.floyd_warshall(g.adj)
        g.distance = sp.astype(float)
    m = GCN_1D_Distance(nLevels=1, max_nVertices=10, nFeatures=4, nHiddens=5,
                        nDepth=2, max_Radius=2)
    l0 = m.getLoss(graphs, targets)
    for _ in range(60):
        _, l1 = m.BatchLearn(graphs, targets, 0.002)
    assert l1 < l0
    # distance channel params must receive gradients
    import jax
    _, grads = m._batch_grad(m.params, m._stack(graphs, targets))
    gnorm = float(np.abs(np.asarray(grads["dlevels"][0]["W1"])).sum())
    assert gnorm > 0


def test_gcn_mw_converges(molecules):
    graphs, targets = molecules
    m = GCN_MW(nLevels=2, max_nVertices=10, nFeatures=4, nHiddens=8,
               nDepth=3)
    l0 = m.getLoss(graphs, targets)
    for _ in range(150):
        _, l1 = m.BatchLearn(graphs, targets, 0.01)
    assert l1 < 0.1 * l0, (l0, l1)


def test_neural_fingerprint_converges(molecules):
    graphs, targets = molecules
    m = NeuralFingerprint(nLevels=2, max_nVertices=10, nFeatures=4,
                          nHiddens=8)
    l0 = m.getLoss(graphs, targets)
    for _ in range(100):
        _, l1 = m.BatchLearn(graphs, targets, 0.003)
    assert l1 < 0.5 * l0, (l0, l1)


def test_gcn_radius_masks_differ(molecules):
    """Level radius min(l, max_Radius) must actually widen neighborhoods."""
    graphs, targets = molecules
    m1 = GCN_1D(nLevels=2, max_nVertices=10, nFeatures=4, nHiddens=6,
                nDepth=3, max_Radius=1, seed=0)
    m2 = GCN_1D(nLevels=2, max_nVertices=10, nFeatures=4, nHiddens=6,
                nDepth=3, max_Radius=2, seed=0)
    # same init, different radius -> different predictions on C2H4 (diameter 3)
    p1, p2 = m1.Predict(graphs[3]), m2.Predict(graphs[3])
    assert abs(p1 - p2) > 1e-9


def test_gcn_save_load(tmp_path, molecules):
    graphs, _ = molecules
    m = GCN_2D(nLevels=1, max_nVertices=10, nFeatures=4, nHiddens=5,
               nDepth=2, max_Radius=2, seed=2)
    p0 = m.Predict(graphs[0])
    fn = str(tmp_path / "gcn2d.dat")
    m.save_model(fn)
    m2 = GCN_2D(nLevels=1, max_nVertices=10, nFeatures=4, nHiddens=5,
                nDepth=2, max_Radius=2, seed=77)
    m2.load_model(fn)
    assert abs(m2.Predict(graphs[0]) - p0) < 1e-6
