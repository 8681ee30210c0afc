"""Bucketed batching: shape-polymorphic forwards + padding exactness."""

import numpy as np
import pytest
import jax

from graphflow_tpu.core import batching, prep
from graphflow_tpu.models import SMP_omega
from graphflow_tpu.models.base import fit_bucketed
from graphflow_tpu.utils.datasets import random_graph


def test_bucket_by_size_groups():
    graphs = [random_graph(n, 0.3, seed=n) for n in (3, 7, 9, 15, 20)]
    buckets = batching.bucket_by_size(graphs, list(range(5)),
                                      boundaries=(8, 16, 32))
    assert sorted(buckets) == [8, 16, 32]
    assert [g.nVertices for g in buckets[8][0]] == [3, 7]
    assert buckets[16][1] == [2, 3]


def test_bucket_overflow_raises():
    with pytest.raises(ValueError):
        batching.bucket_by_size([random_graph(40, 0.2)], boundaries=(8, 16))


def test_prediction_invariant_to_padding_size():
    """The same graph padded to different bucket sizes must predict
    identically (the shape-polymorphic forward + masking exactness)."""
    g = random_graph(6, 0.4, seed=3)
    m = SMP_omega(max_nVertices=32, max_receptive_field=4, nLevels=2,
                  nChanels=6, nFeatures=4, nDepth=3, seed=1)
    preds = []
    for V in (8, 16, 32):
        pg = prep.prepare_graph(g, 2, V, 4, 3)
        batch = batching.stack_graphs([pg])
        pred, _ = m._jit_forward(m.params, batch)
        preds.append(float(np.asarray(pred)[0]))
    np.testing.assert_allclose(preds[0], preds[1], rtol=1e-5)
    np.testing.assert_allclose(preds[0], preds[2], rtol=1e-5)


def test_fit_bucketed_learns():
    rng = np.random.default_rng(0)
    graphs = [random_graph(int(n), 0.3, seed=i)
              for i, n in enumerate(rng.integers(4, 14, 12))]
    targets = [float(g.nVertices) for g in graphs]
    m = SMP_omega(max_nVertices=16, max_receptive_field=4, nLevels=1,
                  nChanels=6, nFeatures=4, nDepth=2)
    l0 = m.getLoss(graphs, targets)
    l1 = fit_bucketed(m, graphs, targets, 3e-3, 60, boundaries=(8, 16))
    assert l1 < 0.5 * l0, (l0, l1)
