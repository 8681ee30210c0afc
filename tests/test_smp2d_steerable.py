"""Steerable-filter second-order SMP tests (SMP_2D base + variants)."""

import numpy as np
import pytest

from graphflow_tpu.models.smp2d_steerable import (
    SMP_2D, SMP_2D_classification, SMP_2D_ver2, SMP_2D_ver3, SMP_2D_ver4,
    SMP_2D_ver5, Unrestricted_SMP_2D, Unrestricted_SMP_2D_ver2,
)
from tests.molecules import all_molecules


@pytest.fixture(scope="module")
def molecules():
    return all_molecules()


@pytest.mark.parametrize("ctor,kwargs,frac", [
    (SMP_2D, dict(max_nVertices=10, nLevels=2, nChanels=6, nFeatures=4,
                  nDepth=3), 0.1),
    (SMP_2D_ver2, dict(max_nVertices=10, nLevels=2, nChanels=4, nFeatures=4,
                       nDepth=3), 0.1),
    (SMP_2D_ver3, dict(max_nVertices=10, nLevels=2, nChanels=4, nFeatures=4,
                       nDepth=3), 0.1),
    (SMP_2D_ver4, dict(max_nVertices=10, nLevels=2, nChanels=6, nFeatures=4,
                       nDepth=3), 0.1),
    (SMP_2D_ver5, dict(max_nVertices=10, nLevels=2, nChanels=6, nFeatures=4,
                       nDepth=3), 0.1),
    # the full-filter variant plateaus higher with plain Momentum
    (Unrestricted_SMP_2D, dict(max_nVertices=10, nLevels=2, nChanels=6,
                               nFeatures=4, nDepth=3), 0.5),
])
def test_steerable_2d_converges(ctor, kwargs, frac, molecules):
    graphs, targets = molecules
    m = ctor(**kwargs)
    l0 = m.getLoss(graphs, targets)
    for _ in range(120):
        _, l1 = m.BatchLearn(graphs, targets, 0.001)
    assert np.isfinite(l1)
    assert l1 < frac * l0, (l0, l1)


def test_unrestricted_ver2_converges_and_grows_channels(molecules):
    """Unrestricted_SMP_2D_ver2.h:102-137: 4-D W[s], channels double."""
    graphs, targets = molecules
    m = Unrestricted_SMP_2D_ver2(max_nVertices=10, nLevels=2, nChanels=4,
                                 nFeatures=4, nDepth=3)
    assert m.params["W"].shape == (4 * 2 ** 2,)
    assert m.params["levels"][0]["Wf"].shape[1:] == (10, 10, 4, 8)
    assert m.params["levels"][1]["Wf"].shape[1:] == (10, 10, 8, 16)
    l0 = m.getLoss(graphs, targets)
    for _ in range(120):
        _, l1 = m.BatchLearn(graphs, targets, 0.001)
    assert np.isfinite(l1)
    assert l1 < 0.5 * l0, (l0, l1)


def test_ver2_channel_growth(molecules):
    """ver2 doubles channels per level (SMP_2D_ver2.h:131)."""
    m = SMP_2D_ver2(max_nVertices=10, nLevels=2, nChanels=4, nFeatures=4,
                    nDepth=2)
    assert m.params["W"].shape == (4 * 2 ** 2,)
    assert m.params["levels"][0]["lambda1"].shape[1:] == (4, 4)
    assert m.params["levels"][1]["lambda1"].shape[1:] == (8, 8)


def test_ver3_drops_scalar_adj(molecules):
    """ver3 = ver2 without the scalar (.) adjacency term (SMP_2D_ver3.h:551):
    no scalar parameter, and the radj entries must not influence the output
    (checked structurally: the param is absent so grads cannot flow to it)."""
    m2 = SMP_2D_ver2(max_nVertices=10, nLevels=1, nChanels=4, nFeatures=4,
                     nDepth=2)
    m3 = SMP_2D_ver3(max_nVertices=10, nLevels=1, nChanels=4, nFeatures=4,
                     nDepth=2)
    assert "scalar" in m2.params["levels"][0]
    assert "scalar" not in m3.params["levels"][0]


def test_ver4_grows_channels_ver5_constant(molecules):
    """ver4 doubles channels (SMP_2D_ver4.h:130-138); ver5 keeps C constant
    via the K (C x 2C) reducer (SMP_2D_ver5.h:135-137)."""
    m4 = SMP_2D_ver4(max_nVertices=10, nLevels=2, nChanels=4, nFeatures=4,
                     nDepth=2)
    assert m4.params["W"].shape == (4 * 2 ** 2,)
    assert m4.params["levels"][0]["lambda1"].shape[1:] == (4,)
    assert m4.params["levels"][1]["lambda1"].shape[1:] == (8,)
    assert m4.params["levels"][1]["b"].shape[1:] == (16,)
    assert "K" not in m4.params["levels"][0]
    m5 = SMP_2D_ver5(max_nVertices=10, nLevels=2, nChanels=4, nFeatures=4,
                     nDepth=2)
    assert m5.params["W"].shape == (4,)
    assert m5.params["levels"][1]["K"].shape == (4, 8)


def test_classification_head(molecules):
    graphs, _ = molecules
    labels = [0, 1, 1, 0]
    m = SMP_2D_classification(10, 1, 6, 4, 3, nClasses=2)
    lb = m.getLoss(graphs, labels)
    for _ in range(40):
        _, la = m.BatchLearn(graphs, labels, 0.01)
    assert la < 0.2 * lb


def test_smp2d_permutation_invariance(rng):
    from graphflow_tpu.utils.datasets import random_graph
    g = random_graph(8, 0.4, seed=11)
    m = SMP_2D(max_nVertices=8, nLevels=2, nChanels=5, nFeatures=4, nDepth=3,
               seed=2)
    f0 = m.Feature(g)
    for _ in range(3):
        perm = rng.permutation(8)
        fp = m.Feature(g.permuted(perm))
        assert np.abs(np.asarray(f0) - np.asarray(fp)).sum() < 1e-3
