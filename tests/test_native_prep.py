"""Parity: native C++ preprocessing vs the pure-NumPy pipeline."""

import numpy as np
import pytest

from graphflow_tpu.core import prep
from graphflow_tpu.runtime import native
from tests.molecules import all_molecules
from graphflow_tpu.utils.datasets import random_graph


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libgraphprep.so unavailable")


def _assert_prepared_equal(a, b):
    np.testing.assert_allclose(a.wl_feat, b.wl_feat, rtol=1e-12)
    np.testing.assert_array_equal(a.sizes, b.sizes)
    np.testing.assert_array_equal(a.nbr, b.nbr)
    np.testing.assert_array_equal(a.pos, b.pos)
    np.testing.assert_allclose(a.radj, b.radj, rtol=1e-12)
    np.testing.assert_allclose(a.smask, b.smask, rtol=1e-12)


@pytest.mark.parametrize("cap,wl_order", [(4, True), (4, False),
                                          (None, True)])
def test_native_matches_python_on_molecules(cap, wl_order):
    graphs, _ = all_molecules()
    for g in graphs:
        kwargs = dict(nLevels=2, max_nVertices=8, max_receptive_field=cap,
                      nDepth=3, has_WL_ordering=wl_order)
        _assert_prepared_equal(
            native.prepare_graph_native(g, **kwargs),
            prep.prepare_graph(g, backend="python", **kwargs))


def test_native_matches_python_on_random_graphs():
    for seed in range(5):
        g = random_graph(12, 0.3, seed=seed)
        kwargs = dict(nLevels=3, max_nVertices=12, max_receptive_field=5,
                      nDepth=2)
        _assert_prepared_equal(
            native.prepare_graph_native(g, **kwargs),
            prep.prepare_graph(g, backend="python", **kwargs))


def test_native_coulomb_and_raw_features():
    g = random_graph(6, 0.5, seed=7)
    g.coulomb = np.abs(np.random.default_rng(1).standard_normal((6, 6))) + 0.1
    kwargs = dict(nLevels=2, max_nVertices=6, max_receptive_field=3,
                  nDepth=0, use_coulomb=True, use_wl_features=False)
    _assert_prepared_equal(
        native.prepare_graph_native(g, **kwargs),
        prep.prepare_graph(g, backend="python", **kwargs))


def test_native_is_not_slower():
    import time
    g = random_graph(60, 0.15, seed=3)
    kwargs = dict(nLevels=3, max_nVertices=60, max_receptive_field=8,
                  nDepth=3)

    def best_of(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_native = best_of(lambda: native.prepare_graph_native(g, **kwargs))
    t_python = best_of(lambda: prep.prepare_graph(g, backend="python", **kwargs))
    # Best-of-3 to be robust to machine load; native is ~3x faster in
    # practice, assert it is at least not dramatically slower.
    assert t_native < t_python * 1.5, (t_native, t_python)
