"""Preprocessing pipeline tests, pinned against hand-computed values from the
reference algorithms (SMP_omega.h:358-582)."""

import numpy as np
import pytest

from graphflow_tpu.core import prep
from graphflow_tpu.core.graph import DenseGraph
from tests.molecules import molecule


def test_floyd_warshall_path_graph():
    # 0-1-2-3 path
    g = DenseGraph.from_edges(4, 1, [(0, 1), (1, 2), (2, 3)])
    sp = prep.floyd_warshall(g.adj)
    expected = np.array([
        [0, 1, 2, 3],
        [1, 0, 1, 2],
        [2, 1, 0, 1],
        [3, 2, 1, 0],
    ])
    np.testing.assert_array_equal(sp, expected)


def test_floyd_warshall_disconnected():
    g = DenseGraph.from_edges(3, 1, [(0, 1)])
    sp = prep.floyd_warshall(g.adj)
    assert sp[0, 2] == prep.INF and sp[2, 1] == prep.INF
    assert sp[0, 1] == 1 and sp[2, 2] == 0


def test_wl_features_ch4():
    g = molecule("CH4")  # center C(idx feat 0), 4 H's (feat 1)
    sp = prep.floyd_warshall(g.adj)
    hist = prep.wl_features(sp, g.feature, nDepth=2)
    # vertex 0 (C): d=0 -> its own one-hot C; d=1 -> 4 H's; d=2 -> nothing
    np.testing.assert_allclose(hist[0], [1, 0, 0, 0,  0, 4, 0, 0,  0, 0, 0, 0])
    # vertex 1 (H): d=0 -> H; d=1 -> C; d=2 -> 3 H's
    np.testing.assert_allclose(hist[1], [0, 1, 0, 0,  1, 0, 0, 0,  0, 3, 0, 0])


def test_rank_vertices_exchange_sort_tie_behavior():
    """The reference's exchange sort is non-stable; pin its exact output.

    keys [3a, 3b, 5]: i=0,j=2 swaps 3a/5 -> [5, 3b, 3a]; the tied pair ends
    up REVERSED, which a stable sort would not do.
    """
    hist = np.array([[3.0], [3.0], [5.0]])
    order, rank = prep.rank_vertices(hist)
    np.testing.assert_array_equal(order, [2, 1, 0])
    np.testing.assert_array_equal(rank, [2, 1, 0])


def test_rank_vertices_descending():
    hist = np.array([[1.0, 2.0], [1.0, 3.0], [2.0, 0.0]])
    order, rank = prep.rank_vertices(hist)
    # Descending lexicographic: [2,0] > [1,3] > [1,2]
    np.testing.assert_array_equal(order, [2, 1, 0])


def test_receptive_fields_ch4():
    g = molecule("CH4")
    sp = prep.floyd_warshall(g.adj)
    hist = prep.wl_features(sp, g.feature, nDepth=2)
    _, rank = prep.rank_vertices(hist)
    phi = prep.receptive_fields(sp, rank, nLevels=2, max_receptive_field=None,
                                has_WL_ordering=False)
    # level 0: singletons
    assert phi[0] == [[0], [1], [2], [3], [4]]
    # level 1, vertex 0: closed neighborhood = everything (star graph),
    # insertion order by ascending u
    assert phi[1][0] == [0, 1, 2, 3, 4]
    # level 1, vertex 1: {0, 1} via u=0 then u=1
    assert phi[1][1] == [0, 1]
    # level 2, vertex 1: union over u in {0,1} of phi[1][u] -> all vertices
    assert phi[2][1] == [0, 1, 2, 3, 4]


def test_receptive_field_cap_drops_whole_distance_group():
    """limit_receptive_field pops the entire farthest distance group, possibly
    undershooting the cap (SMP_omega.h:492-502)."""
    g = molecule("CH4")
    sp = prep.floyd_warshall(g.adj)
    hist = prep.wl_features(sp, g.feature, nDepth=2)
    _, rank = prep.rank_vertices(hist)
    phi = prep.receptive_fields(sp, rank, nLevels=1, max_receptive_field=3,
                                has_WL_ordering=False)
    # vertex 0's field would be all 5; distances (0,1,1,1,1): the whole
    # distance-1 group is dropped -> only [0] remains
    assert phi[1][0] == [0]


def test_receptive_field_cap_respects_rank_order():
    # path 0-1-2, plus leaf 3 on vertex 1: phi_1(1) = {0,1,2,3}, cap 3 ->
    # drops the whole distance-1 group {0,2,3}, keeping [1]
    g = DenseGraph.from_edges(4, 2, [(0, 1), (1, 2), (1, 3)],
                              [[1, 0], [0, 1], [1, 0], [1, 0]])
    sp = prep.floyd_warshall(g.adj)
    hist = prep.wl_features(sp, g.feature, nDepth=1)
    _, rank = prep.rank_vertices(hist)
    phi = prep.receptive_fields(sp, rank, nLevels=1, max_receptive_field=3,
                                has_WL_ordering=False)
    assert phi[1][1] == [1]
    # vertex 0: {0,1} u {1,0,2,3} -> [0,1,2,3]... wait insertion: u in {0,1}
    # closed nbhd of 0 is {0,1}; phi_0 unions -> [0,1]; size 2 <= 3 kept
    assert phi[1][0] == [0, 1]


def test_prepare_graph_shapes_and_masks():
    g = molecule("H2O")
    pg = prep.prepare_graph(g, nLevels=2, max_nVertices=6,
                            max_receptive_field=4, nDepth=3)
    assert pg.wl_feat.shape == (6, 4 * 4)
    assert pg.nbr.shape == (2, 6, 4)
    assert pg.pos.shape == (2, 6, 4, 4)
    assert pg.radj.shape == (2, 6, 4, 4)
    assert pg.vmask.tolist() == [1, 1, 1, 0, 0, 0]
    # H2O fully connected through O: phi_1(0) = all 3 vertices
    assert pg.sizes[1, 0] == 3
    # padding vertices have empty fields
    assert pg.sizes[1, 5] == 0
    # reduced adjacency diagonal is 1 for real entries
    s = pg.sizes[1, 0]
    np.testing.assert_allclose(np.diag(pg.radj[0, 0])[:s], 1.0)
    # pos sentinel outside valid region
    assert (pg.pos[0, 5] == 4).all()


def test_prepare_graph_pos_points_into_parent_fields():
    g = molecule("C2H4")
    L, P = 2, 4
    pg = prep.prepare_graph(g, nLevels=L, max_nVertices=6,
                            max_receptive_field=P, nDepth=2)
    sp = prep.floyd_warshall(g.adj)
    hist = prep.wl_features(sp, g.feature, 2)
    _, rank = prep.rank_vertices(hist)
    phi = prep.receptive_fields(sp, rank, L, P)
    for l in range(1, L + 1):
        for v in range(g.nVertices):
            phiv = phi[l][v]
            for i, w in enumerate(phiv):
                for p, u in enumerate(phiv):
                    q = pg.pos[l - 1, v, i, p]
                    if q < P:
                        assert phi[l - 1][w][q] == u
                    else:
                        assert u not in phi[l - 1][w]


def test_norm_adj_kipf_welling():
    g = DenseGraph.from_edges(2, 1, [(0, 1)])
    na = g.norm_adj()
    # A+I = ones(2,2); D = 2I; D^-1/2 (A+I) D^-1/2 = ones/2
    np.testing.assert_allclose(na, np.full((2, 2), 0.5))


def test_permuted_graph_roundtrip():
    g = molecule("C2H4")
    perm = np.array([2, 0, 5, 1, 3, 4])
    gp = g.permuted(perm)
    # new label of old vertex v is perm[v]; check edge (0,1) -> (2,0)
    assert gp.adj[2, 0] == 1 and gp.adj[0, 2] == 1
    np.testing.assert_allclose(gp.feature[perm[0]], g.feature[0])
