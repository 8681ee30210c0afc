"""The reference's four toy molecules (tests/test_SMP_omega.cpp:39-146).

CH4 / NH3 / H2O / C2H4 with one-hot C/H/N/O features; regression target =
number of vertices.  Shared fixture for the model convergence tests.
"""

import numpy as np

from graphflow_tpu.core.graph import DenseGraph

N_FEATURES = 4
_LABEL = {"C": 0, "H": 1, "N": 2, "O": 3}

_MOLS = {
    "CH4": (5, [(0, 1), (0, 2), (0, 3), (0, 4)], "CHHHH"),
    "NH3": (4, [(0, 1), (0, 2), (0, 3)], "NHHH"),
    "H2O": (3, [(0, 1), (0, 2)], "OHH"),
    "C2H4": (6, [(0, 1), (0, 2), (0, 3), (3, 4), (3, 5)], "CHHCHH"),
}


def molecule(name: str) -> DenseGraph:
    n, edges, labels = _MOLS[name]
    feats = np.zeros((n, N_FEATURES))
    for v, lab in enumerate(labels):
        feats[v, _LABEL[lab]] = 1.0
    return DenseGraph.from_edges(n, N_FEATURES, edges, feats)


def all_molecules():
    graphs = [molecule(n) for n in ("CH4", "NH3", "H2O", "C2H4")]
    targets = [float(g.nVertices) for g in graphs]
    return graphs, targets
