"""LCNN — PATCHY-SAN style graph CNN.

Reference ``LCNN.h``: WL-rank the (padded) graph, build a vertex sequence of
nNeighbors nearest vertices per rank position (by hop distance then rank,
``LCNN.h:294-320``), gather WL-feature rows by the sequence, two
stride-nNeighbors Conv1D layers with LeakyReLU, a dense layer, and a linear
regression head.  Momentum.

Faithful quirk: the second ShuffleMatrix gathers conv-1 output rows by
VERTEX id while those rows are ordered by RANK position (``LCNN.h:69-70``) —
reproduced as-is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphflow_tpu.core import prep
from graphflow_tpu.core.graph import DenseGraph
from graphflow_tpu.models.base import GraphModel
from graphflow_tpu.ops import activations, conv, losses
from graphflow_tpu.optim.utils import uniform_init


def find_sequence(sp, order, n_real, nNeighbors, nVertices):
    """``LCNN.h:294-320``: per rank position i, up to nNeighbors real
    vertices by (hop distance from order[i], rank), sentinel-padded."""
    seq = np.full((nVertices * nNeighbors,), n_real, dtype=np.int64)
    for i in range(nVertices):
        j = 0
        for d in range(nVertices):
            for v in range(nVertices):
                if sp[order[i], order[v]] == d and order[v] < n_real:
                    seq[nNeighbors * i + j] = order[v]
                    j += 1
                    if j == nNeighbors:
                        break
            if j == nNeighbors:
                break
    return seq


class LCNN(GraphModel):
    def __init__(self, nVertices, nFeatures, nNeighbors, nDepth, nChanels1,
                 nChanels2, nDense, momentum_param=0.9, seed=0):
        super().__init__(optimizer="momentum", gamma=momentum_param)
        self.nVertices, self.nFeatures = nVertices, nFeatures
        self.nNeighbors, self.nDepth = nNeighbors, nDepth
        self.nChanels1, self.nChanels2 = nChanels1, nChanels2
        self.nDense = nDense
        feat_dim = nFeatures * (nDepth + 1)
        keys = iter(jax.random.split(jax.random.PRNGKey(seed), 6))
        self.params = {
            "firstFilter": uniform_init(next(keys),
                                        (nNeighbors, feat_dim, nChanels1),
                                        jnp.float32),
            "firstBias": uniform_init(next(keys), (nChanels1,), jnp.float32),
            "secondFilter": uniform_init(next(keys),
                                         (nNeighbors, nChanels1, nChanels2),
                                         jnp.float32),
            "secondBias": uniform_init(next(keys), (nChanels2,), jnp.float32),
            "denseWeight": uniform_init(next(keys),
                                        (nDense, nVertices * nChanels2),
                                        jnp.float32),
            "W": uniform_init(next(keys), (nDense,), jnp.float32),
        }
        self.param_order = ["firstFilter", "firstBias", "secondFilter",
                            "secondBias", "denseWeight", "W"]
        self._finish_init()

    def _prepare(self, graph: DenseGraph):
        pg = prep.prepare_graph(graph, 1, self.nVertices,
                                max_receptive_field=1, nDepth=self.nDepth)
        # WL rank on the padded graph (dummy zero-feature vertices included,
        # as the reference does: LCNN.h floyd_warshall over nVertices).
        n = graph.nVertices
        sp_full = np.asarray(pg.sp)
        hist = np.zeros((self.nVertices,
                         self.nFeatures * (self.nDepth + 1)))
        hist[:] = np.asarray(pg.wl_feat)
        order, _ = prep.rank_vertices(hist)
        seq = find_sequence(sp_full, order, n, self.nNeighbors,
                            self.nVertices)
        pg.seq = seq  # attach (PreparedGraph is a plain dataclass)
        return pg

    def _stack(self, graphs, targets=None):
        batch = super()._stack(graphs, targets)
        seqs = np.stack([self.prepare(g).seq for g in graphs])
        batch["seq"] = jnp.asarray(seqs, jnp.int32)
        return batch

    def _forward(self, params, g):
        V, K = self.nVertices, self.nNeighbors
        seq = g["seq"]
        # Sentinel row: gathering index n_real (or V) must read zeros.
        wl = jnp.pad(g["wl_feat"], ((0, 1), (0, 0)))
        x1 = wl[seq]                                        # [(V K), FD]
        c1 = conv.conv1d(x1, params["firstFilter"],
                         params["firstBias"], stride=K)  # [V, C1]
        r1 = activations.leaky_relu(c1)
        # Faithful quirk: gather conv-1 rows by vertex id from the sequence.
        r1p = jnp.pad(r1, ((0, 1), (0, 0)))
        x2 = r1p[seq]                                       # [(V K), C1]
        c2 = conv.conv1d(x2, params["secondFilter"],
                         params["secondBias"], stride=K)  # [V, C2]
        r2 = activations.leaky_relu(c2)
        # Dense layer reads the raw conv output (LCNN.h:78: denseLayer takes
        # secondConv, not secondReLU) — faithful.
        dense = params["denseWeight"] @ c2.reshape(-1)
        return jnp.dot(dense, params["W"]), dense

    def _loss(self, params, g, target):
        pred, _ = self._forward(params, g)
        return losses.squared_loss(pred, target)
