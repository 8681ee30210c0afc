"""Gated Graph Sequence Networks (GRU-GCN family).

Reference ``GRU_GCN_1D.h`` / ``_2D`` / ``_3D``: a GRU cell over message-
passing levels, with the neighbor aggregate as the cell input:

  level 0:  h_v = Softmax(W @ wl_feat_v)
  level l:  a_v = RisiLayer{1,2,3}D({h_{l-1,u} : sp(v,u) <= min(l, R)})
            (3rd order adds KMax pooling to nHiddens, GRU_GCN_3D.h:123-124)
            z = sigmoid(W_z a + U_z h);  r = sigmoid(W_r a + U_r h)
            htilde = tanh(W_h a + U_h (r o h))
            h = (1 - z) o h + z o htilde            (GRU_GCN_1D.h:143-147)
  head:     vertex = sigmoid(W_g h_L) o tanh(U_g h_L)   (output gate)
            graph = tanh(sum_v vertex);  predict = <U, graph>; SquaredLoss

Parameters are SHARED across levels (a true recurrent cell).  Momentum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphflow_tpu.core import prep
from graphflow_tpu.core.graph import DenseGraph
from graphflow_tpu.models.base import GraphModel
from graphflow_tpu.models.gcn import _aggregate
from graphflow_tpu.ops import activations, losses
from graphflow_tpu.optim.utils import uniform_init


def gru_gcn_states(params, g, nLevels, max_Radius, order, nHiddens):
    """Per-level hidden states + output-gated vertex features + graph
    feature (``GRU_GCN_1D.h`` ``level[l]->hidden`` / ``vertex_feature`` /
    ``graph_feature`` internals, for binary-parity tests and dumps).
    Returns (list of [V, H] per level, vertex [V, H], graph_feat [H])."""
    vmask, sp = g["vmask"], g["sp"]
    h = activations.softmax(g["wl_feat"] @ params["W"].T) * vmask[:, None]
    states = [h]
    for l in range(1, nLevels + 1):
        radius = min(l, max_Radius)
        M = ((sp <= radius).astype(vmask.dtype)
             * vmask[:, None] * vmask[None, :])
        a = _aggregate(M, h, order, nHiddens)
        z = jax.nn.sigmoid(a @ params["W_z"].T + h @ params["U_z"].T)
        r = jax.nn.sigmoid(a @ params["W_r"].T + h @ params["U_r"].T)
        ht = jnp.tanh(a @ params["W_h"].T + (r * h) @ params["U_h"].T)
        h = ((1.0 - z) * h + z * ht) * vmask[:, None]
        states.append(h)
    vertex = (jax.nn.sigmoid(h @ params["W_g"].T)
              * jnp.tanh(h @ params["U_g"].T)) * vmask[:, None]
    graph_feat = jnp.tanh(vertex.sum(axis=0))
    return states, vertex, graph_feat


class GRU_GCN(GraphModel):
    def __init__(self, nLevels, max_nVertices, nFeatures, nHiddens, nDepth,
                 max_Radius, order=1, momentum_param=0.9, seed=0):
        super().__init__(optimizer="momentum", gamma=momentum_param)
        self.nLevels, self.max_nVertices = nLevels, max_nVertices
        self.nFeatures, self.nHiddens = nFeatures, nHiddens
        self.nDepth, self.max_Radius, self.order = nDepth, max_Radius, order
        H = nHiddens
        feat_dim = nFeatures * (nDepth + 1)
        names = [("W", (H, feat_dim)), ("W_z", (H, H)), ("U_z", (H, H)),
                 ("W_r", (H, H)), ("U_r", (H, H)), ("W_h", (H, H)),
                 ("U_h", (H, H)), ("W_g", (H, H)), ("U_g", (H, H)),
                 ("U", (H,))]
        keys = jax.random.split(jax.random.PRNGKey(seed), len(names))
        self.params = {n: uniform_init(k, s, jnp.float32)
                       for (n, s), k in zip(names, keys)}
        # Registration order = GRU_GCN_1D.h:180-189.
        self.param_order = [n for n, _ in names]
        self._finish_init()

    def _prepare(self, graph: DenseGraph):
        return prep.prepare_graph(graph, self.nLevels, self.max_nVertices,
                                  max_receptive_field=1, nDepth=self.nDepth)

    def _forward(self, params, g):
        _, _, graph_feat = gru_gcn_states(params, g, self.nLevels,
                                          self.max_Radius, self.order,
                                          self.nHiddens)
        return jnp.dot(graph_feat, params["U"]), graph_feat

    def _loss(self, params, g, target):
        pred, _ = self._forward(params, g)
        return losses.squared_loss(pred, target)


def GRU_GCN_1D(nLevels, max_nVertices, nFeatures, nHiddens, nDepth,
               max_Radius, momentum_param=0.9, seed=0):
    """``GRU_GCN_1D.h``."""
    return GRU_GCN(nLevels, max_nVertices, nFeatures, nHiddens, nDepth,
                   max_Radius, 1, momentum_param, seed)


def GRU_GCN_2D(nLevels, max_nVertices, nFeatures, nHiddens, nDepth,
               max_Radius, momentum_param=0.9, seed=0):
    """``GRU_GCN_2D.h``: RisiLayer2D aggregation."""
    return GRU_GCN(nLevels, max_nVertices, nFeatures, nHiddens, nDepth,
                   max_Radius, 2, momentum_param, seed)


def GRU_GCN_3D(nLevels, max_nVertices, nFeatures, nHiddens, nDepth,
               max_Radius, momentum_param=0.9, seed=0):
    """``GRU_GCN_3D.h``: RisiLayer3D + KMax aggregation."""
    return GRU_GCN(nLevels, max_nVertices, nFeatures, nHiddens, nDepth,
                   max_Radius, 3, momentum_param, seed)
