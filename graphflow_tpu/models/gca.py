"""Graph Convolution Autoencoder (GCA_1D) and covariant GCN hybrids (CGCN).

GCA_1D (``GCA_1D.h``): a GCN_1D-style encoder whose head is the Gram matrix
of the top-level vertex embeddings, trained to reconstruct the adjacency
matrix with SquaredLoss (``GCA_1D.h:242-255``).  Momentum.

CGCN_1D/2D (``CGCN_1D.h`` / ``CGCN_2D.h``): "covariant" GCN — vertex states
live in R^{max_nVertices}:
  level 0:  rep_v = e_v * <wl_feat_v, H>      (VertexRepresentation)
  level l:  n_v = RisiLayer{1,2}D({rep_{l-1,u} : adj(u,v) > 0})  (open 1-hop)
            rep_v = LeakyReLU(mask_{<=l}(F_l @ n_v))   (CGCN_1D.h:220-234)
  head:     predict = sum of all components of sum_v rep_v;  SquaredLoss
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphflow_tpu.core import prep
from graphflow_tpu.core.graph import DenseGraph
from graphflow_tpu.models.base import GraphModel
from graphflow_tpu.ops import activations, losses
from graphflow_tpu.optim.utils import uniform_init


class GCA_1D(GraphModel):
    """Graph autoencoder: Gram(hiddens) ~ adjacency."""

    def __init__(self, nLevels, max_nVertices, nFeatures, nHiddens, nDepth,
                 max_Radius, momentum_param=0.9, seed=0):
        super().__init__(optimizer="momentum", gamma=momentum_param)
        self.nLevels, self.max_nVertices = nLevels, max_nVertices
        self.nFeatures, self.nHiddens = nFeatures, nHiddens
        self.nDepth, self.max_Radius = nDepth, max_Radius
        feat_dim = nFeatures * (nDepth + 1)
        keys = iter(jax.random.split(jax.random.PRNGKey(seed),
                                     2 * (nLevels + 1)))
        self.params = {"levels": []}
        for l in range(nLevels + 1):
            lev = {"W1": uniform_init(next(keys), (nHiddens, feat_dim),
                                      jnp.float32)}
            if l > 0:
                lev["W2"] = uniform_init(next(keys), (nHiddens, nHiddens),
                                         jnp.float32)
            self.params["levels"].append(lev)
        order = []
        for l in range(nLevels + 1):
            order.append(f"levels/{l}/W1")
            if l > 0:
                order.append(f"levels/{l}/W2")
        self.param_order = order
        self._finish_init()

    def _prepare(self, graph: DenseGraph):
        return prep.prepare_graph(graph, self.nLevels, self.max_nVertices,
                                  max_receptive_field=1, nDepth=self.nDepth)

    def _encode(self, params, g):
        vmask, sp, feat = g["vmask"], g["sp"], g["wl_feat"]
        hidden = activations.softmax(
            feat @ params["levels"][0]["W1"].T) * vmask[:, None]
        for l in range(1, self.nLevels + 1):
            radius = min(l, self.max_Radius)
            M = ((sp <= radius).astype(vmask.dtype)
                 * vmask[:, None] * vmask[None, :])
            part1 = feat @ params["levels"][l]["W1"].T
            part2 = (M @ hidden) @ params["levels"][l]["W2"].T
            hidden = activations.softmax(part1 + part2) * vmask[:, None]
        return hidden

    def _forward(self, params, g):
        hidden = self._encode(params, g)
        gram = hidden @ hidden.T                       # LinearGram head
        return gram, hidden

    def _loss(self, params, g, target):
        # target is unused: the reconstruction target is the adjacency itself
        gram, _ = self._forward(params, g)
        vm2 = g["vmask"][:, None] * g["vmask"][None, :]
        return losses.squared_loss(gram * vm2, g["adj"] * vm2)

    # Autoencoder API: no regression target.
    def getLoss(self, graphs, targets=None):
        targets = [0.0] * len(graphs)
        return super().getLoss(graphs, targets)

    def BatchLearn(self, graphs, targets=None, learning_rate=1e-3, **kw):
        if targets is None or isinstance(targets, float):
            learning_rate = targets if isinstance(targets, float) else learning_rate
            targets = [0.0] * len(graphs)
        return super().BatchLearn(graphs, targets, learning_rate, **kw)

    def Reconstruct(self, graph: DenseGraph) -> np.ndarray:
        """Predicted adjacency (Gram matrix of vertex embeddings)."""
        batch = self._stack([graph])
        gram, _ = self._jit_forward(self.params, batch)
        n = graph.nVertices
        return np.asarray(gram)[0][:n, :n]


class CGCN(GraphModel):
    """CGCN_1D / CGCN_2D."""

    def __init__(self, nLevels, max_nVertices, nFeatures, nDepth,
                 order=1, momentum_param=0.9, seed=0):
        super().__init__(optimizer="momentum", gamma=momentum_param)
        self.nLevels, self.max_nVertices = nLevels, max_nVertices
        self.nFeatures, self.nDepth, self.order = nFeatures, nDepth, order
        feat_dim = nFeatures * (nDepth + 1)
        keys = iter(jax.random.split(jax.random.PRNGKey(seed), nLevels + 1))
        self.params = {
            "H": uniform_init(next(keys), (feat_dim,), jnp.float32),
            "levels": [
                {"F": uniform_init(next(keys),
                                   (max_nVertices, max_nVertices), jnp.float32)}
                for _ in range(nLevels)],
        }
        self.param_order = (["H"]
                            + [f"levels/{l}/F" for l in range(nLevels)])
        self._finish_init()

    def _prepare(self, graph: DenseGraph):
        return prep.prepare_graph(graph, self.nLevels, self.max_nVertices,
                                  max_receptive_field=1, nDepth=self.nDepth)

    def _forward(self, params, g):
        V = self.max_nVertices
        vmask, sp, feat = g["vmask"], g["sp"], g["wl_feat"]
        # Level 0: rep_v = e_v * <feat_v, H>  (VertexRepresentation.h)
        scalar = feat @ params["H"]                      # [V]
        rep = jnp.diag(scalar) * vmask[:, None]          # [V, V]
        A = g["adj"] * vmask[:, None] * vmask[None, :]   # open 1-hop
        for l in range(1, self.nLevels + 1):
            if self.order == 1:
                n = A @ rep                               # RisiLayer1D
            else:
                s = rep.sum(axis=1)
                n = (A @ s)[:, None] * (A @ rep) - A @ (s[:, None] * rep)
            lin = n @ params["levels"][l - 1]["F"].T      # F @ n_v per vertex
            mask_l = ((sp.T <= l).astype(vmask.dtype)
                      * vmask[:, None] * vmask[None, :])  # mask[v, u]: sp(u,v)<=l
            rep = activations.leaky_relu(jnp.where(mask_l > 0, lin, 0.0))
        summed = rep.sum(axis=0)
        predict = summed.sum()
        return predict, summed

    def _loss(self, params, g, target):
        pred, _ = self._forward(params, g)
        return losses.squared_loss(pred, target)


def CGCN_1D(nLevels, max_nVertices, nFeatures, nDepth, momentum_param=0.9,
            seed=0):
    """``CGCN_1D.h``."""
    return CGCN(nLevels, max_nVertices, nFeatures, nDepth, 1,
                momentum_param, seed)


def CGCN_2D(nLevels, max_nVertices, nFeatures, nDepth, momentum_param=0.9,
            seed=0):
    """``CGCN_2D.h``: RisiLayer2D aggregation."""
    return CGCN(nLevels, max_nVertices, nFeatures, nDepth, 2,
                momentum_param, seed)
