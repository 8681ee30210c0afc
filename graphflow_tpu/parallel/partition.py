"""Partitioned-graph execution: vertex sharding + boundary halo exchange.

The reference has no distributed backend (SURVEY.md section 2.8); its
"large graph" control is capping receptive fields.  This module is the
TPU-native scale-out path with no reference counterpart: the padded vertex
axis is sharded over a mesh axis, and each message-passing layer exchanges
only the BOUNDARY vertex states (rows some other shard's receptive fields
reference) via an all_gather riding ICI, overlapped by XLA with the local
contraction work.

Pipeline:
  1. host: ``plan_partition`` — from the prepared index arrays, compute per
     shard the exported boundary rows and remap every neighbor reference to
     (local block | gathered boundary buffer) coordinates.  All shapes are
     padded static.
  2. device: ``partitioned_smp2d_forward`` under ``shard_map`` — per level:
     slice boundary rows, ``jax.lax.all_gather`` them over the mesh axis,
     concat with the local block, gather neighbor tensors with the remapped
     indices, run the fused contraction layer on owned vertices only.

Exactness: partitioned forward == single-device forward (tested on an 8-way
CPU mesh), because the exchanged rows are exactly the referenced ones.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from graphflow_tpu.core.prep import PreparedGraph
from graphflow_tpu.models.smp2d import SMP2DConfig, _gather_neighbor_tensors
from graphflow_tpu.ops import activations, contractions


@dataclasses.dataclass
class PartitionPlan:
    """Host-computed static index arrays for a vertex-sharded graph.

    Shapes (S = n_shards, Vs = V/S, H = max boundary rows per shard):
      exp_idx  [S, H]    local row ids each shard exports (pad 0)
      exp_mask [S, H]    1.0 where exp_idx is a real export
      nbr_loc  [L, S, Vs, Pp]  remapped neighbor index into the extended
                         per-shard buffer [own block (Vs) ; gathered (S*H)]
      plus per-shard slices of pos/radj/smask/sizes/wl_feat/vmask.
    """
    n_shards: int
    Vs: int
    H: int
    exp_idx: np.ndarray
    exp_mask: np.ndarray
    nbr_loc: np.ndarray
    pos: np.ndarray       # [L, S, Vs, Pp, Pp]
    radj: np.ndarray      # [L, S, Vs, Pp, Pp]
    smask: np.ndarray     # [L+1, S, Vs, Pp, Pp]
    wl_feat: np.ndarray   # [S, Vs, FD]
    vmask: np.ndarray     # [S, Vs]


def plan_partition(pg: PreparedGraph, n_shards: int) -> PartitionPlan:
    """Plan a contiguous-block vertex partition of one prepared graph."""
    L, V, Pp = pg.nbr.shape[0], pg.nbr.shape[1], pg.nbr.shape[2]
    assert V % n_shards == 0, f"V={V} not divisible by {n_shards}"
    Vs = V // n_shards
    owner = np.arange(V) // Vs

    # Imports per shard: remote vertices referenced by any owned vertex.
    imports: List[set] = [set() for _ in range(n_shards)]
    for l in range(L):
        for v in range(V):
            s = owner[v]
            for i in range(Pp):
                w = int(pg.nbr[l, v, i])
                # slot validity: slot i is real iff i < sizes[l+1, v]
                if i < pg.sizes[l + 1, v] and owner[w] != s:
                    imports[s].add(w)

    exports: List[List[int]] = [[] for _ in range(n_shards)]
    for s in range(n_shards):
        needed_from_s = set()
        for t in range(n_shards):
            if t != s:
                needed_from_s |= {w for w in imports[t] if owner[w] == s}
        exports[s] = sorted(needed_from_s)

    H = max(1, max(len(e) for e in exports))
    exp_idx = np.zeros((n_shards, H), np.int32)
    exp_mask = np.zeros((n_shards, H), np.float32)
    slot = {}  # global vertex id -> position in the gathered buffer
    for s in range(n_shards):
        for j, w in enumerate(exports[s]):
            exp_idx[s, j] = w - s * Vs
            exp_mask[s, j] = 1.0
            slot[w] = s * H + j

    # Remap neighbor ids to extended-buffer coordinates.
    nbr_loc = np.zeros((L, n_shards, Vs, Pp), np.int32)
    for l in range(L):
        for v in range(V):
            s, lv = owner[v], v % Vs
            for i in range(Pp):
                w = int(pg.nbr[l, v, i])
                if i >= pg.sizes[l + 1, v]:
                    nbr_loc[l, s, lv, i] = 0  # masked by pos sentinel anyway
                elif owner[w] == s:
                    nbr_loc[l, s, lv, i] = w - s * Vs
                else:
                    nbr_loc[l, s, lv, i] = Vs + slot[w]

    def shard_axis(x, axis):
        return np.stack(np.split(x, n_shards, axis=axis), axis=axis)

    return PartitionPlan(
        n_shards=n_shards, Vs=Vs, H=H, exp_idx=exp_idx, exp_mask=exp_mask,
        nbr_loc=nbr_loc,
        pos=shard_axis(pg.pos, 1),
        radj=shard_axis(pg.radj, 1),
        smask=shard_axis(pg.smask, 1),
        wl_feat=shard_axis(pg.wl_feat, 0),
        vmask=shard_axis(pg.vmask, 0),
    )


def make_partitioned_forward(cfg: SMP2DConfig, plan: PartitionPlan,
                             mesh: Mesh, axis: str = "graph"):
    """Build a jitted vertex-sharded SMP2D forward over ``mesh[axis]``.

    Returns ``fn(params, shard_inputs) -> (prediction, graph_feature)`` with
    ``shard_inputs`` produced by :func:`shard_inputs`.
    """
    contract_fn, nCon = contractions.risi_contraction_18, 18
    assert cfg.contraction == 18, "partitioned path implements the flagship"
    Vs, H, Pp, C = plan.Vs, plan.H, cfg.P, cfg.nChanels
    S = plan.n_shards

    def per_shard(params, wl_feat, vmask, nbr_loc, pos, radj, smask,
                  exp_idx, exp_mask):
        # Block shapes carry a length-1 shard axis; strip it.
        wl_feat, vmask = wl_feat[0], vmask[0]
        exp_idx, exp_mask = exp_idx[0], exp_mask[0]
        # Level 0 on owned vertices.
        F0 = activations.leaky_relu(wl_feat @ params["H"].T)
        state = jnp.zeros((Vs, Pp, Pp, C), F0.dtype).at[:, 0, 0, :].set(
            F0 * vmask[:, None])

        for l in range(cfg.nLevels):
            Kl, bl = params["levels"][l]["K"], params["levels"][l]["b"]
            # Halo exchange: export boundary rows, all_gather over the mesh.
            boundary = state[exp_idx] * exp_mask[:, None, None, None]
            gathered = jax.lax.all_gather(boundary, axis)     # [S, H, ...]
            ext = jnp.concatenate(
                [state, gathered.reshape(S * H, Pp, Pp, C)], axis=0)
            ext_pad = jnp.pad(ext, ((0, 0), (0, 1), (0, 1), (0, 0)))
            T = _gather_neighbor_tensors(ext_pad, nbr_loc[l, 0], pos[l, 0])
            Y = jax.vmap(contract_fn)(T, radj[l, 0])
            Z = Y.reshape(Vs, Pp * Pp, nCon * C) @ Kl + bl[None, None, :]
            state = activations.leaky_relu(Z).reshape(Vs, Pp, Pp, C)
            state = state * smask[l + 1, 0][:, :, :, None]

        vertex = activations.leaky_relu(state.sum(axis=(1, 2)))
        local_feat = (vertex * vmask[:, None]).sum(axis=0)
        graph_feat = jax.lax.psum(local_feat, axis)
        predict = jnp.dot(graph_feat, params["W"])
        return predict, graph_feat

    specs = dict(
        wl_feat=P(axis), vmask=P(axis),
        nbr_loc=P(None, axis), pos=P(None, axis), radj=P(None, axis),
        smask=P(None, axis), exp_idx=P(axis), exp_mask=P(axis),
    )

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(),) + tuple(specs.values()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def forward(params, inputs):
        return fn(params, *(inputs[k] for k in specs))

    return forward


def shard_inputs(plan: PartitionPlan):
    """Device arrays for :func:`make_partitioned_forward` (keys match the
    in_specs order)."""
    return {
        "wl_feat": jnp.asarray(plan.wl_feat),
        "vmask": jnp.asarray(plan.vmask),
        "nbr_loc": jnp.asarray(plan.nbr_loc),
        "pos": jnp.asarray(plan.pos),
        "radj": jnp.asarray(plan.radj),
        "smask": jnp.asarray(plan.smask),
        "exp_idx": jnp.asarray(plan.exp_idx),
        "exp_mask": jnp.asarray(plan.exp_mask),
    }
