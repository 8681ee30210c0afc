"""Partitioned-graph execution: vertex sharding + targeted halo exchange.

The reference has no distributed backend (SURVEY.md section 2.8); its
"large graph" control is capping receptive fields.  This module is the
TPU-native scale-out path with no reference counterpart: the padded vertex
axis is sharded over a mesh axis, and each message-passing level exchanges
only the boundary vertex states some *specific* other shard references.

Halo design (round 3 — replaces the broadcast all_gather):

  * The plan computes, per level, the exact per-PAIR export sets
    E_l[s][t] = rows shard s owns that shard t's receptive fields
    reference.  At level l each shard sends, for every ring shift
    d = 1..S-1, the buffer E_l[s][(s+d) % S] via one ``jax.lax.ppermute``
    — so a shard receives exactly its own imports (sum_d H_d rows) rather
    than every shard's full export union (S*H rows with all_gather, an
    O(S) overfetch).  ``PartitionPlan.rows_targeted`` / ``rows_allgather``
    record the per-shard per-level exchanged-row counts for both schemes.

  * Overlap: owned vertices are reordered INTERIOR-FIRST (a vertex is
    interior when every neighbor it references at every level is owned by
    the same shard).  The level step issues the ppermutes, then runs the
    gather + contraction for the interior block — which depends only on
    local state — and only afterwards touches the received buffers for the
    boundary block.  On a real multi-chip ICI mesh XLA's latency-hiding
    scheduler can therefore run the halo exchange concurrently with the
    interior contraction; exactness is unaffected (the blocks partition
    the owned vertices).

  * A data x graph 2-D mesh trains batches of partitioned graphs:
    ``make_partitioned_train_step`` computes per-shard partial losses and
    gradients, psums them over BOTH mesh axes and applies the optimizer,
    all in one jitted SPMD program — semantics match the reference DP loop
    (``SMP_omega.h:750-792``: replicate, per-example grads, serial sum,
    one optimizer step).

Exactness: the head is computed from per-shard partial predictions
(``pred = psum(<local_feat, W>)``), so every parameter is used only on
shard-local paths and the psum of per-shard gradients is the exact batch
gradient.  Partitioned forward == single-device forward is tested on an
8-way CPU mesh (tests/test_partition.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from graphflow_tpu.core.prep import PreparedGraph
from graphflow_tpu.models.smp2d import SMP2DConfig, _gather_neighbor_tensors
from graphflow_tpu.ops import activations, contractions, losses


@dataclasses.dataclass
class PartitionPlan:
    """Host-computed static index arrays for a batch of vertex-sharded graphs.

    Shapes (B = batch, S = n_shards, Vs = V/S, L = levels, Pp = field pad):
      send_idx   list over shifts d=1..S-1 of [B, L, S, H_d] int32 — local
                 row ids shard s sends to shard (s+d) % S at level l (pad 0)
      send_mask  matching [B, L, S, H_d] float32 validity
      nbr_loc    [B, L, S, Vs, Pp] neighbor index into the extended buffer
                 [own block (Vs) ; recv_1 (H_1) ; ... ; recv_{S-1}]
      n_interior common interior-prefix length Vi: rows [0, Vi) of every
                 shard reference only local rows at every level
      exp_idx/exp_mask  [B, S, H] legacy union-export plan (all_gather mode)
      plus per-shard slices of pos/radj/smask/wl_feat/vmask (interior-first
      vertex order within each shard).
    """
    n_shards: int
    Vs: int
    H: int
    n_interior: int
    shift_sizes: tuple
    send_idx: List[np.ndarray]
    send_mask: List[np.ndarray]
    exp_idx: np.ndarray
    exp_mask: np.ndarray
    nbr_loc: np.ndarray
    nbr_ag: np.ndarray    # [B, L, S, Vs, Pp] remap for the all_gather layout
    pos: np.ndarray       # [B, L, S, Vs, Pp, Pp]
    radj: np.ndarray      # [B, L, S, Vs, Pp, Pp]
    smask: np.ndarray     # [B, L+1, S, Vs, Pp, Pp]
    wl_feat: np.ndarray   # [B, S, Vs, FD]
    vmask: np.ndarray     # [B, S, Vs]
    rows_targeted: int    # per-shard per-level received rows (ppermute)
    rows_allgather: int   # per-shard per-level received rows (all_gather)
    # Per-level comm accounting over the REAL (unpadded) export sets:
    # comm_per_level[l] = {"targeted_max", "targeted_mean", "allgather"}
    # rows received per shard at level l (VERDICT r3 item 7).
    comm_per_level: Optional[List[dict]] = None

    @property
    def batch(self) -> int:
        return self.wl_feat.shape[0]

    def comm_table(self, row_bytes: Optional[int] = None) -> str:
        """Human-readable per-level halo-exchange volume table.

        ``row_bytes``: bytes of one exchanged vertex-state row (e.g.
        (P+1)^2 * C * itemsize for the padded SMP2D state); when given,
        volumes are also printed in KiB.
        """
        lines = ["level  targeted_max  targeted_mean  allgather   (rows "
                 "received per shard per level)"]
        for l, row in enumerate(self.comm_per_level or []):
            extra = ""
            if row_bytes:
                extra = (f"   [{row['targeted_max'] * row_bytes / 1024:.0f}"
                         f" KiB vs {row['allgather'] * row_bytes / 1024:.0f}"
                         f" KiB]")
            lines.append(f"{l:5d}  {row['targeted_max']:12d}  "
                         f"{row['targeted_mean']:13.1f}  "
                         f"{row['allgather']:9d}{extra}")
        return "\n".join(lines)


def _pad_prepared(pg: PreparedGraph, Vpad: int) -> PreparedGraph:
    """Extend a PreparedGraph's vertex axis to ``Vpad`` with inert padding
    vertices (vmask 0, sizes 0, pos = sentinel, zero adjacency/masks) so a
    non-divisible V still partitions into equal shards."""
    import dataclasses as _dc

    V = pg.nbr.shape[1]
    if Vpad == V:
        return pg
    e = Vpad - V
    L, Pp = pg.nbr.shape[0], pg.nbr.shape[2]
    return _dc.replace(
        pg,
        wl_feat=np.concatenate(
            [pg.wl_feat, np.zeros((e,) + pg.wl_feat.shape[1:],
                                  pg.wl_feat.dtype)], axis=0),
        vmask=np.concatenate([pg.vmask, np.zeros(e, pg.vmask.dtype)]),
        sizes=np.concatenate(
            [pg.sizes, np.zeros((L + 1, e), pg.sizes.dtype)], axis=1),
        nbr=np.concatenate(
            [pg.nbr, np.zeros((L, e, Pp), pg.nbr.dtype)], axis=1),
        pos=np.concatenate(
            [pg.pos, np.full((L, e, Pp, Pp), Pp, pg.pos.dtype)], axis=1),
        radj=np.concatenate(
            [pg.radj, np.zeros((L, e, Pp, Pp), pg.radj.dtype)], axis=1),
        smask=np.concatenate(
            [pg.smask, np.zeros((L + 1, e, Pp, Pp), pg.smask.dtype)],
            axis=1),
    )


def plan_partition_batch(pgs: Sequence[PreparedGraph],
                         n_shards: int) -> PartitionPlan:
    """Plan contiguous-block vertex partitions for a batch of prepared
    graphs with common static shapes (shift sizes and the interior prefix
    are maxed/minned over the batch).  A vertex count not divisible by
    ``n_shards`` is padded up with inert vertices (the last shard carries
    the padding; masks keep them exact zeros)."""
    L, V, Pp = pgs[0].nbr.shape[0], pgs[0].nbr.shape[1], pgs[0].nbr.shape[2]
    Vpad = -(-V // n_shards) * n_shards
    if Vpad != V:
        pgs = [_pad_prepared(pg, Vpad) for pg in pgs]
        V = Vpad
    S, Vs, B = n_shards, V // n_shards, len(pgs)
    owner = np.arange(V) // Vs

    # ---- pass 1: per-graph export sets, interior flags, local orders ----
    per_graph = []
    for pg in pgs:
        assert pg.nbr.shape == (L, V, Pp)
        # E[l][s][t]: rows owned by s that t references at level l.
        E = [[[[] for _ in range(S)] for _ in range(S)] for _ in range(L)]
        Eset = [[[set() for _ in range(S)] for _ in range(S)]
                for _ in range(L)]
        interior = np.ones(V, bool)
        for l in range(L):
            for v in range(V):
                t = owner[v]
                for i in range(int(pg.sizes[l + 1, v])):
                    w = int(pg.nbr[l, v, i])
                    s = owner[w]
                    if s != t:
                        interior[v] = False
                        if w not in Eset[l][s][t]:
                            Eset[l][s][t].add(w)
                            E[l][s][t].append(w)
        for l in range(L):
            for s in range(S):
                for t in range(S):
                    E[l][s][t].sort()
        # interior-first vertex order within each shard
        loc = np.zeros(V, np.int64)
        n_int = np.zeros(S, np.int64)
        for s in range(S):
            block = np.arange(s * Vs, (s + 1) * Vs)
            ordered = ([v for v in block if interior[v]]
                       + [v for v in block if not interior[v]])
            n_int[s] = int(interior[block].sum())
            for j, v in enumerate(ordered):
                loc[v] = j
        per_graph.append((E, loc, n_int))

    # ---- common static shapes ----
    shift_sizes = []
    for d in range(1, S):
        Hd = 0
        for (E, _, _) in per_graph:
            for l in range(L):
                for s in range(S):
                    Hd = max(Hd, len(E[l][s][(s + d) % S]))
        shift_sizes.append(Hd)
    shift_sizes = tuple(shift_sizes)
    Vi = min(int(ni.min()) for (_, _, ni) in per_graph)
    # legacy union exports (all_gather mode + accounting)
    H = 1
    for (E, _, _) in per_graph:
        for s in range(S):
            union = set()
            for l in range(L):
                for t in range(S):
                    union |= set(E[l][s][t])
            H = max(H, len(union))

    # recv-buffer offset of each shift-d block: sum of earlier shift sizes
    off = [0] * S
    acc = 0
    for d in range(1, S):
        off[d] = acc
        acc += shift_sizes[d - 1]

    send_idx = [np.zeros((B, L, S, max(Hd, 1)), np.int32)
                for Hd in shift_sizes]
    send_mask = [np.zeros((B, L, S, max(Hd, 1)), np.float32)
                 for Hd in shift_sizes]
    exp_idx = np.zeros((B, S, H), np.int32)
    exp_mask = np.zeros((B, S, H), np.float32)
    nbr_loc = np.zeros((B, L, S, Vs, Pp), np.int32)
    nbr_ag = np.zeros((B, L, S, Vs, Pp), np.int32)
    pos = np.zeros((B, L, S, Vs, Pp, Pp), pgs[0].pos.dtype)
    radj = np.zeros((B, L, S, Vs, Pp, Pp), pgs[0].radj.dtype)
    smask = np.zeros((B, L + 1, S, Vs, Pp, Pp), pgs[0].smask.dtype)
    wl_feat = np.zeros((B, S, Vs) + pgs[0].wl_feat.shape[1:],
                       pgs[0].wl_feat.dtype)
    vmask = np.zeros((B, S, Vs), pgs[0].vmask.dtype)

    for b, (pg, (E, loc, _)) in enumerate(zip(pgs, per_graph)):
        # per-(level, pair) slot of each import in the shift-d recv block
        slot = [dict() for _ in range(L)]  # (dst_shard, w) -> ext index
        for l in range(L):
            for s in range(S):
                for d in range(1, S):
                    t = (s + d) % S
                    for j, w in enumerate(E[l][s][t]):
                        send_idx[d - 1][b, l, s, j] = loc[w]
                        send_mask[d - 1][b, l, s, j] = 1.0
                        # receiver t sees shift-d rows at off[d] + j
                        slot[l][(t, w)] = Vs + off[d] + j
        # legacy union export layout
        agslot = {}
        for s in range(S):
            union = set()
            for l in range(L):
                for t in range(S):
                    union |= set(E[l][s][t])
            for j, w in enumerate(sorted(union)):
                exp_idx[b, s, j] = loc[w]
                exp_mask[b, s, j] = 1.0
                agslot[w] = s * H + j
        # remapped neighbor ids + reordered per-vertex arrays
        for l in range(L):
            for v in range(V):
                s, lv = owner[v], loc[v]
                for i in range(Pp):
                    w = int(pg.nbr[l, v, i])
                    if i >= pg.sizes[l + 1, v]:
                        nbr_loc[b, l, s, lv, i] = 0  # pos sentinel masks it
                        nbr_ag[b, l, s, lv, i] = 0
                    elif owner[w] == s:
                        nbr_loc[b, l, s, lv, i] = loc[w]
                        nbr_ag[b, l, s, lv, i] = loc[w]
                    else:
                        nbr_loc[b, l, s, lv, i] = slot[l][(s, w)]
                        nbr_ag[b, l, s, lv, i] = Vs + agslot[w]
        for v in range(V):
            s, lv = owner[v], loc[v]
            pos[b, :, s, lv] = pg.pos[:, v]
            radj[b, :, s, lv] = pg.radj[:, v]
            smask[b, :, s, lv] = pg.smask[:, v]
            wl_feat[b, s, lv] = pg.wl_feat[v]
            vmask[b, s, lv] = pg.vmask[v]

    # Per-level exchanged-row accounting over the real export sets: rows
    # RECEIVED by shard t at level l = sum_s |E[l][s][t]|.
    comm_per_level = []
    for l in range(L):
        recv = [sum(len(E[l][s][t]) for s in range(S) if s != t)
                for (E, _, _) in per_graph for t in range(S)]
        comm_per_level.append({
            "targeted_max": int(max(recv)),
            "targeted_mean": float(np.mean(recv)),
            "allgather": int(S * H),
        })

    return PartitionPlan(
        n_shards=S, Vs=Vs, H=H, n_interior=Vi, shift_sizes=shift_sizes,
        send_idx=send_idx, send_mask=send_mask,
        exp_idx=exp_idx, exp_mask=exp_mask,
        nbr_loc=nbr_loc, nbr_ag=nbr_ag, pos=pos, radj=radj, smask=smask,
        wl_feat=wl_feat, vmask=vmask,
        rows_targeted=int(sum(shift_sizes)),
        rows_allgather=int(S * H),
        comm_per_level=comm_per_level,
    )


def plan_partition(pg: PreparedGraph, n_shards: int) -> PartitionPlan:
    """Single-graph convenience wrapper (batch of one)."""
    return plan_partition_batch([pg], n_shards)


def shard_inputs(plan: PartitionPlan):
    """Device arrays for the partitioned forward/train step."""
    return {
        "wl_feat": jnp.asarray(plan.wl_feat),
        "vmask": jnp.asarray(plan.vmask),
        "nbr_loc": jnp.asarray(plan.nbr_loc),
        "nbr_ag": jnp.asarray(plan.nbr_ag),
        "pos": jnp.asarray(plan.pos),
        "radj": jnp.asarray(plan.radj),
        "smask": jnp.asarray(plan.smask),
        "exp_idx": jnp.asarray(plan.exp_idx),
        "exp_mask": jnp.asarray(plan.exp_mask),
        "send_idx": [jnp.asarray(x) for x in plan.send_idx],
        "send_mask": [jnp.asarray(x) for x in plan.send_mask],
    }


def _input_specs(data_axis: Optional[str], graph_axis: str, plan):
    """PartitionSpecs matching shard_inputs' layout: batch axis over
    ``data_axis`` (if any), shard axis over ``graph_axis``."""
    d = data_axis  # None = replicated batch axis
    return {
        "wl_feat": P(d, graph_axis),
        "vmask": P(d, graph_axis),
        "nbr_loc": P(d, None, graph_axis),
        "nbr_ag": P(d, None, graph_axis),
        "pos": P(d, None, graph_axis),
        "radj": P(d, None, graph_axis),
        "smask": P(d, None, graph_axis),
        "exp_idx": P(d, graph_axis),
        "exp_mask": P(d, graph_axis),
        "send_idx": [P(d, None, graph_axis) for _ in plan.send_idx],
        "send_mask": [P(d, None, graph_axis) for _ in plan.send_mask],
    }


def _use_pallas_bank(cfg: SMP2DConfig, use_pallas: Optional[bool],
                     mesh: Mesh) -> bool:
    if use_pallas is not None:
        return use_pallas
    if cfg.contraction != 18:
        return False
    # Route by the MESH's platform, not the process default backend: a
    # CPU dryrun mesh on a TPU-attached host must take the XLA path.
    platform = mesh.devices.flat[0].platform
    return platform in ("tpu", "axon")


def _bank(cfg: SMP2DConfig, T, radj, K, b, use_pallas: bool):
    """Contraction bank + channel matmul + bias + LeakyReLU for a block of
    n vertex neighborhoods.  T: [n, Pp, Pp, Pp, C] -> [n, Pp, Pp, C].

    Generalized over the contraction family (4/10/18/50 — SMP_gamma,
    ver6, beta/omega/ver8, ver7); the Pallas bank covers the 18-case
    flagship, the others run the einsum case-table engine."""
    from graphflow_tpu.models.smp2d import _CONTRACTIONS

    n, Pp, C = T.shape[0], cfg.P, cfg.nChanels
    contract_fn, nCon = _CONTRACTIONS[cfg.contraction]
    if use_pallas and cfg.contraction == 18 and n > 0:
        from graphflow_tpu.ops.risi_pallas import risi18_bank_train
        Z = (risi18_bank_train(T, radj, K).reshape(n, Pp * Pp, C)
             + b[None, None, :])
    else:
        if cfg.contraction == 4:
            Y = jax.vmap(contract_fn)(T)        # no adjacency operand
        else:
            Y = jax.vmap(contract_fn)(T, radj)
        Z = (Y.reshape(n * Pp * Pp, nCon * C) @ K
             ).reshape(n, Pp * Pp, C) + b[None, None, :]
    return activations.leaky_relu(Z).reshape(n, Pp, Pp, C)


def _make_per_shard_forward(cfg: SMP2DConfig, plan: PartitionPlan,
                            graph_axis: str, halo: str, use_pallas: bool):
    """Build the per-device function: batched vertex-sharded SMP2D forward.

    All array args carry a leading batch axis and a length-1 shard axis
    (stripped on entry).  Returns (pred_local [B], local_feat [B, C]) where
    ``psum(pred_local, graph_axis)`` is the prediction — the head stays a
    per-shard PARTIAL so gradient psums are exact (module docstring).
    """
    Vs, Vi, Pp, C = plan.Vs, plan.n_interior, cfg.P, cfg.nChanels
    S = plan.n_shards
    shift_sizes = plan.shift_sizes

    def gather_block(src_pad, nbr, pos):
        # src_pad [B, rows, Pp+1, Pp+1, C]; nbr [B, n, Pp]; pos [B, n, Pp, Pp]
        return jax.vmap(_gather_neighbor_tensors)(src_pad, nbr, pos)

    def level_block(state_like, nbr, pos, radj, K, b):
        B, n = nbr.shape[0], nbr.shape[1]
        if n == 0:
            return jnp.zeros((B, 0, Pp, Pp, C), state_like.dtype)
        sp = jnp.pad(state_like, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        T = gather_block(sp, nbr, pos)
        out = _bank(cfg, T.reshape(B * n, Pp, Pp, Pp, C),
                    radj.reshape(B * n, Pp, Pp), K, b, use_pallas)
        return out.reshape(B, n, Pp, Pp, C)

    def per_shard(params, inputs):
        wl_feat = inputs["wl_feat"][:, 0]          # [B, Vs, FD]
        vmask = inputs["vmask"][:, 0]              # [B, Vs]
        B = wl_feat.shape[0]

        F0 = activations.leaky_relu(wl_feat @ params["H"].T)
        state = jnp.zeros((B, Vs, Pp, Pp, C), F0.dtype).at[:, :, 0, 0, :].set(
            F0 * vmask[..., None])

        for l in range(cfg.nLevels):
            Kl, bl = params["levels"][l]["K"], params["levels"][l]["b"]
            if halo == "targeted":
                # 1. issue the per-pair halo exchange (ring ppermutes)
                recvs = []
                for k, Hd in enumerate(shift_sizes):
                    if Hd == 0:
                        continue
                    d = k + 1
                    idx = inputs["send_idx"][k][:, l, 0]     # [B, Hd]
                    msk = inputs["send_mask"][k][:, l, 0]
                    buf = (jnp.take_along_axis(
                        state, idx[:, :, None, None, None], axis=1)
                        * msk[:, :, None, None, None])
                    perm = [(s, (s + d) % S) for s in range(S)]
                    recvs.append(jax.lax.ppermute(buf, graph_axis, perm))
                nbr_l = inputs["nbr_loc"][:, l, 0]           # [B, Vs, Pp]
            else:
                boundary = (jnp.take_along_axis(
                    state, inputs["exp_idx"][:, 0, :, None, None, None],
                    axis=1)
                    * inputs["exp_mask"][:, 0, :, None, None, None])
                gathered = jax.lax.all_gather(boundary, graph_axis, axis=1)
                recvs = [gathered.reshape(B, -1, Pp, Pp, C)]
                nbr_l = inputs["nbr_ag"][:, l, 0]
            pos_l = inputs["pos"][:, l, 0]                   # [B, Vs, Pp, Pp]
            radj_l = inputs["radj"][:, l, 0]

            # 2. interior block first: depends only on LOCAL state, so XLA
            #    can overlap it with the in-flight collectives above.
            blocks = []
            lo = Vi if halo == "targeted" else 0
            if lo > 0:
                blocks.append(level_block(
                    state, nbr_l[:, :lo], pos_l[:, :lo], radj_l[:, :lo],
                    Kl, bl))
            # 3. boundary block against the halo-extended buffer.
            if lo < Vs:
                ext = jnp.concatenate([state] + recvs, axis=1)
                blocks.append(level_block(
                    ext, nbr_l[:, lo:], pos_l[:, lo:], radj_l[:, lo:],
                    Kl, bl))
            state = (jnp.concatenate(blocks, axis=1) if len(blocks) > 1
                     else blocks[0])
            state = state * inputs["smask"][:, l + 1, 0][..., None]

        vertex = activations.leaky_relu(state.sum(axis=(2, 3)))  # [B, Vs, C]
        local_feat = (vertex * vmask[..., None]).sum(axis=1)     # [B, C]
        # Per-shard PARTIAL prediction: the head is linear in graph_feat,
        # so <local_feat, W> (or W @ local_feat for class scores) sums to
        # the full-head value under psum; nonlinearities (softmax/LogLoss)
        # are applied AFTER the psum on replicated values.
        if cfg.nClasses:
            pred_local = local_feat @ params["W"].T           # [B, nClasses]
        else:
            pred_local = local_feat @ params["W"]             # [B]
        return pred_local, local_feat

    return per_shard


def make_partitioned_forward(cfg: SMP2DConfig, plan: PartitionPlan,
                             mesh: Mesh, axis: str = "graph",
                             halo: str = "targeted",
                             use_pallas: Optional[bool] = None):
    """Build a jitted vertex-sharded SMP2D forward over ``mesh[axis]``.

    ``halo``: "targeted" (per-pair ppermute exchange, default) or
    "all_gather" (legacy broadcast scheme, kept for measured comparisons).
    Returns ``fn(params, shard_inputs) -> (prediction, graph_feature)``
    (scalars for a batch-of-one plan, [B]-vectors otherwise).
    """
    use_pallas = _use_pallas_bank(cfg, use_pallas, mesh)
    per_shard = _make_per_shard_forward(cfg, plan, axis, halo, use_pallas)
    specs = _input_specs(None, axis, plan)

    def shard_fn(params, inputs):
        pred_local, local_feat = per_shard(params, inputs)
        pred = jax.lax.psum(pred_local, axis)
        graph_feat = jax.lax.psum(local_feat, axis)
        return pred, graph_feat

    fn = shard_map(shard_fn, mesh=mesh, in_specs=(P(), specs),
                   out_specs=(P(), P()), check_vma=False)

    squeeze = plan.batch == 1

    @jax.jit
    def forward(params, inputs):
        pred, feat = fn(params, inputs)
        if squeeze:
            return pred[0], feat[0]
        return pred, feat

    return forward


def make_partitioned_train_step(cfg: SMP2DConfig, plan: PartitionPlan,
                                opt, mesh: Mesh,
                                data_axis: Optional[str] = "data",
                                graph_axis: str = "graph",
                                halo: str = "targeted",
                                use_pallas: Optional[bool] = None):
    """Jitted train step on a data x graph mesh: each graph in the batch is
    vertex-sharded over ``graph_axis`` and the batch is sharded over
    ``data_axis``; per-shard partial gradients are psum'd over BOTH axes
    and one optimizer step is applied (reference DP semantics,
    ``SMP_omega.h:750-792``).

    Returns ``step(params, opt_state, inputs, targets, lr) ->
    (params, opt_state, total_loss)``.  Regression targets are floats
    (SquaredLoss); with ``cfg.nClasses`` set, targets are integer labels
    (LogLoss over the psum'd class scores).
    """
    use_pallas = _use_pallas_bank(cfg, use_pallas, mesh)
    per_shard = _make_per_shard_forward(cfg, plan, graph_axis, halo,
                                        use_pallas)
    specs = _input_specs(data_axis, graph_axis, plan)
    axes = (data_axis, graph_axis) if data_axis else (graph_axis,)
    tgt_spec = P(data_axis) if data_axis else P()
    nBatch = plan.batch

    def shard_loss_and_grad(params, inputs, targets):
        def local_loss(p):
            pred_local, _ = per_shard(p, inputs)
            pred = jax.lax.psum(pred_local, graph_axis)
            if cfg.nClasses:
                return jax.vmap(losses.log_loss)(
                    pred, targets.astype(jnp.int32)).sum()
            return jax.vmap(losses.squared_loss)(pred, targets).sum()

        loss, grads = jax.value_and_grad(local_loss)(params)
        # loss is replicated over graph_axis; grads are per-shard partials.
        loss = (jax.lax.psum(loss, data_axis) if data_axis else loss)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axes), grads)
        return loss, grads

    fn = shard_map(shard_loss_and_grad, mesh=mesh,
                   in_specs=(P(), specs, tgt_spec),
                   out_specs=(P(), P()), check_vma=False)

    @jax.jit
    def step(params, opt_state, inputs, targets, lr):
        loss, grads = fn(params, inputs, targets)
        params, opt_state = opt.update(params, opt_state, grads, lr,
                                       nBatch=nBatch)
        return params, opt_state, loss

    return step
