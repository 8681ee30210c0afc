"""Second-order Steerable Message Passing (the CCN flagship family).

One config-driven module covering the reference's second-order SMP models:

  SMP_omega          (``SMP_omega.h``)  — contraction 18, receptive-field cap
  SMP_beta           (``SMP_beta.h``)   — contraction 18, no cap
  SMP_gamma          (``SMP_gamma.h``)  — contraction 4
  SMP_2D_ver6        (``SMP_2D_ver6.h``)— contraction 10
  SMP_2D_ver7        (``SMP_2D_ver7.h``)— contraction 50
  SMP_2D_ver8        (``SMP_2D_ver8.h``)— contraction 18 (Momentum)
  *_physics          (``SMP_omega_physics.h``) — raw features, Coulomb adj
  *_classification   — LogLoss head over class scores

Math per level (reference ``SMP_omega.h:607-692``):
  level 0:  F_v = LeakyReLU(H @ wl_feat_v)            as a 1x1xC tensor
  level l:  for each w in phi_l(v): gather X f_w X^T  (permutation alignment)
            T = stack of gathered tensors; Y = RisiContraction_k(T, radj)
            Z = reshape(Y) @ K_l + b_l;  F = LeakyReLU(Z)  (s x s x C)
  head:     vertex = LeakyReLU(sum_{p1,p2} F);  graph = sum_v vertex
            predict = <graph, W>;  loss = 0.5 (predict - target)^2

TPU-native re-design: the per-(v,w) permutation matmuls X f X^T become one
vectorized two-axis gather with a zero sentinel (see
``graphflow_tpu.core.prep``), every vertex is processed in one vmapped
contraction bank call, and the whole per-molecule "graph rebuild" is a
trace-once jitted function over padded arrays.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphflow_tpu.core import prep
from graphflow_tpu.core.graph import DenseGraph
from graphflow_tpu.models.base import GraphModel
from graphflow_tpu.ops import activations, contractions, losses


_CONTRACTIONS = {
    4: (contractions.risi_contraction_4, 4),
    10: (contractions.risi_contraction_10, 10),
    18: (contractions.risi_contraction_18, 18),
    50: (contractions.risi_contraction_50, 50),
}


@dataclasses.dataclass
class SMP2DConfig:
    max_nVertices: int
    max_receptive_field: Optional[int]
    nLevels: int
    nChanels: int
    nFeatures: int
    nDepth: int
    has_WL_ordering: bool = True
    use_coulomb: bool = False
    use_wl_features: bool = True      # False => physics variants
    contraction: int = 18             # 4 | 10 | 18 | 50
    nClasses: Optional[int] = None    # set => classification head (LogLoss)
    optimizer: str = "adam"
    dtype: str = "float32"
    # None = auto (fused Pallas level kernel on TPU for contraction 18);
    # True/False forces. The fused kernel computes gather + bank + channel
    # matmul in one HBM pass (ops/risi_fused_pallas.py).
    use_fused_kernel: Optional[bool] = None
    # Explicit per-level channel counts (length nLevels+1).  The pairgraph
    # towers HALVE channels each level (``SMP_omega_pairgraphs.h:202-204``:
    # C_l = max(C_{l-1}/2, 1)); None = constant nChanels.
    channel_schedule: Optional[Tuple[int, ...]] = None

    @property
    def feat_dim(self) -> int:
        return (self.nFeatures * (self.nDepth + 1)
                if self.use_wl_features else self.nFeatures)

    @property
    def P(self) -> int:
        return (self.max_receptive_field
                if self.max_receptive_field is not None else self.max_nVertices)

    def channels_at(self, l: int) -> int:
        if self.channel_schedule is not None:
            return self.channel_schedule[l]
        return self.nChanels


def init_smp2d_params(key, cfg: SMP2DConfig):
    """Parameters in the reference's registration order
    (``SMP_omega.h:289-295``): H, then per level (K, b), then W."""
    from graphflow_tpu.optim.utils import uniform_init

    nCon = _CONTRACTIONS[cfg.contraction][1]
    dtype = jnp.dtype(cfg.dtype)
    keys = jax.random.split(key, 2 + 2 * cfg.nLevels)
    params = {
        "H": uniform_init(keys[0], (cfg.channels_at(0), cfg.feat_dim),
                          dtype),
        "levels": [
            {"K": uniform_init(keys[1 + 2 * l],
                               (nCon * cfg.channels_at(l),
                                cfg.channels_at(l + 1)), dtype),
             "b": uniform_init(keys[2 + 2 * l], (cfg.channels_at(l + 1),),
                               dtype)}
            for l in range(cfg.nLevels)
        ],
    }
    CL = cfg.channels_at(cfg.nLevels)
    if cfg.nClasses:
        params["W"] = uniform_init(keys[-1], (cfg.nClasses, CL), dtype)
    else:
        params["W"] = uniform_init(keys[-1], (CL,), dtype)
    return params


def _t2_frontend_ok(cfg: SMP2DConfig, dtype) -> bool:
    """Whether the v3 alignment front-end can serve this level: TPU
    platform, f32/bf16, and P at the kernel's sublane-tile multiple (the
    same constraint as the fused 18-case routes)."""
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    if platform not in ("tpu", "axon"):
        return False
    dt = jnp.dtype(dtype)
    if dt == jnp.dtype(jnp.float32):
        return cfg.P % 8 == 0
    if dt == jnp.dtype(jnp.bfloat16):
        return cfg.P % 16 == 0
    return False


def _gather_neighbor_tensors(state_pad, nbr, pos):
    """The TPU form of the per-(v, w) permutation matmuls X f_w X^T
    (reference ``SMP_omega.h:641-648``).

    state_pad: [V, P+1, P+1, C] spatially zero-padded previous level,
    nbr: [V, P] neighbor ids (sentinel V), pos: [V, P, P] position maps
    (sentinel P).  Returns T: [V, P, P, P, C]:
    T[v, i, p1, p2] = f_{w_i}[pos[v,i,p1], pos[v,i,p2]] with absent
    vertices/slots contributing exact zeros.

    Two formulations, A/B-tested on-chip in one session at V=256 P=16
    C=32 (tools/bench_train_step.py; both bit-exact — every output
    element is one selected value):

      "take" (default): ONE flat row-gather — neighbor id and the p1
        position fold into a single row index over the
        [(V+1)(P+1), (P+1)C] view (q1-sentinel rows and an appended zero
        vertex row make absent slots exact zeros) — plus one small einsum
        for the p2 side.  Flat ROW gathers lower well on TPU (1.49 ms fwd
        vs 2.76; it is multi-axis take_along_axis that hits the 25x-slow
        path, docs/KERNEL_NOTES.md); XLA's native take adjoint (scatter)
        also wins at bf16 (train level 9.8 vs 11.5 ms).

      "onehot": gather + both alignments as one-hot MXU matmuls
        (round-1 design; marginally better f32 fwd+bwd in the pure-XLA
        composition, 14.8 vs 15.8 ms).

    A hand-written two-stage scatter-add VJP was also tried and LOST to
    both (17.6 ms train level) — XLA's own take/matmul transposes fuse
    better than the manual composition.
    """
    return _GATHER_IMPLS[_GATHER_DEFAULT](state_pad, nbr, pos)


def _gather_neighbor_tensors_onehot(state_pad, nbr, pos):
    """All-one-hot-matmul formulation (round 1): gather + both alignments
    as MXU matmuls.  Autodiff adjoint = transposed matmuls."""
    V = state_pad.shape[0]
    dt = state_pad.dtype
    ein = _ein(dt)
    onehot = (nbr[..., None] == jnp.arange(V)).astype(dt)          # [V, P, V]
    Fn = ein("vim,mqrc->viqrc", onehot, state_pad).astype(dt)
    Xsel = (pos[..., None]
            == jnp.arange(state_pad.shape[1])).astype(dt)      # [V,P,P,P+1]
    T = ein("vipq,viqrc->viprc", Xsel, Fn).astype(dt)       # row alignment
    return ein("visr,viprc->vipsc", Xsel, T).astype(dt)     # column alignment


def _ein(dt):
    # f32 accumulation: free exactness (each output sums ONE product) and,
    # for bf16 states, hits the native MXU bf16xbf16->f32 path.
    return functools.partial(
        jnp.einsum,
        preferred_element_type=jnp.promote_types(dt, jnp.float32))



def _gather_neighbor_tensors_take(state_pad, nbr, pos):
    """Flat-take formulation with XLA's native take adjoint (scatter).

    state_pad may have MORE rows than nbr (the partitioned path gathers
    from a halo-extended buffer); the output vertex axis is nbr's.
    """
    V, Q = state_pad.shape[0], state_pad.shape[1]
    Vout, P = nbr.shape
    C = state_pad.shape[3]
    dt = state_pad.dtype
    src = jnp.concatenate(
        [state_pad.reshape(V * Q, Q * C),
         jnp.zeros((Q, Q * C), dt)], axis=0)
    rows = nbr[:, :, None] * Q + pos
    Ar = jnp.take(src, rows.reshape(-1), axis=0).reshape(Vout, P, P, Q, C)
    Xsel = (pos[..., None] == jnp.arange(Q)).astype(dt)
    return _ein(dt)("vabqc,vapq->vabpc", Ar, Xsel).astype(dt)


_GATHER_IMPLS = {
    "onehot": _gather_neighbor_tensors_onehot,
    "take": _gather_neighbor_tensors_take,
}
# Default picked by single-session A/B on the TPU (tools/bench_train_step.py)
_GATHER_DEFAULT = "take"


def smp2d_states(params, g, cfg: SMP2DConfig, case_mask=None,
                 training=False):
    """Run the tower, returning the per-level vertex tensor states
    (list of [V, P, P, C], levels 0..nLevels).

    ``case_mask`` ([nContractions] multiplier) enables the sigma variant's
    per-case contraction dropout (RisiContraction_18_dropout.h).
    ``training=True`` routes to the fully fused v3t path when the
    receptive field is tile-aligned (Pallas fwd emitting the aligned T2
    residual + Pallas bwd; 6.48 ms fwd+bwd per level at production
    shapes) and otherwise to the XLA gather + the Pallas bank with its
    mirrored Pallas backward (``ops.risi_pallas.risi18_bank_train``,
    12.1 ms) — docs/KERNEL_NOTES.md, tools/bench_train_step.py."""
    contract_fn, nCon = _CONTRACTIONS[cfg.contraction]
    # V from the data (shape-polymorphic for bucketed batching); P/C static.
    V, P, C = g["vmask"].shape[0], cfg.P, cfg.channels_at(0)

    # Level 0 (reference SMP_omega.h:616-627): 1x1xC vertex tensors.
    F0 = activations.leaky_relu(g["wl_feat"] @ params["H"].T)   # [V, C]
    state = jnp.zeros((V, P, P, C), F0.dtype).at[:, 0, 0, :].set(
        F0 * g["vmask"][:, None])
    states = [state]

    uniform_C = cfg.channel_schedule is None or len(
        set(cfg.channel_schedule)) == 1
    use_fused = cfg.use_fused_kernel
    use_bank_train = False
    use_fused_train = False
    if use_fused is None:
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        pallas_ok = (cfg.contraction == 18 and case_mask is None
                     and uniform_C
                     and platform in ("tpu", "axon")
                     and jnp.dtype(cfg.dtype) in (jnp.dtype(jnp.float32),
                                                  jnp.dtype(jnp.bfloat16)))
        bf16 = jnp.dtype(cfg.dtype) == jnp.dtype(jnp.bfloat16)
        # Inference: the v3 gather-fused level kernel (f32 2.76 ms/level;
        # bf16 routes there too when P is 16-aligned — the bf16 sublane
        # tile — beating the take-gather+bank path, 3.37 ms);
        # f32 training: the fully fused v3t path (Pallas fwd emitting the
        # aligned T2 residual + Pallas bwd + one-hot-matmul scatter,
        # 6.48 ms vs 12.31 ms for gather+bank) — docs/KERNEL_NOTES.md.
        use_fused = (pallas_ok and not training
                     and (cfg.P % 16 == 0 if bf16 else True))
        # v3t slices per-slot values at sublane offsets i*P (tile-aligned
        # only); small receptive fields train via the Pallas bank instead.
        use_fused_train = (pallas_ok and training
                           and cfg.P % (16 if bf16 else 8) == 0)
        # Mutually exclusive with the two fused routes (exactly one of the
        # three Pallas flags may be set) so the level loop's routing does
        # not depend on branch ordering.
        use_bank_train = (pallas_ok and not use_fused
                          and not use_fused_train and (bf16 or training))

    for l in range(cfg.nLevels):
        Kl, bl = params["levels"][l]["K"], params["levels"][l]["b"]
        prevC, Cout = state.shape[-1], Kl.shape[1]
        if use_fused or use_fused_train:
            from graphflow_tpu.ops.risi_fused_pallas import (
                risi18_level, risi18_level_train)
            fn = risi18_level_train if use_fused_train else risi18_level
            Z = fn(state, g["nbr"][l], g["pos"][l], g["radj"][l], Kl, bl)
            state = Z.reshape(V, P, P, Cout) * g["smask"][l + 1][:, :, :, None]
            states.append(state)
            continue
        if (cfg.contraction in (10, 50) and case_mask is None and not training
                and uniform_C and cfg.use_fused_kernel is None
                and _t2_frontend_ok(cfg, state.dtype)):
            # ver6/ver7 inference: the v3 kernel's DMA+alignment front-end
            # replaces the XLA take-gather (bit-exact; ver6 5.09 -> 4.04
            # ms, ver7 10.35 -> 8.89 ms at V=256 P=16 C=32 —
            # docs/KERNEL_NOTES.md round 5).  Training keeps the
            # take-gather path (native scatter adjoint).
            from graphflow_tpu.ops.risi_fused_pallas import risi18_aligned_t2
            T = risi18_aligned_t2(state, g["nbr"][l], g["pos"][l])
        else:
            state_pad = jnp.pad(state, ((0, 0), (0, 1), (0, 1), (0, 0)))
            T = _gather_neighbor_tensors(state_pad, g["nbr"][l], g["pos"][l])
        if use_bank_train:
            from graphflow_tpu.ops.risi_pallas import risi18_bank_train
            Z = (risi18_bank_train(T, g["radj"][l], Kl).reshape(V, P * P,
                                                               Cout)
                 + bl[None, None, :])
            state = activations.leaky_relu(Z).reshape(V, P, P, Cout)
            state = state * g["smask"][l + 1][:, :, :, None]
            states.append(state)
            continue
        if cfg.contraction in (10, 50) and case_mask is None:
            # Fused bank + channel matmul: never materializes the
            # [V, P, P, nCon*C] concat (risi_contraction_{10,50}_matmul;
            # the 50C concat is 419 MB at production shapes — measured
            # dominant in the unfused ver7 level step, tools/bench_banks.py:
            # 16.5 -> 10.4 ms/level, 1.49x per-case-FLOP vs the fused ver8).
            fused_bank = (contractions.risi_contraction_50_matmul
                          if cfg.contraction == 50
                          else contractions.risi_contraction_10_matmul)
            Z = (fused_bank(T, g["radj"][l], Kl).reshape(V, P * P, Cout)
                 + bl[None, None, :])
            state = activations.leaky_relu(Z).reshape(V, P, P, Cout)
            state = state * g["smask"][l + 1][:, :, :, None]
            states.append(state)
            continue
        if cfg.contraction == 4:
            Y = jax.vmap(contract_fn)(T)                        # no adjacency
        else:
            Y = jax.vmap(contract_fn)(T, g["radj"][l])      # [V,P,P,nCon*pC]
        if case_mask is not None:
            Y = Y * jnp.repeat(case_mask, prevC)[None, None, None, :]
        # One flattened MXU matmul: the batched [P*P, nCon*C] @ K form
        # lowers to V separate small matmuls on TPU (~10x slower, measured).
        Z = (Y.reshape(V * P * P, nCon * prevC) @ Kl
             ).reshape(V, P * P, Cout) + bl[None, None, :]
        state = activations.leaky_relu(Z).reshape(V, P, P, Cout)
        state = state * g["smask"][l + 1][:, :, :, None]
        states.append(state)
    return states


def _graph_feature(state, vmask):
    """Shrink -> LeakyReLU -> masked vertex sum (SMP_omega.h:674-686)."""
    vertex = activations.leaky_relu(state.sum(axis=(1, 2)))     # [V, C]
    return (vertex * vmask[:, None]).sum(axis=0)                # [C]


def smp2d_level_features(params, g, cfg: SMP2DConfig, case_mask=None,
                         training=False):
    """Per-level graph features (the pairgraph towers collect these at every
    level, SMP_omega_pairgraphs.h:640-654).  Returns a LIST of [C_l]
    vectors — channel counts differ per level under a channel schedule."""
    states = smp2d_states(params, g, cfg, case_mask=case_mask,
                          training=training)
    return [_graph_feature(s, g["vmask"]) for s in states]


def smp2d_forward(params, g, cfg: SMP2DConfig, training=False):
    """Pure forward for one prepared graph. Returns (prediction, graph_feat).

    ``g`` is one element of a stacked GraphBatch (dict of arrays without the
    batch axis).
    """
    states = smp2d_states(params, g, cfg, training=training)
    graph_feat = _graph_feature(states[-1], g["vmask"])
    if cfg.nClasses:
        scores = params["W"] @ graph_feat                       # [nClasses]
        return scores, graph_feat
    predict = jnp.dot(graph_feat, params["W"])
    return predict, graph_feat


class SMP2D(GraphModel):
    """Config-driven second-order SMP model with the reference API."""

    def __init__(self, cfg: SMP2DConfig, seed: int = 0):
        super().__init__(optimizer=cfg.optimizer)
        self.cfg = cfg
        self.params = init_smp2d_params(jax.random.PRNGKey(seed), cfg)
        self.param_order = (["H"]
                            + [f"levels/{l}/{k}" for l in range(cfg.nLevels)
                               for k in ("K", "b")]
                            + ["W"])
        self._finish_init()

    def _prepare(self, graph: DenseGraph,
                 pad_nVertices: int = None) -> prep.PreparedGraph:
        return prep.prepare_graph(
            graph, self.cfg.nLevels, pad_nVertices or self.cfg.max_nVertices,
            self.cfg.max_receptive_field, self.cfg.nDepth,
            has_WL_ordering=self.cfg.has_WL_ordering,
            use_coulomb=self.cfg.use_coulomb,
            use_wl_features=self.cfg.use_wl_features,
            dtype=np.dtype(self.cfg.dtype),
        )

    def _forward(self, params, g):
        return smp2d_forward(params, g, self.cfg)

    def _loss(self, params, g, target):
        out, _ = smp2d_forward(params, g, self.cfg, training=True)
        if self.cfg.nClasses:
            return losses.log_loss(out, target.astype(jnp.int32))
        return losses.squared_loss(out, target)


# ----------------------------------------------------------------------
# Named constructors mirroring the reference model classes
# ----------------------------------------------------------------------

def SMP_omega(max_nVertices, max_receptive_field, nLevels, nChanels,
              nFeatures, nDepth, has_WL_ordering=True, use_coulomb=False,
              seed=0) -> SMP2D:
    """``SMP_omega.h:31-113``: contraction 18 + receptive-field cap + Adam."""
    return SMP2D(SMP2DConfig(
        max_nVertices=max_nVertices, max_receptive_field=max_receptive_field,
        nLevels=nLevels, nChanels=nChanels, nFeatures=nFeatures,
        nDepth=nDepth, has_WL_ordering=has_WL_ordering,
        use_coulomb=use_coulomb, contraction=18, optimizer="adam"), seed)


def SMP_beta(max_nVertices, nLevels, nChanels, nFeatures, nDepth,
             use_coulomb=False, seed=0) -> SMP2D:
    """``SMP_beta.h``: omega without the receptive-field cap
    (``SMP_beta.h:199-208``)."""
    return SMP2D(SMP2DConfig(
        max_nVertices=max_nVertices, max_receptive_field=None,
        nLevels=nLevels, nChanels=nChanels, nFeatures=nFeatures,
        nDepth=nDepth, use_coulomb=use_coulomb, contraction=18,
        optimizer="adam"), seed)


def SMP_gamma(max_nVertices, max_receptive_field, nLevels, nChanels,
              nFeatures, nDepth, seed=0) -> SMP2D:
    """``SMP_gamma.h:199-207``: the RisiContraction_4 variant."""
    return SMP2D(SMP2DConfig(
        max_nVertices=max_nVertices, max_receptive_field=max_receptive_field,
        nLevels=nLevels, nChanels=nChanels, nFeatures=nFeatures,
        nDepth=nDepth, contraction=4, optimizer="adam"), seed)


# The *_physics variants (raw features, optional Coulomb adjacency, and a
# DIFFERENT per-level-features MLP head, ``SMP_omega_physics.h:211-239``)
# live in graphflow_tpu.models.physics; re-exported here for the reference
# API surface.
from graphflow_tpu.models.physics import (          # noqa: E402,F401
    SMP_omega_physics, SMP_beta_physics, SMP_gamma_physics)


def SMP_2D_ver6(max_nVertices, max_receptive_field, nLevels, nChanels,
                nFeatures, nDepth, seed=0) -> SMP2D:
    """``SMP_2D_ver6.h:134-141``: RisiContraction_10 + K(10C->C)."""
    return SMP2D(SMP2DConfig(
        max_nVertices=max_nVertices, max_receptive_field=max_receptive_field,
        nLevels=nLevels, nChanels=nChanels, nFeatures=nFeatures,
        nDepth=nDepth, contraction=10, optimizer="momentum"), seed)


def SMP_2D_ver7(max_nVertices, max_receptive_field, nLevels, nChanels,
                nFeatures, nDepth, seed=0) -> SMP2D:
    """``SMP_2D_ver7.h:134-141``: RisiContraction_50 + K(50C->C)."""
    return SMP2D(SMP2DConfig(
        max_nVertices=max_nVertices, max_receptive_field=max_receptive_field,
        nLevels=nLevels, nChanels=nChanels, nFeatures=nFeatures,
        nDepth=nDepth, contraction=50, optimizer="momentum"), seed)


def SMP_2D_ver8(max_nVertices, max_receptive_field, nLevels, nChanels,
                nFeatures, nDepth, seed=0) -> SMP2D:
    """``SMP_2D_ver8.h:134-141``: RisiContraction_18 + K(18C->C),
    Momentum optimizer."""
    return SMP2D(SMP2DConfig(
        max_nVertices=max_nVertices, max_receptive_field=max_receptive_field,
        nLevels=nLevels, nChanels=nChanels, nFeatures=nFeatures,
        nDepth=nDepth, contraction=18, optimizer="momentum"), seed)

def SMP_2D_ver6_classification(max_nVertices, max_receptive_field, nLevels,
                               nChanels, nFeatures, nDepth, nClasses, seed=0):
    """``SMP_2D_ver6_classification.h``."""
    return SMP2D(SMP2DConfig(
        max_nVertices=max_nVertices, max_receptive_field=max_receptive_field,
        nLevels=nLevels, nChanels=nChanels, nFeatures=nFeatures,
        nDepth=nDepth, contraction=10, nClasses=nClasses,
        optimizer="momentum"), seed)


def SMP_2D_ver7_classification(max_nVertices, max_receptive_field, nLevels,
                               nChanels, nFeatures, nDepth, nClasses, seed=0):
    """``SMP_2D_ver7_classification.h``."""
    return SMP2D(SMP2DConfig(
        max_nVertices=max_nVertices, max_receptive_field=max_receptive_field,
        nLevels=nLevels, nChanels=nChanels, nFeatures=nFeatures,
        nDepth=nDepth, contraction=50, nClasses=nClasses,
        optimizer="momentum"), seed)


def SMP_2D_ver8_thread(max_nVertices, max_receptive_field, nLevels, nChanels,
                       nFeatures, nDepth, nThreads=None, seed=0):
    """``SMP_2D_ver8_thread.h``: the threaded-contraction variant.  On TPU
    the 6-way std::thread job split (RisiContraction_18_thread.h:745-781) is
    subsumed by XLA's parallel execution; identical math to ver8."""
    return SMP_2D_ver8(max_nVertices, max_receptive_field, nLevels, nChanels,
                       nFeatures, nDepth, seed)


def smp2d_inspect(model, graph) -> dict:
    """Activation dump for debugging (the reference's ``ForDebugging()``,
    ``SMP_2D.h:762-795`` prints per-level activations): returns per-level
    vertex tensor states, vertex features, and the graph feature as NumPy
    arrays restricted to real vertices."""
    import numpy as np

    batch = model._stack([graph])
    g = jax.tree_util.tree_map(lambda x: x[0], batch)
    states = smp2d_states(model.params, g, model.cfg)
    n = graph.nVertices
    vertex = activations.leaky_relu(states[-1].sum(axis=(1, 2)))
    return {
        "states": [np.asarray(s)[:n] for s in states],
        "vertex_features": np.asarray(vertex)[:n],
        "graph_feature": np.asarray(_graph_feature(states[-1], g["vmask"])),
    }


# ----------------------------------------------------------------------
# GPU model drivers (reference GraphFlow_gpu/): on TPU the whole model IS
# the accelerated path — one XLA program covers what the reference split
# into CPU orchestration + per-op CUDA kernels + per-replica streams.
# These aliases keep the reference class names resolvable.
# ----------------------------------------------------------------------

def SMP_omega_gpu(*args, **kwargs):
    """``GraphFlow_gpu/SMP_omega_gpu.h``: omega with RisiContraction_18_gpu
    nodes.  The TPU equivalent is SMP_omega itself (the contraction bank is
    compiled for the accelerator; no per-op offload exists)."""
    return SMP_omega(*args, **kwargs)


def SMP_beta_gpu(*args, **kwargs):
    """``GraphFlow_gpu/SMP_beta_gpu.h``: see SMP_omega_gpu."""
    return SMP_beta(*args, **kwargs)


def SMP_omega_gpu_multistreams(*args, nThreads=None, **kwargs):
    """``GraphFlow_gpu/SMP_omega_gpu_multistreams.h``: replica-per-stream
    batch concurrency.  On TPU, batch concurrency is the vmapped batch axis
    of one jitted program (XLA schedules it); multi-chip concurrency is
    graphflow_tpu.parallel."""
    return SMP_omega(*args, **kwargs)


def SMP_beta_gpu_multistreams(*args, nThreads=None, **kwargs):
    """``GraphFlow_gpu/SMP_beta_gpu_multistreams.h``: see above."""
    return SMP_beta(*args, **kwargs)
