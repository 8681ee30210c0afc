"""Gather-fused Pallas TPU kernel: the COMPLETE second-order SMP level step.

One kernel computes, per vertex v (reference call sites in parentheses):

    T_i = X_i f_{nbr(v,i)} X_i^T          (alignment, SMP_omega.h:641-648)
    Y   = RisiContraction_18(T, radj_v)   (RisiContraction_18.h:73-331)
    Z   = leaky_relu(reshape(Y) @ K + b)  (SMP_omega.h:653-669)

without materializing the stacked tensor T[V, P, P, P, C] in HBM (134 MB
at production shapes): each grid step (v, i) DMAs ONE neighbor state
block (~37 KB) into VMEM, aligns it on the MXU, and accumulates the
contraction-bank primitives in VMEM scratch; at the last slot the 18-case
bank + channel matmul + bias + LeakyReLU are assembled on-chip and one
[P*P, Cout] block is written.  HBM traffic: ~151 MB neighbor reads +
16 MB output, vs ~600 MB for the XLA einsum composition.

Layout key: the level state is stored CHANNEL-MAJOR, [q1, (c q2)] per
vertex.  Then

  * row alignment is one matmul  A = Xsel @ F            [P, (c q2)]
  * column alignment is C/G chunked matmuls against D_G = I_G (x) Xsel^T
    (built once per slot by concat-doubling), giving T'' [P, (c p2)]
    with K = G*(P+1), N = G*P — MXU-shaped, no per-slot dense
    [(q c), (p c)] selector (whose VPU build cost dominates otherwise).

All ops used are in the probed-supported Mosaic set (CLAUDE.md): 2-D
matmuls, 2-D transpose, concat, elementwise, small iota.  Every selector
constant over the output/bank index spaces is built HOST-side.

Exactness: every alignment output element is a sum with exactly one
nonzero 1.0*x product (bit-exact); the bank assembly uses the same
shared-reduction decomposition as ops.contractions.risi_contraction_18
(parity-tested against the reference binary).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _consts(P: int, C: int, dtype=np.float32):
    """Host-built selector/mask constants (shapes fixed per (P, C)).

    Column layouts: PC-wide axes are (c p2) C-MAJOR (col = c*P + p2);
    N2-wide row axes are (x y) = (p1 p2) pair-major as in Tensor3D.h:37.
    """
    N2, PC = P * P, P * C
    r = np.arange(N2)
    p = np.arange(PC)
    mask_cb = (p[None, :] % P == r[:, None] % P).astype(dtype)
    sel_rdiv = (r[:, None] // P == np.arange(P)[None, :]).astype(dtype)
    sel_rmod = (r[:, None] % P == np.arange(P)[None, :]).astype(dtype)

    return {
        # [(c p2), f]: sum over p2 keeping channel
        "Mrow": (p[:, None] // P == np.arange(C)[None, :]).astype(dtype),
        # [P, (c p2)]: diagonal mask p1 == p2
        "dmaskP": (np.arange(P)[:, None] == p[None, :] % P).astype(dtype),
        # [N2, (c p2)]: select p2 == y (= row % P)
        "mask_cb": mask_cb,
        # [N2, 2(c p2)]: the same, doubled (merged T_bc/M10 pass)
        "mask_cb2": np.concatenate([mask_cb, mask_cb], axis=1),
        # [P, N2] row collapse keeping major / minor index
        "Sa": (np.arange(P)[:, None] == r[None, :] // P).astype(dtype),
        "Sb": (np.arange(P)[:, None] == r[None, :] % P).astype(dtype),
        # [N2, P] row-index selectors (+ transposes for E9/E12 builds)
        "sel_rdiv": sel_rdiv,
        "sel_rmod": sel_rmod,
        "selrdivT": sel_rdiv.T.copy(),
        "selrmodT": sel_rmod.T.copy(),
        # [N2, N2] Kronecker masks for E9/E12 + the (a b)->(b a) pair swap
        "blockdiag": (r[:, None] // P == r[None, :] // P).astype(dtype),
        "crossdiag": (r[:, None] // P == r[None, :] % P).astype(dtype),
        "Pswap": ((r[:, None] % P) * P + r[:, None] // P
                  == r[None, :]).astype(dtype),
        # [N2, 1] / [1, N2]: rows with x == y
        "dmask_row": (r // P == r % P).astype(dtype)[:, None],
        "dmaskT": (r // P == r % P).astype(dtype)[None, :],
        "eyeP": np.eye(P, dtype=dtype),
    }


_CONST_NAMES = ("Mrow", "dmaskP", "mask_cb", "mask_cb2", "Sa", "Sb",
                "sel_rdiv", "sel_rmod", "selrdivT", "selrmodT",
                "blockdiag", "crossdiag", "Pswap", "dmask_row", "dmaskT",
                "eyeP")


def _tile_rows(x, times: int):
    """jnp.tile along axis 0 via concat-doubling (Mosaic-safe)."""
    out, built = x, 1
    while built * 2 <= times:
        out = jnp.concatenate([out, out], axis=0)
        built *= 2
    while built < times:
        out = jnp.concatenate([out, x], axis=0)
        built += 1
    return out


def _tile_concat(x, times_rows: int, times_cols: int):
    def dbl(v, n, axis):
        out, built = v, 1
        while built * 2 <= n:
            out = jnp.concatenate([out, out], axis=axis)
            built *= 2
        while built < n:
            out = jnp.concatenate([out, v], axis=axis)
            built += 1
        return out

    return dbl(dbl(x, times_rows, 0), times_cols, 1)


def _blockdiag_kron(X, G: int):
    """I_G (x) X via concat-doubling: [a, b] -> [G a, G b]."""
    out = X
    built = 1
    while built < G:
        za = jnp.zeros_like(out)
        top = jnp.concatenate([out, za], axis=1)
        bot = jnp.concatenate([za, out], axis=1)
        out = jnp.concatenate([top, bot], axis=0)
        built *= 2
    assert built == G, f"chunk size {G} must be a power of two"
    return out


# Ablation switches for kernel performance experiments (debug only).
_ABLATE = {"prims": True, "acc": True}


def _kernel(nbr_ref,                              # scalar prefetch [V*P]
            state_ref, xsel_ref, radj_ref,
            K137_ref, KB_ref, KC_ref, KD_ref, b_ref,
            Mrow_ref, dmaskP_ref, mask_cb_ref, mask_cb2_ref, Sa_ref, Sb_ref,
            sel_rdiv_ref, sel_rmod_ref, selrdivT_ref, selrmodT_ref,
            blockdiag_ref, crossdiag_ref, Pswap_ref, dmask_row_ref,
            dmaskT_ref, eyeP_ref,
            out_ref,
            acc_ref, accR_ref, rowsum_ref, rowsumR_ref, diag_ref, coli_ref,
            *, P, C, G, Cout, negslope, precision):
    f32 = jnp.float32
    i = pl.program_id(1)
    N2, PC = P * P, P * C

    def mm(x, y):
        return jnp.dot(x, y, preferred_element_type=f32,
                       precision=precision)

    # ---- per-slot: align + primitives ------------------------------------
    F = state_ref[0]                                  # [P+1, (c q2)] c-major
    # xsel block is per-VERTEX ([(i p1), P+1]); slice out slot i's selector
    # so the small DMA happens once per vertex, not once per grid step.
    Xsel = xsel_ref[0, pl.ds(i * P, P), :].astype(F.dtype)   # [P, P+1]
    A = mm(Xsel, F)                                   # [P, (c q2)] row-align

    # adjacency row sums (cheap; recomputed each step from the VMEM block)
    Ap_raw = radj_ref[0]
    Ap = jnp.where(Ap_raw > 0, Ap_raw, jnp.zeros_like(Ap_raw)).astype(f32)
    onesP = jnp.ones((P, 1), f32)
    R_col = mm(Ap, onesP)                             # [P, 1]
    onehot_i = (jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
                == i).astype(f32)                     # [1, P]
    R_i = mm(onehot_i, R_col)                         # [1, 1] scalar R[i]

    # column alignment: chunks of G channels against I_G (x) Xsel^T
    DG = _blockdiag_kron(Xsel.T, G)                   # [G(P+1), GP]
    QG, PG = G * (P + 1), G * P
    chunks = [mm(A[:, k * QG:(k + 1) * QG], DG.astype(A.dtype))
              for k in range(C // G)]
    T2 = jnp.concatenate(chunks, axis=1)              # [P, (c p2)] f32

    # primitives (layouts documented in _consts)
    Mrow = Mrow_ref[...]                              # [(c p2), f]
    if _ABLATE["prims"]:
        R_tile = _tile_rows(R_col, C)                 # [(c p2), 1] = R[p2]
        i_tile = _tile_rows(onehot_i.T, C)            # [(c p2), 1] = d(p2=i)
        prim_sel = jnp.concatenate(
            [Mrow, R_tile * Mrow, i_tile * Mrow], axis=1)  # [(c p2), 3C]
        prims = mm(T2, prim_sel)                      # [P, 3C]
        diag_i = mm(T2 * dmaskP_ref[...], Mrow)       # [P, C]

        rowsum_ref[pl.ds(i * P, P), :] = prims[:, 0:C]
        rowsumR_ref[pl.ds(i * P, P), :] = prims[:, C:2 * C]
        coli_ref[pl.ds(i * P, P), :] = prims[:, 2 * C:3 * C]
        diag_ref[pl.ds(i * P, P), :] = diag_i

    if _ABLATE["acc"]:
        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            accR_ref[...] = jnp.zeros_like(accR_ref)

        acc_ref[...] += T2
        accR_ref[...] += R_i[0, 0] * T2

    # ---- last slot: assemble the 18-case bank + channel matmul -----------
    @pl.when(i == P - 1)
    def _assemble():
        K137 = K137_ref[...].astype(f32)
        KB = KB_ref[...].astype(f32)
        KC = KC_ref[...].astype(f32)
        KD = KD_ref[...].astype(f32)
        Sa, Sb = Sa_ref[...], Sb_ref[...]
        sel_rdiv, sel_rmod = sel_rdiv_ref[...], sel_rmod_ref[...]
        selrdivT, selrmodT = selrdivT_ref[...], selrmodT_ref[...]
        blockdiag, crossdiag = blockdiag_ref[...], crossdiag_ref[...]
        Pswap, mask_cb2 = Pswap_ref[...], mask_cb2_ref[...]
        dmaskT = dmaskT_ref[...]

        ones_row = jnp.ones((1, N2), f32)
        S_adj = jnp.sum(Ap)
        trA = jnp.sum(Ap * eyeP_ref[...])

        T_ab = rowsum_ref[...]                        # [(a b), f]
        M6 = rowsumR_ref[...]                         # [(a b), f] case 6
        D_bc = diag_ref[...]                          # [(a b), f] T[a,b,b]
        V_ac = coli_ref[...]                          # [(a b), f] T[a,b,a]

        # [(b c), f] rows from the accumulators: replicate rows over y,
        # select p2 == y, sum keeping channel — one merged 2PC pass.
        acc2 = jnp.concatenate([acc_ref[...], accR_ref[...]], axis=1)
        Y2 = mm(sel_rdiv, acc2) * mask_cb2            # [N2, 2 PC]
        T_bc = mm(Y2[:, :P * C], Mrow)                # case base (3/13)
        M10 = mm(Y2[:, P * C:], Mrow)                 # case 10

        T_a = mm(Sa, T_ab)                            # [P, C]
        T_b = mm(Sb, T_ab)
        Tdiag_bc_a = mm(Sa, D_bc)
        D_ac_b = mm(Sb, V_ac)
        T_full = mm(ones_row, T_ab)                   # [1, C]
        s14 = mm(dmaskT, T_ab)                        # diag rows of T_ab
        s15 = mm(ones_row, D_bc)
        t18 = mm(dmaskT, D_bc)
        W17 = mm(Pswap, V_ac)                         # [(b e), f] T[e,b,e]

        # Kronecker case maps built by matmul (vs concat-doubling)
        Mid = mm(sel_rmod, Ap)                        # [N2, P]: Ap[r%P, e]
        E9 = mm(Mid, selrmodT) * blockdiag            # kron(I, Ap)
        E12 = mm(Mid, selrdivT) * crossdiag
        E9out = mm(E9, jnp.concatenate(
            [T_ab, T_bc, D_bc, W17], axis=1))         # [M9|M13|M16|M17]
        M12 = mm(E12, T_ab)

        # one fused case-assembly matmul (groups A, D, B, C)
        KA = S_adj * K137[0:C] + trA * K137[C:2 * C]  # cases 1, 7
        KA3 = S_adj * K137[2 * C:3 * C]               # case 3
        U = jnp.concatenate([T_a, T_b, Tdiag_bc_a, D_ac_b], axis=1)
        UK = mm(U, KB)                                # [P, Cout]
        t_cat = jnp.concatenate([T_full, s14, s15, t18], axis=1)
        tK = mm(t_cat, KC)                            # [1, Cout]
        Gsel = mm(sel_rdiv, Ap)                       # [N2, P]
        Ap_flat = mm(Gsel * sel_rmod, onesP)          # [N2, 1] = Ap[x, y]
        rowR = mm(sel_rmod, R_col)                    # [N2, 1] = R[y]

        M_big = jnp.concatenate(
            [T_ab, T_bc, M6, M10, M12, E9out,
             sel_rdiv * rowR, Ap_flat], axis=1)       # [N2, 9C + P + 1]
        K_big = jnp.concatenate([KA, KA3, KD, UK, tK], axis=0)
        Z = mm(M_big, K_big)

        # bias + LeakyReLU
        Z = Z + b_ref[...].astype(f32)
        Z = jnp.where(Z > 0, Z, negslope * Z)
        out_ref[0] = Z.astype(out_ref.dtype)


def risi18_level_fused_raw(state_cm, nbr, xsel, radj, K, b,
                           negslope=0.01, chunk=8, interpret=False,
                           precision=None):
    """Fused SMP level step.  Returns [V, P*P, Cout] (rows (p1 p2)).

    state_cm: [V+1, P+1, C*(P+1)]  previous level state, CHANNEL-MAJOR
              ([v, q1, c*(P+1)+q2] = state[v, q1, q2, c]), spatially
              zero-padded, with a zero row at vertex index V (the
              neighbor-id sentinel).
    nbr:      [V, P] int32 neighbor ids (sentinel V).
    xsel:     [V, P*P, P+1] one-hot position selectors (all-zero rows at
              absent slots; sentinel position P selects the zero pad).
    radj:     [V, P, P] float32 reduced adjacency.
    K:        [18C, Cout];  b: [Cout].
    """
    V, P = nbr.shape
    C = state_cm.shape[2] // (P + 1)
    Cout = K.shape[1]
    N2 = P * P
    dt = state_cm.dtype
    # chunk size: largest power-of-two divisor of C, capped at `chunk`
    G = 1
    while G * 2 <= chunk and C % (G * 2) == 0:
        G *= 2
    consts = _consts(P, C)
    const_args = [jnp.asarray(consts[n]) for n in _CONST_NAMES]
    from graphflow_tpu.ops.risi_pallas import _group_K
    K137, KB, KC, KD = _group_K(K, C)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda v, i, nref: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(V, P),
        in_specs=[
            pl.BlockSpec((1, P + 1, C * (P + 1)),
                         lambda v, i, nref: (nref[v * P + i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P * P, P + 1),
                         lambda v, i, nref: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda v, i, nref: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed((3 * C, Cout)),
            fixed((4 * C, Cout)),
            fixed((4 * C, Cout)),
            fixed((7 * C, Cout)),
            fixed((1, Cout)),
        ] + [fixed(consts[n].shape) for n in _CONST_NAMES],
        out_specs=pl.BlockSpec((1, N2, Cout), lambda v, i, nref: (v, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((P, P * C), jnp.float32),   # acc   [b, (c p2)]
            pltpu.VMEM((P, P * C), jnp.float32),   # accR
            pltpu.VMEM((N2, C), jnp.float32),      # rowsum  (T_ab)
            pltpu.VMEM((N2, C), jnp.float32),      # rowsumR (M6)
            pltpu.VMEM((N2, C), jnp.float32),      # diag    (D_bc)
            pltpu.VMEM((N2, C), jnp.float32),      # coli    (V_ac)
        ],
    )

    if precision is None:
        # DEFAULT matches the precision the XLA einsum path uses on TPU
        # (bf16-level MXU passes) at ~2x the speed of HIGHEST; pass
        # precision=jax.lax.Precision.HIGHEST for strict-f32 accumulation.
        precision = jax.lax.Precision.DEFAULT
    kernel = functools.partial(_kernel, P=P, C=C, G=G, Cout=Cout,
                               negslope=negslope, precision=precision)
    flops = 2 * V * P * (P * (P + 1) * (P + 1) * C      # row align
                         + (C // G) * P * G * G * (P + 1) * P   # col align
                         + P * P * C * 4 * C)           # primitives
    flops += 2 * V * N2 * (11 * C * Cout + 2 * N2 * C)  # assembly
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((V, N2, Cout), dt),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=V * P * (P + 1) * (P + 1) * C * dt.itemsize
            + V * N2 * Cout * dt.itemsize,
            transcendentals=0,
        ),
    )(nbr.reshape(V * P), state_cm, xsel, radj, K137, KB, KC, KD,
      b.reshape(1, Cout), *const_args)
    return out


def pack_state_cm(state, vmask=None):
    """[V, P, P, C] level state -> [V+1, P+1, C*(P+1)] channel-major
    padded input for the fused kernel (one cheap XLA transpose)."""
    V, P, _, C = state.shape
    sp = jnp.pad(state, ((0, 1), (0, 1), (0, 1), (0, 0)))  # [V+1,P+1,P+1,C]
    return sp.transpose(0, 1, 3, 2).reshape(V + 1, P + 1, C * (P + 1))


def build_xsel(pos, dtype=jnp.float32):
    """[V, P, P] int position maps -> [V, P*P, P+1] one-hot selectors
    (one [(slot, p1), q] block per vertex)."""
    V, P, _ = pos.shape
    sel = (pos[..., None] == jnp.arange(P + 1)).astype(dtype)
    return sel.reshape(V, P * P, P + 1)


# ----------------------------------------------------------------------
# v3: per-vertex grid + manual double-buffered neighbor DMA.
# ----------------------------------------------------------------------
#
# The v2 kernel (grid (V, P)) is OP-ISSUE bound: 4096 grid steps x ~35
# small Mosaic ops (docs/KERNEL_NOTES.md "Bottleneck analysis").  v3 runs
# ONE grid step per vertex: the P neighbor blocks are fetched with
# explicit double-buffered async copies (indices from scalar prefetch),
# the per-slot work shrinks to just the two alignment matmul groups, and
# every per-slot reduction (row sums, diagonals, column slices, weighted
# sums, slot accumulators) becomes ONE batched matmul over the
# row-stacked [N2, PC] aligned tensor — including a 4-fold column-stacked
# masked pass whose output is 4C=128 lanes wide (full MXU lane
# utilization, vs 25% at C=32).


def _consts_v3(P: int, C: int, G: int = 8, dtype=np.float32):
    """Host constants for the v3 kernel (row layout (a b) = (slot, p1),
    column layout (c p2) C-major)."""
    base = _consts(P, C, dtype)
    N2, PC = P * P, P * C
    r = np.arange(N2)
    p = np.arange(PC)
    # [(a b), (c p2)] masks for the batched primitive pass:
    #   dmask: p1 == p2   (diagonal, D_bc)
    #   imask: p2 == a    (column-a slice, V_ac)
    dmask = (r[:, None] % P == p[None, :] % P).astype(dtype)
    imask = (r[:, None] // P == p[None, :] % P).astype(dtype)
    base["dmask_big"] = dmask
    base["imask_big"] = imask
    # [4 PC, 4C] block-diagonal Mrow for the one fused primitive matmul
    Mrow = base["Mrow"]
    Mrow4 = np.zeros((4 * PC, 4 * C), dtype)
    for k in range(4):
        Mrow4[k * PC:(k + 1) * PC, k * C:(k + 1) * C] = Mrow
    base["Mrow4"] = Mrow4
    # [P, PC] expander: R_col[p] -> columns with p2 == p (for the M6 mask)
    base["SrepP"] = (np.arange(P)[:, None] == p[None, :] % P).astype(dtype)
    # 3-op per-slot kron build: DG = I_G (x) Xsel^T as
    # (tileR @ Xsel^T @ tileC) * kmask — replaces the 12-op in-kernel
    # concat-doubling (_blockdiag_kron); the grid is op-issue bound, so
    # per-slot op count is the cost that matters (docs/KERNEL_NOTES.md).
    # (The backward keeps the concat-doubling build — it is MXU-dense, so
    # no backward-twin constants are needed.)
    Q = P + 1
    base["tileR"] = np.tile(np.eye(Q, dtype=dtype), (G, 1))    # [GQ, Q]
    base["tileC"] = np.tile(np.eye(P, dtype=dtype), (1, G))    # [P, GP]
    gq = np.arange(G * Q) // Q
    gp = np.arange(G * P) // P
    base["kmask"] = (gq[:, None] == gp[None, :]).astype(dtype)  # [GQ, GP]
    return base


_CONST_NAMES_V3 = ("Mrow4", "dmask_big", "imask_big", "SrepP", "mask_cb2",
                   "Sa", "Sb", "sel_rdiv", "sel_rmod", "selrdivT",
                   "selrmodT", "blockdiag", "crossdiag", "Pswap",
                   "dmaskT", "eyeP", "Mrow",
                   "tileR", "tileC", "kmask")


def _v3_quantities(T2all, Ap, cr, P, C, mm):
    """All T-reductions + assembly inputs from the row-stacked aligned
    tensor (shared by the v3 forward and the fused-training backward).

    cr: dict of const REFS (read lazily).  Returns a dict of everything
    the assembly and its adjoint need.
    """
    f32 = jnp.float32
    N2, PC = P * P, P * C
    onesP = jnp.ones((P, 1), f32)
    ones_row = jnp.ones((1, N2), f32)
    R_col = mm(Ap, onesP)                          # [P, 1]

    Rcw = mm(R_col.T, cr["SrepP"][...])            # [1, PC]: R[p2]
    dmask_big = cr["dmask_big"][...]
    imask_big = cr["imask_big"][...]
    Tstack = jnp.concatenate(
        [T2all, T2all * dmask_big, T2all * imask_big,
         T2all * Rcw], axis=1)                     # [N2, 4 PC]
    prims = mm(Tstack, cr["Mrow4"][...])           # [N2, 4C]
    T_ab = prims[:, 0:C]                           # sum_c T[a,b,c,f]
    D_bc = prims[:, C:2 * C]                       # T[a,b,b,f]
    V_ac = prims[:, 2 * C:3 * C]                   # T[a,b,a,f]
    M6 = prims[:, 3 * C:4 * C]                     # sum_c R[c] T (case 6)

    sel_rdiv, sel_rmod = cr["sel_rdiv"][...], cr["sel_rmod"][...]
    rowRdiv = mm(sel_rdiv, R_col)                  # [N2, 1] = R[a]
    acc2in = jnp.concatenate([T2all, T2all * rowRdiv], axis=1)  # [N2, 2PC]
    Sb = cr["Sb"][...]
    acc2 = mm(Sb, acc2in)                          # [P, 2PC]: [acc | accR]

    Sa = cr["Sa"][...]
    mask_cb2 = cr["mask_cb2"][...]
    dmaskT, Mrow = cr["dmaskT"][...], cr["Mrow"][...]
    Pswap = cr["Pswap"][...]
    S_adj = jnp.sum(Ap)
    trA = jnp.sum(Ap * cr["eyeP"][...])

    Y2 = mm(sel_rdiv, acc2) * mask_cb2             # [N2, 2 PC]
    T_bc = mm(Y2[:, :PC], Mrow)                    # case base (3/13)
    M10 = mm(Y2[:, PC:], Mrow)                     # case 10

    T_a = mm(Sa, T_ab)                             # [P, C]
    T_b = mm(Sb, T_ab)
    Tdiag_bc_a = mm(Sa, D_bc)
    D_ac_b = mm(Sb, V_ac)
    T_full = mm(ones_row, T_ab)                    # [1, C]
    s14 = mm(dmaskT, T_ab)
    s15 = mm(ones_row, D_bc)
    t18 = mm(dmaskT, D_bc)
    W17 = mm(Pswap, V_ac)                          # [(b e), f] T[e,b,e]

    Mid = mm(sel_rmod, Ap)                         # [N2, P]: Ap[r%P, e]
    E9 = mm(Mid, cr["selrmodT"][...]) * cr["blockdiag"][...]
    E12 = mm(Mid, cr["selrdivT"][...]) * cr["crossdiag"][...]
    E9out = mm(E9, jnp.concatenate(
        [T_ab, T_bc, D_bc, W17], axis=1))          # [M9|M13|M16|M17]
    M12 = mm(E12, T_ab)

    U = jnp.concatenate([T_a, T_b, Tdiag_bc_a, D_ac_b], axis=1)
    t_cat = jnp.concatenate([T_full, s14, s15, t18], axis=1)
    Gsel = mm(sel_rdiv, Ap)                        # [N2, P]
    Ap_flat = mm(Gsel * sel_rmod, onesP)           # [N2, 1] = Ap[x, y]
    rowR = mm(sel_rmod, R_col)                     # [N2, 1] = R[y]

    M_big = jnp.concatenate(
        [T_ab, T_bc, M6, M10, M12, E9out,
         sel_rdiv * rowR, Ap_flat], axis=1)        # [N2, 9C + P + 1]
    return dict(M_big=M_big, U=U, t_cat=t_cat, E9=E9, E12=E12,
                S_adj=S_adj, trA=trA, R_col=R_col, Rcw=Rcw,
                rowRdiv=rowRdiv, dmask_big=dmask_big, imask_big=imask_big,
                sel_rdiv=sel_rdiv, Sb=Sb, Sa=Sa, Pswap=Pswap,
                mask_cb2=mask_cb2, Mrow=Mrow, dmaskT=dmaskT,
                ones_row=ones_row)


def _v3_kbig(q, K137, KB, KC, KD, C, mm):
    """Runtime right-hand factor of the fused assembly matmul."""
    KA = q["S_adj"] * K137[0:C] + q["trA"] * K137[C:2 * C]   # cases 1, 7
    KA3 = q["S_adj"] * K137[2 * C:3 * C]                     # case 3
    UK = mm(q["U"], KB)                                      # [P, Cout]
    tK = mm(q["t_cat"], KC)                                  # [1, Cout]
    return jnp.concatenate([KA, KA3, KD, UK, tK], axis=0)


def _kernel_v3(nbr_ref,                           # scalar prefetch [V*P]
               state_hbm, xsel_ref, radj_ref,
               K137_ref, KB_ref, KC_ref, KD_ref, b_ref,
               Mrow4_ref, dmask_big_ref, imask_big_ref, SrepP_ref,
               mask_cb2_ref, Sa_ref, Sb_ref, sel_rdiv_ref, sel_rmod_ref,
               selrdivT_ref, selrmodT_ref, blockdiag_ref, crossdiag_ref,
               Pswap_ref, dmaskT_ref, eyeP_ref, Mrow_ref,
               tileR_ref, tileC_ref, kmask_ref,
               out_ref,
               buf, sem,
               *, P, C, G, Cout, negslope, precision, t2_ref=None,
               ablate=()):
    f32 = jnp.float32
    v = pl.program_id(0)
    N2, PC = P * P, P * C

    def mm(x, y):
        return jnp.dot(x, y, preferred_element_type=f32,
                       precision=precision)

    NBUF = 4  # DMA pipeline depth (2 was measured to leave ~0.87 ms of
    #           transfer latency un-hidden on the critical path at
    #           V=256 P=16 C=32 — tools/ablate_v3.py full-vs-nodma)

    def fetch(slot, i):
        return pltpu.make_async_copy(
            state_hbm.at[nbr_ref[v * P + i]], buf.at[slot], sem.at[slot])

    if "nodma" not in ablate:
        for i0 in range(min(NBUF - 1, P)):
            fetch(i0 % NBUF, i0).start()

    # ---- per-vertex setup -------------------------------------------------
    Ap_raw = radj_ref[0]
    Ap = jnp.where(Ap_raw > 0, Ap_raw, jnp.zeros_like(Ap_raw)).astype(f32)
    Xsel_all = xsel_ref[0]                         # [(i p1), Q8]

    # ---- per-slot: align only; everything else is batched after ----------
    # The state blocks arrive tile-padded ([Q8, F128]); the zero pad rows/
    # columns fall out of the matmuls (Xsel has zero columns there).
    T2s = []
    QG = G * (P + 1)
    tileR = tileR_ref[...]                         # [G(P+1), P+1]
    tileC = tileC_ref[...]                         # [P, GP]
    kmask = kmask_ref[...]                         # [G(P+1), GP]
    for i in range(P):
        slot = i % NBUF
        if "nodma" not in ablate:
            if i + NBUF - 1 < P:
                fetch((i + NBUF - 1) % NBUF, i + NBUF - 1).start()
            fetch(slot, i).wait()
            F = buf[slot]                          # [Q8, (c q2)+pad] c-major
        else:
            F = buf[0]
        if "noalign" in ablate:
            T2s.append(F[:P, :PC].astype(f32))
            continue
        if "nocol" in ablate:
            Xsel = Xsel_all[i * P:(i + 1) * P, :].astype(F.dtype)
            T2s.append(mm(Xsel, F)[:, :PC])
            continue
        Xsel = Xsel_all[i * P:(i + 1) * P, :].astype(F.dtype)
        A = mm(Xsel, F)                            # [P, (c q2)+pad]
        # DG = I_G (x) Xsel^T in 3 ops (kernel is op-issue bound):
        # contract tileR's Q axis against Xsel's Q axis (no transpose op).
        tiled = jax.lax.dot_general(
            tileR, Xsel[:, :P + 1].astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=precision)  # [G(P+1), P]
        DG = mm(tiled, tileC) * kmask              # [G(P+1), GP]
        chunks = [mm(A[:, k * QG:(k + 1) * QG], DG.astype(A.dtype))
                  for k in range(C // G)]
        T2s.append(jnp.concatenate(chunks, axis=1))  # [P, (c p2)] f32

    T2all = jnp.concatenate(T2s, axis=0)           # [(a b) = (i p1), PC]
    if t2_ref is not None:
        t2_ref[0] = T2all.astype(t2_ref.dtype)

    if "noassemble" in ablate:
        # cheapest possible consumer so alignment+DMA cost is isolated
        ones = jnp.ones((PC, Cout), f32)
        Zq = mm(mm(Sb_ref[...], T2all), ones)       # [P, Cout]
        out_ref[0] = jnp.concatenate([Zq] * P, axis=0).astype(out_ref.dtype)
        return

    cr = {"Mrow4": Mrow4_ref, "dmask_big": dmask_big_ref,
          "imask_big": imask_big_ref, "SrepP": SrepP_ref,
          "mask_cb2": mask_cb2_ref, "Sa": Sa_ref, "Sb": Sb_ref,
          "sel_rdiv": sel_rdiv_ref, "sel_rmod": sel_rmod_ref,
          "selrdivT": selrdivT_ref, "selrmodT": selrmodT_ref,
          "blockdiag": blockdiag_ref, "crossdiag": crossdiag_ref,
          "Pswap": Pswap_ref, "dmaskT": dmaskT_ref, "eyeP": eyeP_ref,
          "Mrow": Mrow_ref}
    q = _v3_quantities(T2all, Ap, cr, P, C, mm)
    K_big = _v3_kbig(q, K137_ref[...].astype(f32), KB_ref[...].astype(f32),
                     KC_ref[...].astype(f32), KD_ref[...].astype(f32),
                     C, mm)
    Z = mm(q["M_big"], K_big)

    Z = Z + b_ref[...].astype(f32)
    Z = jnp.where(Z > 0, Z, negslope * Z)
    out_ref[0] = Z.astype(out_ref.dtype)


def _v3_compiler_params(P, C, Cout, dt):
    """Mosaic's default scoped-VMEM stack limit is 16 MiB; the v3 kernel's
    in-VMEM intermediates scale ~linearly with C and overflow it at C=128
    (measured: 19.25M requested).  Raise the limit only for wide channels
    so the tuned C<=64 configurations keep their default compilation."""
    if C >= 128:
        return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return None


def risi18_level_fused_v3_raw(state_cm, nbr, xsel, radj, K, b,
                              negslope=0.01, chunk=8, interpret=False,
                              precision=None, save_t2=False, ablate=()):
    """Per-vertex-grid fused level step (v3).  Same contract as
    :func:`risi18_level_fused_raw`; grid (V,) with manual double-buffered
    neighbor DMA instead of grid (V, P) with BlockSpec pipelining.

    ``save_t2=True`` additionally emits the row-stacked aligned tensor
    T2all [V, P*P, P*C] (the training path's residual: the backward kernel
    consumes it instead of re-running the gather+alignment)."""
    V, P = nbr.shape
    C = state_cm.shape[2] // (P + 1)
    Cout = K.shape[1]
    N2 = P * P
    dt = state_cm.dtype
    G = 1
    while G * 2 <= chunk and C % (G * 2) == 0:
        G *= 2
    consts = _consts_v3(P, C, G)
    const_args = [jnp.asarray(consts[n]) for n in _CONST_NAMES_V3]
    from graphflow_tpu.ops.risi_pallas import _group_K
    K137, KB, KC, KD = _group_K(K, C)

    # Mosaic DMA slices must be tile-aligned: pad the per-vertex block to
    # (sublane, lane 128) multiples — sublane tile is 8 rows for f32,
    # 16 for bf16.  state_cm is only ~V (P C^2) bytes (not T-sized), so
    # the XLA pad is cheap; zero pad rows/cols are inert.
    # (max(1, .) keeps wider dtypes, e.g. float64 in interpret-mode tests,
    # from dividing by zero; the compiled kernel only sees f32/bf16.)
    sub = 8 * max(1, 4 // dt.itemsize)
    Q8 = -(-(P + 1) // sub) * sub
    F128 = -(-(C * (P + 1)) // 128) * 128
    state_cm = jnp.pad(state_cm, ((0, 0), (0, Q8 - (P + 1)),
                                  (0, F128 - C * (P + 1))))
    xsel = jnp.pad(xsel, ((0, 0), (0, 0), (0, Q8 - (P + 1))))

    def fixed(shape):
        return pl.BlockSpec(shape, lambda v, nref: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def make_grid_spec(out_specs):
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(V,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # state stays in HBM
                pl.BlockSpec((1, P * P, Q8), lambda v, nref: (v, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, P), lambda v, nref: (v, 0, 0),
                             memory_space=pltpu.VMEM),
                fixed((3 * C, Cout)),
                fixed((4 * C, Cout)),
                fixed((4 * C, Cout)),
                fixed((7 * C, Cout)),
                fixed((1, Cout)),
            ] + [fixed(consts[n].shape) for n in _CONST_NAMES_V3],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((4, Q8, F128), dt),         # 4-deep DMA pipeline
                pltpu.SemaphoreType.DMA((4,)),
            ],
        )

    grid_spec = make_grid_spec(
        pl.BlockSpec((1, N2, Cout), lambda v, nref: (v, 0, 0),
                     memory_space=pltpu.VMEM))

    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    flops = 2 * V * P * (P * (P + 1) * (P + 1) * C        # row align
                         + (C // G) * P * G * G * (P + 1) * P)  # col align
    # batched primitives (4PC -> 4C), assembly matmuls
    flops += 2 * V * N2 * (16 * P * C + 11 * C * Cout + 2 * N2 * C)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=V * P * (P + 1) * (P + 1) * C * dt.itemsize
        + V * N2 * Cout * dt.itemsize,
        transcendentals=0,
    )
    if save_t2:
        grid_spec = make_grid_spec([
            pl.BlockSpec((1, N2, Cout), lambda v, nref: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N2, P * C), lambda v, nref: (v, 0, 0),
                         memory_space=pltpu.VMEM),
        ])

        def kernel2(*refs):
            # outputs come after inputs: (..., out_ref, t2_ref, buf, sem)
            ins, (o1, o2, buf, sem) = refs[:-4], refs[-4:]
            _kernel_v3(*ins, o1, buf, sem, P=P, C=C, G=G, Cout=Cout,
                       negslope=negslope, precision=precision, t2_ref=o2)

        out, t2 = pl.pallas_call(
            kernel2,
            grid_spec=grid_spec,
            compiler_params=_v3_compiler_params(P, C, Cout, dt),
            interpret=interpret,
            out_shape=[jax.ShapeDtypeStruct((V, N2, Cout), dt),
                       jax.ShapeDtypeStruct((V, N2, P * C), jnp.float32)],
            cost_estimate=cost,
        )(nbr.reshape(V * P), state_cm, xsel, radj, K137, KB, KC, KD,
          b.reshape(1, Cout), *const_args)
        return out, t2

    kernel = functools.partial(_kernel_v3, P=P, C=C, G=G, Cout=Cout,
                               negslope=negslope, precision=precision,
                               ablate=tuple(ablate))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((V, N2, Cout), dt),
        cost_estimate=cost,
        compiler_params=_v3_compiler_params(P, C, Cout, dt),
    )(nbr.reshape(V * P), state_cm, xsel, radj, K137, KB, KC, KD,
      b.reshape(1, Cout), *const_args)
    return out


# ----------------------------------------------------------------------
# v3t: fully fused TRAINING path — Pallas forward (v3 emitting T2all) +
# a Pallas backward that consumes T2all and produces per-slot de-aligned
# gradient blocks + dK in one pass; the cross-vertex scatter-add into
# dstate is one MXU one-hot matmul in XLA.
# ----------------------------------------------------------------------


def _kernel_v3t_bwd(xsel_ref, radj_ref, t2_ref, g_ref,
                    K137_ref, KB_ref, KC_ref, KD_ref,
                    Mrow4_ref, dmask_big_ref, imask_big_ref, SrepP_ref,
                    mask_cb2_ref, Sa_ref, Sb_ref, sel_rdiv_ref, sel_rmod_ref,
                    selrdivT_ref, selrmodT_ref, blockdiag_ref, crossdiag_ref,
                    Pswap_ref, dmaskT_ref, eyeP_ref, Mrow_ref,
                    tileR_ref, tileC_ref, kmask_ref,
                    dF_ref, dK_ref,
                    *, P, C, G, Cout, precision):
    """Adjoint of the v3 assembly: from T2all (saved by the forward) and
    the LeakyReLU-adjusted cotangent geff, emit per-slot de-aligned
    gradient blocks dF[i] = Xsel_i^T (dT2_i dealigned) and accumulate dK
    across the sequential grid.  Mirrors :func:`_v3_quantities` exactly.
    """
    f32 = jnp.float32
    v = pl.program_id(0)
    N2, PC = P * P, P * C
    GP = G * P

    def mm(x, y):
        return jnp.dot(x, y, preferred_element_type=f32,
                       precision=precision)

    Ap_raw = radj_ref[0]
    Ap = jnp.where(Ap_raw > 0, Ap_raw, jnp.zeros_like(Ap_raw)).astype(f32)
    T2all = t2_ref[0].astype(f32)                  # [N2, PC]
    g = g_ref[0].astype(f32)                       # [N2, Cout]
    Xsel_all = xsel_ref[0]                         # [(i p1), Q8]

    cr = {"Mrow4": Mrow4_ref, "dmask_big": dmask_big_ref,
          "imask_big": imask_big_ref, "SrepP": SrepP_ref,
          "mask_cb2": mask_cb2_ref, "Sa": Sa_ref, "Sb": Sb_ref,
          "sel_rdiv": sel_rdiv_ref, "sel_rmod": sel_rmod_ref,
          "selrdivT": selrdivT_ref, "selrmodT": selrmodT_ref,
          "blockdiag": blockdiag_ref, "crossdiag": crossdiag_ref,
          "Pswap": Pswap_ref, "dmaskT": dmaskT_ref, "eyeP": eyeP_ref,
          "Mrow": Mrow_ref}
    q = _v3_quantities(T2all, Ap, cr, P, C, mm)
    K137 = K137_ref[...].astype(f32)
    KB = KB_ref[...].astype(f32)
    KC = KC_ref[...].astype(f32)
    KD = KD_ref[...].astype(f32)
    K_big = _v3_kbig(q, K137, KB, KC, KD, C, mm)

    # ---- both factors of Z = M_big @ K_big depend on T --------------------
    dK_big = mm(q["M_big"].T, g)                   # [9C + P + 1, Cout]
    dM_big = mm(g, K_big.T)                        # [N2, 9C + P + 1]

    dT_ab = dM_big[:, 0:C]
    dT_bc = dM_big[:, C:2 * C]
    dM6 = dM_big[:, 2 * C:3 * C]
    dM10 = dM_big[:, 3 * C:4 * C]
    dM12 = dM_big[:, 4 * C:5 * C]
    dE9g = dM_big[:, 5 * C:9 * C]                  # [dM9|dM13|dM16|dM17]

    dUK = dK_big[9 * C:9 * C + P]                  # [P, Cout]
    dtK = dK_big[9 * C + P:9 * C + P + 1]          # [1, Cout]
    dU = mm(dUK, KB.T)                             # [P, 4C]
    dt = mm(dtK, KC.T)                             # [1, 4C]

    # E9/E12 group adjoints (E9out = E9 @ [T_ab|T_bc|D_bc|W17])
    dE9in = mm(q["E9"].T, dE9g)                    # [N2, 4C]
    dT_ab = dT_ab + dE9in[:, 0:C] + mm(q["E12"].T, dM12)
    dT_bc = dT_bc + dE9in[:, C:2 * C]
    dD_bc = dE9in[:, 2 * C:3 * C]
    dW17 = dE9in[:, 3 * C:4 * C]

    # collapse-family adjoints
    Sa, Sb = q["Sa"], q["Sb"]
    ones_col = q["ones_row"].T                     # [N2, 1]
    dmask_row = q["dmaskT"].T                      # [N2, 1]
    dT_ab = (dT_ab + mm(Sa.T, dU[:, 0:C]) + mm(Sb.T, dU[:, C:2 * C])
             + mm(ones_col, dt[:, 0:C]) + mm(dmask_row, dt[:, C:2 * C]))
    dD_bc = (dD_bc + mm(Sa.T, dU[:, 2 * C:3 * C])
             + mm(ones_col, dt[:, 2 * C:3 * C])
             + mm(dmask_row, dt[:, 3 * C:4 * C]))
    dV_ac = mm(Sb.T, dU[:, 3 * C:4 * C]) + mm(q["Pswap"].T, dW17)

    # T_bc/M10 -> acc2 -> T2all
    Mrow = q["Mrow"]
    mask_cb = q["mask_cb2"][:, :PC]
    dY2 = jnp.concatenate(
        [mm(dT_bc, Mrow.T) * mask_cb, mm(dM10, Mrow.T) * mask_cb], axis=1)
    dacc2 = mm(q["sel_rdiv"].T, dY2)               # [P, 2 PC]
    dT2 = (mm(Sb.T, dacc2[:, :PC])
           + mm(Sb.T, dacc2[:, PC:]) * q["rowRdiv"])

    # primitives adjoint: one wide matmul, mask the four column blocks
    dprims = jnp.concatenate([dT_ab, dD_bc, dV_ac, dM6], axis=1)  # [N2, 4C]
    dTstack = mm(dprims, Mrow4_ref[...].T)         # [N2, 4 PC]
    dT2 = (dT2 + dTstack[:, 0:PC]
           + dTstack[:, PC:2 * PC] * q["dmask_big"]
           + dTstack[:, 2 * PC:3 * PC] * q["imask_big"]
           + dTstack[:, 3 * PC:4 * PC] * q["Rcw"])

    # ---- per-slot de-alignment: dF_i = Xsel_i^T (dT2_i @ DG_i^T) ----------
    # Unlike the forward, the concat-doubling kron build is FASTER here:
    # the backward is MXU-dense, so the VPU concats overlap with matmuls
    # while the 3-matmul build (forward style) contends for the MXU
    # (measured: 7.78 ms vs 7.06 ms train level with the matmul build).
    for i in range(P):
        Xsel = Xsel_all[i * P:(i + 1) * P, :P + 1].astype(f32)
        DG_T = _blockdiag_kron(Xsel, G)            # [GP, G(P+1)] = DG^T
        dT2_i = dT2[i * P:(i + 1) * P, :]
        chunks = [mm(dT2_i[:, k * GP:(k + 1) * GP], DG_T)
                  for k in range(C // G)]
        dA = jnp.concatenate(chunks, axis=1)       # [P, (c q2)]
        dF_ref[i] = mm(Xsel.T, dA).astype(dF_ref.dtype)  # [P+1, (c q2)]

    # ---- dK in reference case order, accumulated over the grid ------------
    dKA = dK_big[0:C]
    dK1 = q["S_adj"] * dKA
    dK7 = q["trA"] * dKA
    dK3 = q["S_adj"] * dK_big[C:2 * C]
    dKDs = dK_big[2 * C:9 * C]       # KD order: cases 6,10,12,9,13,16,17
    dKB4 = mm(q["U"].T, dUK)         # cases 2, 4, 8, 11
    dKC4 = mm(q["t_cat"].T, dtK)     # cases 5, 14, 15, 18
    dK_full = jnp.concatenate([
        dK1,                         # 1
        dKB4[0:C],                   # 2
        dK3,                         # 3
        dKB4[C:2 * C],               # 4
        dKC4[0:C],                   # 5
        dKDs[0:C],                   # 6
        dK7,                         # 7
        dKB4[2 * C:3 * C],           # 8
        dKDs[3 * C:4 * C],           # 9
        dKDs[C:2 * C],               # 10
        dKB4[3 * C:4 * C],           # 11
        dKDs[2 * C:3 * C],           # 12
        dKDs[4 * C:5 * C],           # 13
        dKC4[C:2 * C],               # 14
        dKC4[2 * C:3 * C],           # 15
        dKDs[5 * C:6 * C],           # 16
        dKDs[6 * C:7 * C],           # 17
        dKC4[3 * C:4 * C],           # 18
    ], axis=0)

    @pl.when(v == 0)
    def _():
        dK_ref[...] = jnp.zeros_like(dK_ref)

    dK_ref[...] += dK_full


def risi18_level_v3t_bwd_raw(t2, xsel, radj, K, geff, chunk=8,
                             interpret=False, precision=None):
    """Run the backward kernel.  Returns (dF [(V P), P+1, (P+1)C],
    dK [18C, Cout])."""
    V, N2, PC = t2.shape
    P = int(round(N2 ** 0.5))
    C = PC // P
    Cout = K.shape[1]
    Q8 = xsel.shape[2]
    G = 1
    while G * 2 <= chunk and C % (G * 2) == 0:
        G *= 2
    consts = _consts_v3(P, C, G)
    const_args = [jnp.asarray(consts[n]) for n in _CONST_NAMES_V3]
    from graphflow_tpu.ops.risi_pallas import _group_K
    K137, KB, KC, KD = _group_K(K, C)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda v: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(V,),
        in_specs=[
            pl.BlockSpec((1, N2, Q8), lambda v: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda v: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N2, PC), lambda v: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N2, Cout), lambda v: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed((3 * C, Cout)),
            fixed((4 * C, Cout)),
            fixed((4 * C, Cout)),
            fixed((7 * C, Cout)),
        ] + [fixed(consts[n].shape) for n in _CONST_NAMES_V3],
        out_specs=[
            pl.BlockSpec((P, P + 1, (P + 1) * C), lambda v: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed((18 * C, Cout)),
        ],
    )

    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    kernel = functools.partial(_kernel_v3t_bwd, P=P, C=C, G=G, Cout=Cout,
                               precision=precision)
    dF, dK = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=_v3_compiler_params(P, C, Cout, jnp.float32),
        out_shape=[jax.ShapeDtypeStruct((V * P, P + 1, (P + 1) * C),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((18 * C, Cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * V * N2 * (40 * P * C + 30 * C * Cout + 4 * N2 * C),
            bytes_accessed=t2.nbytes + geff.nbytes
            + V * P * (P + 1) * (P + 1) * C * 4 + K.nbytes,
            transcendentals=0,
        ),
    )(xsel, radj, t2, geff, K137, KB, KC, KD, *const_args)
    return dF, dK


def unpack_state_cm(dcm, V, P, C):
    """Inverse of :func:`pack_state_cm` for gradients: [V+1, P+1, C*(P+1)]
    channel-major -> [V, P, P, C] (pad rows/cols dropped)."""
    d4 = dcm.reshape(dcm.shape[0], P + 1, C, P + 1).transpose(0, 1, 3, 2)
    return d4[:V, :P, :P, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def risi18_level_train(state, nbr, pos, radj, K, b, negslope=0.01):
    """Fused level step with PALLAS kernels in BOTH directions.

    Forward: the v3 per-vertex kernel (emitting the aligned T2all as the
    backward's residual — no gather/alignment recompute).  Backward: one
    Pallas pass from T2all + the cotangent to per-slot de-aligned gradient
    blocks + dK; the cross-vertex scatter-add into dstate is a single
    one-hot MXU matmul (TPU scatters are the slow path, see
    docs/KERNEL_NOTES.md).  f32 path; graph structure non-differentiable.
    """
    state_cm = pack_state_cm(state)
    xsel = build_xsel(pos, state.dtype)
    out, _ = risi18_level_fused_v3_raw(state_cm, nbr, xsel,
                                       radj.astype(jnp.float32), K, b,
                                       negslope=negslope, save_t2=True)
    return out


def _v3t_fwd(state, nbr, pos, radj, K, b, negslope):
    state_cm = pack_state_cm(state)
    xsel = build_xsel(pos, state.dtype)
    out, t2 = risi18_level_fused_v3_raw(state_cm, nbr, xsel,
                                        radj.astype(jnp.float32), K, b,
                                        negslope=negslope, save_t2=True)
    return out, (nbr, pos, radj, K, t2, out)


def _v3t_bwd(negslope, res, g):
    nbr, pos, radj, K, t2, out = res
    V, P = nbr.shape
    dt = out.dtype
    C = t2.shape[2] // P
    geff = (g * jnp.where(out > 0, 1.0, negslope)).astype(jnp.float32)
    xsel = build_xsel(pos, jnp.float32)
    Q8 = -(-(P + 1) // 8) * 8
    xsel = jnp.pad(xsel, ((0, 0), (0, 0), (0, Q8 - (P + 1))))
    dF, dK = risi18_level_v3t_bwd_raw(t2, xsel, radj.astype(jnp.float32),
                                      K, geff)
    # Cross-vertex scatter-add as a one-hot matmul over flattened blocks.
    onehot = (nbr.reshape(-1)[:, None] == jnp.arange(V + 1)
              ).astype(jnp.float32)                     # [V P, V+1]
    QC = (P + 1) * (P + 1) * C
    dcm = jnp.einsum("nu,nf->uf", onehot, dF.reshape(V * P, QC),
                     preferred_element_type=jnp.float32)
    dstate = unpack_state_cm(dcm.reshape(V + 1, P + 1, (P + 1) * C),
                             V, P, C).astype(dt)
    db = geff.sum(axis=(0, 1)).astype(K.dtype)
    return dstate, None, None, None, dK.astype(K.dtype), db


risi18_level_train.defvjp(_v3t_fwd, _v3t_bwd)


# ----------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, einsum-composition backward.
# ----------------------------------------------------------------------

def _reference_level(state, nbr, pos, radj, K, b, negslope=0.01):
    """The exact same level step composed from XLA ops (for VJP/tests)."""
    from graphflow_tpu.models.smp2d import _gather_neighbor_tensors
    from graphflow_tpu.ops.contractions import risi_contraction_18

    V, P, _, C = state.shape
    state_pad = jnp.pad(state, ((0, 0), (0, 1), (0, 1), (0, 0)))
    T = _gather_neighbor_tensors(state_pad, nbr, pos)
    Y = jax.vmap(risi_contraction_18)(T, radj)
    Z = Y.reshape(V, P * P, 18 * C) @ K + b[None, None, :]
    # Cast to the state dtype: for bf16 states the f32-accumulating
    # contraction promotes Z, but the Pallas forward emits state.dtype —
    # the custom_vjp cotangent dtypes must agree.
    return jnp.where(Z > 0, Z, negslope * Z).astype(state.dtype)


def risi18_aligned_t2(state, nbr, pos):
    """Pallas-aligned neighbor tensor T [V, P, P, P, C] for the 10/50-case
    banks (VERDICT r4 item 4): runs the v3 kernel's DMA + alignment
    front-end only (``ablate=("noassemble",)`` + ``save_t2``) and exposes
    T2all [V, (i p1), (c p2)] as a lazily-transposed T view that XLA fuses
    into the consuming contraction.

    Measured on-chip at V=256 P=16 C=32 f32 (bit-exact vs the take-gather
    path): ver6 level 5.09 -> 4.04 ms (1.26x), ver7 10.35 -> 8.89 ms
    (1.16x) — the XLA take-gather was the dominant fixed cost of the
    unfused levels.  INFERENCE ONLY: the raw pallas_call has no VJP;
    training keeps the take-gather path (XLA's native scatter adjoint).
    """
    V, P = nbr.shape
    C = state.shape[-1]
    dt = state.dtype
    zero_K = jnp.zeros((18 * C, C), dt)
    zero_b = jnp.zeros((C,), dt)
    _, t2 = risi18_level_fused_v3_raw(
        pack_state_cm(state), nbr, build_xsel(pos, dt), radj_dummy(V, P, dt),
        zero_K, zero_b, save_t2=True, ablate=("noassemble",))
    return t2.reshape(V, P, P, C, P).transpose(0, 1, 2, 4, 3)


def radj_dummy(V, P, dt):
    """Zero adjacency operand for alignment-only kernel runs."""
    return jnp.zeros((V, P, P), dt)



@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def risi18_level(state, nbr, pos, radj, K, b, negslope=0.01):
    """Differentiable fused level step: [V,P,P,C] state -> [V, P*P, Cout].

    Pallas forward (gather-fused, single HBM pass; the v3 per-vertex-grid
    kernel — 2.95 ms vs 4.28 ms for the v2 (V, P)-grid at production
    shapes, measured on-chip), exact XLA-composition backward.
    nbr/pos/radj are non-differentiable graph structure.

    v3 slices per-slot values at sublane offsets i*P, which Mosaic only
    supports tile-aligned (8 rows f32, 16 rows bf16) — for smaller
    receptive fields the v2 (V, P)-grid kernel runs instead.
    """
    state_cm = pack_state_cm(state)
    xsel = build_xsel(pos, state.dtype)
    sub = 8 * max(1, 4 // state.dtype.itemsize)
    raw = (risi18_level_fused_v3_raw if nbr.shape[1] % sub == 0
           else risi18_level_fused_raw)
    return raw(state_cm, nbr, xsel, radj.astype(jnp.float32), K, b,
               negslope=negslope)


def _fwd(state, nbr, pos, radj, K, b, negslope):
    return risi18_level(state, nbr, pos, radj, K, b, negslope), (
        state, nbr, pos, radj, K, b)


def _bwd(negslope, res, g):
    state, nbr, pos, radj, K, b = res
    _, vjp = jax.vjp(
        lambda s, k, bb: _reference_level(s, nbr, pos, radj, k, bb,
                                          negslope), state, K, b)
    ds, dK, db = vjp(g)
    return ds, None, None, None, dK, db


risi18_level.defvjp(_fwd, _bwd)
