"""Pallas TPU kernel: single-pass fused RisiContraction_18 + channel matmul.

Motivation (measured on-chip): the XLA einsum formulation reads the stacked
tensor T[B, P, P, P, C] from HBM once per distinct reduction pattern and
materializes the [P, P, 18C] bank before the channel matmul.  This kernel
streams each vertex's T block through VMEM, computes every
reduction/diagonal/case-map on chip, and writes only the final
[P, P, Cout] block.

Mosaic (TPU Pallas) supports a restricted op set — no gathers, no
minor-dim-splitting reshapes, 2-D matmuls only (probed empirically).  The
kernel works in ONE fixed 2-D layout of T (a free reshape on the host):

    X_ab [(a b), (c f)]

Quantities that naturally live in the transposed [(b c), (a f)] layout
(cases 3/10/13/17) are derived IN-KERNEL from X_ab by constant row-select
+ column-mask matmuls, so T crosses HBM exactly once (the earlier
two-layout variant paid a full extra read *and* an XLA transpose
materialization of T — dominant at these shapes since the layer is
HBM-bound, docs/KERNEL_NOTES.md).

Every reduction is expressed as (mask (*) X) @ S for CONSTANT
selector/mask matrices (built host-side once and passed as resident VMEM
operands, keeping Mosaic compile time sane), and the adjacency-contracted
case maps as matmuls with Kronecker-structured matrices tiled from A' by
concat-doubling in-kernel:

    E9  [(x d), (x' e)] = delta(x,x') A'[d,e]      (cases 9/13/16/17)
    E12 [(b d), (e b')] = A'[d,e] delta(b,b')      (case 12)

All 18 cases land in ONE row layout [(x y), f'] and the whole layer is a
chain of MXU matmuls.  Math identical to
``graphflow_tpu.ops.fused.risi18_matmul_fused`` (parity-tested).

Autodiff: custom_vjp with the einsum implementation as the exact backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphflow_tpu.ops.fused import risi18_matmul_fused


def _constants(P: int, C: int, dtype=np.float32):
    """Host-built constant selector/mask matrices for the kernel."""
    N2, PC = P * P, P * C
    r = np.arange(N2)
    qpc = np.arange(PC)

    consts = {
        # [(c f), f']: sum over c keeping f
        "S": (qpc[:, None] % C == np.arange(C)[None, :]).astype(dtype),
        # [P, N2]: collapse rows keeping major / minor index
        "Sa": (np.arange(P)[:, None] == r[None, :] // P).astype(dtype),
        "Sb": (np.arange(P)[:, None] == r[None, :] % P).astype(dtype),
        # [N2, P]: row-index selectors
        "sel_rdiv": (r[:, None] // P == np.arange(P)[None, :]).astype(dtype),
        "sel_rmod": (r[:, None] % P == np.arange(P)[None, :]).astype(dtype),
        # [N2, N2] Kronecker masks
        "blockdiag": (r[:, None] // P == np.arange(N2)[None, :] // P
                      ).astype(dtype),
        "crossdiag": (r[:, None] // P == np.arange(N2)[None, :] % P
                      ).astype(dtype),
        # [N2, PC] column-vs-row masks
        "mask_cb": (qpc[None, :] // C == r[:, None] % P).astype(dtype),
        "mask_ca": (qpc[None, :] // C == r[:, None] // P).astype(dtype),
        # [N2, 1]: rows with x == y
        "dmask_row": (r // P == r % P).astype(dtype)[:, None],
        # [P, PC]: expand per-c weights to (c f) columns
        "Srep": (np.arange(P)[:, None] == qpc[None, :] // C).astype(dtype),
        # [P, N2]: expand per-e to q//P columns (for E12 construction)
        "Sexp": (np.arange(P)[:, None] == np.arange(N2)[None, :] // P
                 ).astype(dtype),
    }
    return consts


_CONST_NAMES = ("S", "Sa", "Sb", "sel_rdiv", "sel_rmod", "blockdiag",
                "crossdiag", "mask_cb", "mask_ca", "dmask_row", "Srep",
                "Sexp")


def _tile_concat(x, times_rows: int, times_cols: int):
    """jnp.tile via concat-doubling (Mosaic-safe)."""
    def dbl(v, n, axis):
        out = v
        built = 1
        while built * 2 <= n:
            out = jnp.concatenate([out, out], axis=axis)
            built *= 2
        while built < n:
            out = jnp.concatenate([out, v], axis=axis)
            built += 1
        return out

    return dbl(dbl(x, times_rows, 0), times_cols, 1)


def _fwd_consts(P: int, C: int, dtype=np.float32):
    """Host-built constants for the merged-matmul forward kernel (v2).

    Adds to :func:`_constants`: the stacked collapse matrix
    ``Lcollapse = [Sa; Sb; ones]``, the stacked row-weight selector
    ``selcat = [sel_rdiv; sel_rmod]``, a double-width ``mask_cb2`` for the
    combined T_bc/M10 pass, ``eyeP``, and the row-swap permutation
    ``rowswap`` ((b c) <- (c b)) built host-side.
    """
    base = _constants(P, C, dtype)
    N2 = P * P
    c = {k: base[k] for k in ("S", "Sa", "Sb", "sel_rdiv", "sel_rmod",
                              "blockdiag", "crossdiag", "mask_cb",
                              "mask_ca", "Srep")}
    c["dmaskT"] = base["dmask_row"].T.copy()                # [1, N2]
    c["selcat"] = np.concatenate(
        [base["sel_rdiv"], base["sel_rmod"]], axis=0)       # [2N2, P]
    c["mask_cb2"] = np.concatenate(
        [base["mask_cb"], base["mask_cb"]], axis=1)         # [N2, 2PC]
    c["eyeP"] = np.eye(P, dtype=dtype)
    r = np.arange(N2)
    c["rowswap"] = ((r[:, None] % P) * P + r[:, None] // P
                    == r[None, :]).astype(dtype)            # [N2, N2]
    # transposed row selectors for the matmul-built E9/E12
    c["selrmodT"] = base["sel_rmod"].T.copy()               # [P, N2]
    c["selrdivT"] = base["sel_rdiv"].T.copy()               # [P, N2]
    return c


_FWD_CONST_NAMES = ("S", "Sa", "Sb", "sel_rdiv", "sel_rmod", "blockdiag",
                    "crossdiag", "mask_cb", "mask_ca", "Srep", "dmaskT",
                    "selcat", "mask_cb2", "eyeP", "rowswap", "selrmodT",
                    "selrdivT")


def _kernel(Xab_ref, A_ref, K137_ref, KB_ref, KC_ref, KD_ref,
            S_ref, Sa_ref, Sb_ref, sel_rdiv_ref, sel_rmod_ref,
            blockdiag_ref, crossdiag_ref, mask_cb_ref, mask_ca_ref,
            Srep_ref, dmaskT_ref, selcat_ref, mask_cb2_ref, eyeP_ref,
            rowswap_ref, selrmodT_ref, selrdivT_ref,
            out_ref, *, P, C, Cout):
    """Merged-matmul forward (v2 of the one-layout kernel): same math,
    fewer Mosaic ops — the per-step cost at these shapes is op-issue
    bound, not FLOP- or HBM-bound (tools/ablate_bank.py), so:

      * diagonal-row sums (cases 14/18) are tiny [1, N2] matmuls instead
        of an X-sized mask multiply,
      * the Kronecker maps E9/E12 are built by two tiny matmuls + one
        mask multiply instead of concat-doubling,
      * the four E9-group case maps are one [N2,N2]@[N2,4C] matmul,
      * the T_bc/M10 derivations share one [N2, 2PC] pass,
      * K arrives pre-grouped (XLA-side) and the final case assembly +
        groups B/C land in ONE [N2, 9C+P+1] matmul.

    Two Mosaic layout constraints shape the code: concatenation operands
    must be FRESH values (slices at non-zero lane/sublane offsets do not
    concatenate), and X-sized row-stacks cost more VPU copy time than
    the matmuls they merge save (both measured).
    """
    f32 = jnp.float32
    # Upcast once in VMEM: all in-kernel math runs f32 (DEFAULT-precision
    # MXU passes are bf16-rate anyway); bf16 inputs still halve HBM traffic.
    Xab = Xab_ref[0].astype(f32)
    A = A_ref[0]
    K137 = K137_ref[...].astype(f32)
    KB = KB_ref[...].astype(f32)
    KC = KC_ref[...].astype(f32)
    KD = KD_ref[...].astype(f32)
    S = S_ref[...]
    Sa, Sb = Sa_ref[...], Sb_ref[...]
    sel_rdiv, sel_rmod = sel_rdiv_ref[...], sel_rmod_ref[...]
    blockdiag, crossdiag = blockdiag_ref[...], crossdiag_ref[...]
    mask_cb, mask_ca = mask_cb_ref[...], mask_ca_ref[...]
    Srep, dmaskT = Srep_ref[...], dmaskT_ref[...]
    selcat = selcat_ref[...]
    mask_cb2, eyeP = mask_cb2_ref[...], eyeP_ref[...]
    rowswap = rowswap_ref[...]
    selrmodT, selrdivT = selrmodT_ref[...], selrdivT_ref[...]

    def mm(x, y):
        return jnp.dot(x, y, preferred_element_type=f32)

    def cat0(xs):
        return jnp.concatenate(xs, axis=0)

    def cat1(xs):
        return jnp.concatenate(xs, axis=1)

    N2, PC = P * P, P * C
    ones_colP = jnp.ones((P, 1), f32)
    ones_row = jnp.ones((1, N2), f32)

    # ---- adjacency quantities -------------------------------------------
    Ap = jnp.where(A > 0, A, jnp.zeros_like(A))
    S_adj = jnp.sum(Ap)
    trA = jnp.sum(Ap * eyeP)
    R_col = mm(Ap, ones_colP)                       # [P, 1]
    Rcw = mm(R_col.T, Srep)                         # [1, PC]: R[q//C]

    # ---- X family: masked channel-sums ----------------------------------
    T_ab = mm(Xab, S)                               # sum_c T[a,b,c,f]
    D_bc = mm(Xab * mask_cb, S)                     # T[a,b,b,f]
    V_ac = mm(Xab * mask_ca, S)                     # T[a,b,a,f]
    M6 = mm(Xab * Rcw, S)                           # sum_c R[c] T (case 6)

    # ---- per-row adjacency weights: one stacked matmul -------------------
    rr = mm(selcat, R_col)                          # [2 N2, 1]
    rowRa, rowR = rr[0:N2], rr[N2:2 * N2]           # R[r//P], R[r%P]

    # ---- [(b c), f] rows (T_bc + case-10 map M10): one merged pass -------
    Ycat = cat1([mm(Sb, Xab), mm(Sb, Xab * rowRa)])  # [P, 2 PC]
    Y2 = mm(sel_rdiv, Ycat) * mask_cb2              # [N2, 2 PC]
    T_bc = mm(Y2[:, :PC], S)                        # sum_a T[a,b,c,f]
    M10 = mm(Y2[:, PC:], S)                         # sum_a R[a] T

    # ---- collapse family -------------------------------------------------
    T_a = mm(Sa, T_ab)                              # [P, C]
    T_b = mm(Sb, T_ab)
    Tdiag_bc_a = mm(Sa, D_bc)
    D_ac_b = mm(Sb, V_ac)
    T_full = mm(ones_row, T_ab)                     # [1, C]
    s15 = mm(ones_row, D_bc)
    t18 = mm(dmaskT, D_bc)                          # diag rows of D_bc
    # case 14: diagonal-row channel sums — two tiny matmuls, no X mask
    s14 = mm(mm(dmaskT, Xab), S)                    # [1, C]

    W17 = mm(rowswap, V_ac)                         # T[c,b,c,f] rows (b c=e)

    # ---- Kronecker case maps built by matmul ------------------------------
    Mid = mm(sel_rmod, Ap)                          # [N2, P]: Ap[r%P, e]
    E9 = mm(Mid, selrmodT) * blockdiag              # kron(I, Ap)
    E12 = mm(Mid, selrdivT) * crossdiag             # A'[d,e] delta(b,b')
    E9out = mm(E9, cat1([T_ab, T_bc, D_bc, W17]))   # [M9|M13|M16|M17]
    M12 = mm(E12, T_ab)

    # ---- one fused case-assembly matmul (groups A, D, B, C) --------------
    KA = S_adj * K137[0:C] + trA * K137[C:2 * C]    # cases 1, 7
    KA3 = S_adj * K137[2 * C:3 * C]                 # case 3
    # group B: per-row R[y] outer with the U @ KB channel maps
    U = cat1([T_a, T_b, Tdiag_bc_a, D_ac_b])        # [P, 4C]
    UK = mm(U, KB)                                  # [P, Cout]
    # group C: Ap[x,y] (x) scalar channel map
    t_cat = cat1([T_full, s14, s15, t18])           # [1, 4C]
    tK = mm(t_cat, KC)                              # [1, Cout]
    G = mm(sel_rdiv, Ap)                            # [N2, P]: Ap[r//P, e]
    Ap_flat = mm(G * sel_rmod, ones_colP)           # [N2, 1]: Ap[r//P, r%P]

    M_big = cat1([T_ab, T_bc, M6, M10, M12, E9out,
                  sel_rdiv * rowR, Ap_flat])        # [N2, 9C + P + 1]
    K_big = cat0([KA, KA3, KD, UK, tK])             # [9C + P + 1, Cout]
    Z = mm(M_big, K_big)

    out_ref[0] = Z.astype(out_ref.dtype)


def _group_K(K, C):
    """Pre-arrange K (XLA side, fuses into the surrounding program) into
    the kernel's operand groups.  Case i (1-based) is rows (i-1)C:iC."""
    def blk(i):
        return K[i * C:(i + 1) * C, :]

    K137 = jnp.concatenate([blk(0), blk(6), blk(2)], axis=0)
    KB = jnp.concatenate([blk(1), blk(3), blk(7), blk(10)], axis=0)
    KC = jnp.concatenate([blk(4), blk(13), blk(14), blk(17)], axis=0)
    # order matches M_all = [T_ab, T_bc, M6, M10, M12, M9, M13, M16, M17]
    KD = jnp.concatenate([blk(i) for i in (5, 9, 11, 8, 12, 15, 16)], axis=0)
    return K137, KB, KC, KD


def risi18_matmul_pallas(T, A, K):
    """Fused Z = reshape(Risi18(T, A)) @ K via a single-pass Pallas kernel.

    T: [B, P, P, P, C], A: [B, P, P], K: [18C, Cout] -> [B, P, P, Cout].
    """
    B, P = T.shape[0], T.shape[1]
    C, Cout = T.shape[4], K.shape[1]
    N2, PC = P * P, P * C
    # Mosaic can't vector-compare bf16 (the A > 0 guard); A is tiny, keep f32.
    A = A.astype(jnp.float32)
    X_ab = T.reshape(B, N2, PC)
    consts = _fwd_consts(P, C)
    const_args = [jnp.asarray(consts[n]) for n in _FWD_CONST_NAMES]
    K137, KB, KC, KD = _group_K(K, C)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N2, PC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed((3 * C, Cout)),
            fixed((4 * C, Cout)),
            fixed((4 * C, Cout)),
            fixed((7 * C, Cout)),
        ] + [fixed(consts[n].shape) for n in _FWD_CONST_NAMES],
        out_specs=pl.BlockSpec((1, N2, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_kernel, P=P, C=C, Cout=Cout)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N2, Cout), T.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N2 * (6 * PC + 11 * C * Cout + 2 * N2 * C),
            bytes_accessed=T.nbytes + A.nbytes + K.nbytes
            + B * N2 * Cout * 4,
            transcendentals=0,
        ),
    )(X_ab, A, K137, KB, KC, KD, *const_args)
    return out.reshape(B, P, P, Cout)


# ----------------------------------------------------------------------
# Backward kernel: dT and dK in one pass (the bank is linear in T).
# ----------------------------------------------------------------------

def _bwd_kernel(Xab_ref, A_ref, K_ref, g_ref,
                S_ref, Sa_ref, Sb_ref, sel_rdiv_ref, sel_rmod_ref,
                blockdiag_ref, crossdiag_ref, mask_cb_ref, mask_ca_ref,
                dmask_row_ref, Srep_ref, Sexp_ref,
                dX_ref, dK_ref, *, P, C, Cout):
    """Adjoint of ``_kernel``: given the cotangent g = dZ [(x y), Cout],
    emit dX_ab [(a b), (c f)] and accumulate dK [18C, Cout] across the
    sequential TPU grid (dK needs the forward T-reductions, recomputed
    here from the single X_ab read — T still crosses HBM once per pass).
    """
    f32 = jnp.float32
    bidx = pl.program_id(0)
    Xab = Xab_ref[0].astype(f32)
    A = A_ref[0]
    K = K_ref[...].astype(f32)
    g = g_ref[0].astype(f32)                        # [N2, Cout]
    S, Sa, Sb = S_ref[...], Sa_ref[...], Sb_ref[...]
    sel_rdiv, sel_rmod = sel_rdiv_ref[...], sel_rmod_ref[...]
    blockdiag, crossdiag = blockdiag_ref[...], crossdiag_ref[...]
    mask_cb, mask_ca = mask_cb_ref[...], mask_ca_ref[...]
    dmask_row, Srep, Sexp = dmask_row_ref[...], Srep_ref[...], Sexp_ref[...]

    def mm(x, y):
        return jnp.dot(x, y, preferred_element_type=f32)

    N2 = P * P
    ones_row = jnp.ones((1, N2), f32)
    ones_col = jnp.ones((N2, 1), f32)
    ones_colP = jnp.ones((P, 1), f32)

    # ---- adjacency quantities (as forward) -------------------------------
    Ap = jnp.where(A > 0, A, jnp.zeros_like(A))
    S_adj = jnp.sum(Ap)
    eyeP = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)).astype(f32)
    trA = jnp.sum(Ap * eyeP)
    R_col = mm(Ap, ones_colP)
    Rcol_weights = mm(R_col.T, Srep)                # [1, PC]: R[q//C]
    rowR = mm(sel_rmod, R_col)                      # [N2, 1] = R[r%P]
    rowRa = mm(sel_rdiv, R_col)                     # [N2, 1] = R[r//P]
    Gsel = mm(sel_rdiv, Ap)
    Ap_flat = mm(Gsel * sel_rmod, ones_colP)        # [N2, 1] = Ap[x, y]
    E9 = _tile_concat(Ap, P, P) * blockdiag
    E12 = _tile_concat(mm(Ap, Sexp), P, 1) * crossdiag
    rowswap = crossdiag * crossdiag.T               # involution: symmetric

    def bc_rows(Y):
        return mm(mm(sel_rdiv, Y) * mask_cb, S)

    def bc_rows_adj(M):                             # [N2, C] -> [P, PC]
        return mm(sel_rdiv.T, mm(M, S.T) * mask_cb)

    # ---- forward T-reductions (for dK) ------------------------------------
    T_ab = mm(Xab, S)
    D_bc = mm(Xab * mask_cb, S)
    V_ac = mm(Xab * mask_ca, S)
    T_bc = bc_rows(mm(Sb, Xab))
    W17 = mm(rowswap, V_ac)
    T_a = mm(Sa, T_ab)
    T_b = mm(Sb, T_ab)
    Tdiag_bc_a = mm(Sa, D_bc)
    D_ac_b = mm(Sb, V_ac)
    T_full = mm(ones_row, T_ab)
    s14 = mm(mm(ones_row, Xab * dmask_row), S)
    s15 = mm(ones_row, D_bc)
    t18 = mm(ones_row, D_bc * dmask_row)
    M6 = mm(Xab * Rcol_weights, S)
    M10 = bc_rows(mm(Sb, Xab * rowRa))
    M9 = mm(E9, T_ab)
    M12 = mm(E12, T_ab)
    M13 = mm(E9, T_bc)
    M16 = mm(E9, D_bc)
    M17 = mm(E9, W17)

    def Kblk(i):
        return K[i * C:(i + 1) * C, :]

    # ---- group adjoints (mirror of the forward groups) --------------------
    # Group A: Z += T_ab (S K1 + trA K7) + T_bc (S K3)
    KA = S_adj * Kblk(0) + trA * Kblk(6)
    dT_ab = mm(g, KA.T)
    dT_bc = S_adj * mm(g, Kblk(2).T)
    # Group B: Z += (sel_rdiv * rowR) @ (U @ K_B)
    selR = sel_rdiv * rowR
    H_B = mm(selR.T, g)                             # [P, Cout]
    K_B = jnp.concatenate([Kblk(1), Kblk(3), Kblk(7), Kblk(10)], axis=0)
    dU = mm(H_B, K_B.T)                             # [P, 4C]
    dT_a, dT_b = dU[:, 0:C], dU[:, C:2 * C]
    du8, du11 = dU[:, 2 * C:3 * C], dU[:, 3 * C:4 * C]
    # Group C: Z += Ap_flat @ (t_cat @ K_C)
    dtK = mm(Ap_flat.T, g)                          # [1, Cout]
    K_C = jnp.concatenate([Kblk(4), Kblk(13), Kblk(14), Kblk(17)], axis=0)
    dt = mm(dtK, K_C.T)                             # [1, 4C]
    dT_full, ds14 = dt[:, 0:C], dt[:, C:2 * C]
    ds15, dt18 = dt[:, 2 * C:3 * C], dt[:, 3 * C:4 * C]
    # Group D: Z += M @ K_D
    K_D = jnp.concatenate(
        [Kblk(i) for i in (5, 8, 9, 11, 12, 15, 16)], axis=0)
    dM = mm(g, K_D.T)                               # [N2, 7C]
    dM6, dM9 = dM[:, 0:C], dM[:, C:2 * C]
    dM10, dM12 = dM[:, 2 * C:3 * C], dM[:, 3 * C:4 * C]
    dM13, dM16 = dM[:, 4 * C:5 * C], dM[:, 5 * C:6 * C]
    dM17 = dM[:, 6 * C:7 * C]

    # ---- accumulate cotangents of the T-reductions ------------------------
    dT_ab = dT_ab + mm(E9.T, dM9) + mm(E12.T, dM12)
    dT_ab = dT_ab + mm(Sa.T, dT_a) + mm(Sb.T, dT_b) + mm(ones_col, dT_full)
    dT_bc = dT_bc + mm(E9.T, dM13)
    dD_bc = (mm(Sa.T, du8) + mm(ones_col, ds15) + mm(E9.T, dM16)
             + mm(ones_col, dt18) * dmask_row)
    dV_ac = mm(Sb.T, du11) + mm(rowswap, mm(E9.T, dM17))

    # ---- fold into dX_ab ---------------------------------------------------
    dX = mm(dT_ab, S.T)
    dX = dX + mm(dM6, S.T) * Rcol_weights
    dX = dX + mm(dD_bc, S.T) * mask_cb
    dX = dX + mm(dV_ac, S.T) * mask_ca
    dX = dX + mm(mm(ones_col, ds14), S.T) * dmask_row
    dX = dX + mm(Sb.T, bc_rows_adj(dT_bc))
    dX = dX + mm(Sb.T, bc_rows_adj(dM10)) * rowRa
    dX_ref[0] = dX.astype(dX_ref.dtype)

    # ---- dK: per-case Y^T g from the recomputed reductions ----------------
    G_ab = mm(T_ab.T, g)                            # [C, Cout]
    dK1, dK7 = S_adj * G_ab, trA * G_ab
    dK3 = S_adj * mm(T_bc.T, g)
    U = jnp.concatenate([T_a, T_b, Tdiag_bc_a, D_ac_b], axis=1)
    dK_B = mm(U.T, H_B)                             # [4C, Cout]
    t_cat = jnp.concatenate([T_full, s14, s15, t18], axis=1)
    dK_C = mm(t_cat.T, dtK)                         # [4C, Cout]
    M = jnp.concatenate([M6, M9, M10, M12, M13, M16, M17], axis=1)
    dK_D = mm(M.T, g)                               # [7C, Cout]

    dK_full = jnp.concatenate([
        dK1,                        # case 1
        dK_B[0:C],                  # case 2
        dK3,                        # case 3
        dK_B[C:2 * C],              # case 4
        dK_C[0:C],                  # case 5
        dK_D[0:C],                  # case 6
        dK7,                        # case 7
        dK_B[2 * C:3 * C],          # case 8
        dK_D[C:2 * C],              # case 9
        dK_D[2 * C:3 * C],          # case 10
        dK_B[3 * C:4 * C],          # case 11
        dK_D[3 * C:4 * C],          # case 12
        dK_D[4 * C:5 * C],          # case 13
        dK_C[C:2 * C],              # case 14
        dK_C[2 * C:3 * C],          # case 15
        dK_D[5 * C:6 * C],          # case 16
        dK_D[6 * C:7 * C],          # case 17
        dK_C[3 * C:4 * C],          # case 18
    ], axis=0)

    @pl.when(bidx == 0)
    def _():
        dK_ref[...] = jnp.zeros_like(dK_ref)

    dK_ref[...] += dK_full


def risi18_matmul_pallas_bwd(T, A, K, g):
    """Backward of :func:`risi18_matmul_pallas`.

    g: [B, P, P, Cout] cotangent of Z.  Returns (dT [B,P,P,P,C],
    dK [18C, Cout]); the adjacency is graph structure (non-differentiable
    here — the einsum-spec VJP on :func:`risi18_layer` covers dA).
    """
    B, P = T.shape[0], T.shape[1]
    C, Cout = T.shape[4], K.shape[1]
    N2, PC = P * P, P * C
    A = A.astype(jnp.float32)
    X_ab = T.reshape(B, N2, PC)
    g2 = g.reshape(B, N2, Cout)
    consts = _constants(P, C)
    const_args = [jnp.asarray(consts[n]) for n in _CONST_NAMES]

    def fixed(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N2, PC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed((18 * C, Cout)),
            pl.BlockSpec((1, N2, Cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [fixed(consts[n].shape) for n in _CONST_NAMES],
        out_specs=[
            pl.BlockSpec((1, N2, PC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed((18 * C, Cout)),
        ],
    )

    kernel = functools.partial(_bwd_kernel, P=P, C=C, Cout=Cout)
    dX, dK = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, N2, PC), T.dtype),
                   jax.ShapeDtypeStruct((18 * C, Cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N2 * (12 * PC + 22 * C * Cout + 4 * N2 * C),
            bytes_accessed=2 * T.nbytes + A.nbytes + K.nbytes
            + B * N2 * Cout * 4,
            transcendentals=0,
        ),
    )(X_ab, A, K, g2, *const_args)
    return dX.reshape(B, P, P, P, C), dK.astype(K.dtype)


@jax.custom_vjp
def risi18_bank_train(T, A, K):
    """Fused bank + channel matmul with PALLAS kernels both directions.

    The training-path variant of :func:`risi18_layer`: forward is the
    one-layout kernel, backward is :func:`risi18_matmul_pallas_bwd`
    (dT/dK in one pass).  The adjacency cotangent is None (graph
    structure, as in ``risi18_level``); use :func:`risi18_layer` if dA
    is needed.
    """
    return risi18_matmul_pallas(T, A, K)


def _bank_train_fwd(T, A, K):
    return risi18_matmul_pallas(T, A, K), (T, A, K)


def _bank_train_bwd(res, g):
    T, A, K = res
    dT, dK = risi18_matmul_pallas_bwd(T, A, K, g)
    return dT, None, dK


risi18_bank_train.defvjp(_bank_train_fwd, _bank_train_bwd)


# ----------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, einsum-spec backward.
# ----------------------------------------------------------------------

@jax.custom_vjp
def risi18_layer(T, A, K):
    """Differentiable fused layer (Pallas forward, exact einsum VJP)."""
    return risi18_matmul_pallas(T, A, K)


def _fwd(T, A, K):
    return risi18_matmul_pallas(T, A, K), (T, A, K)


def _bwd(res, g):
    T, A, K = res
    _, vjp = jax.vjp(
        lambda t, a, k: jax.vmap(
            lambda ti, ai: risi18_matmul_fused(ti, ai, k))(t, a), T, A, K)
    return vjp(g)


risi18_layer.defvjp(_fwd, _bwd)
