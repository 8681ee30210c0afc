"""Fused RisiContraction_18 + channel-reduction layer.

The SMP second-order layer computes Z = reshape(Risi18(T, A)) @ K + b
(reference ``SMP_omega.h:650-661``).  Materializing the [P, P, 18C] bank is
wasteful: most of the 18 case slabs are LOW-RANK —

  spatial-broadcast cases (1,3,7):  Y = T_red * scalar
  row-broadcast cases (2,4,8,11):   Y[x,y,f] = u[x,f] * R[y]
  adj-broadcast cases (5,14,15,18): Y[x,y,f] = A'[x,y] * t[f]
  full-map cases (6,9,10,12,13,16,17): genuinely [P, P, C]

so Z decomposes as

  Z = T_ab_flat @ (S K1 + trA K7) + T_bc_flat @ (S K3)        (2 matmuls)
    + broadcast_y(R) * (U @ K_B)                              (1 matmul, [P,4C])
    + A'[x,y] (+) (t_cat @ K_C)                               (1 tiny matmul)
    + sum_case M_case_flat @ K_case                           (7 matmuls)

cutting the dominant 18 C^2 P^2 matmul work to ~11 C^2 P^2 and never
materializing the bank.  This is algebraically EXACT (parity-tested against
risi_contraction_18 + matmul).

All inputs are per-vertex; vmap over the vertex/batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def risi18_matmul_reference(T, A, K):
    """Unfused spec: reshape(Risi18(T, A)) @ K (for parity tests)."""
    from graphflow_tpu.ops.contractions import risi_contraction_18
    P = T.shape[0]
    Y = risi_contraction_18(T, A)
    return (Y.reshape(P * P, -1) @ K).reshape(P, P, K.shape[1])


def risi18_matmul_fused(T, A, K):
    """Fused, low-rank-structured Z = reshape(Risi18(T, A)) @ K.

    T: [P, P, P, C], A: [P, P], K: [18*C, Cout] -> [P, P, Cout].
    """
    P, C = T.shape[0], T.shape[3]
    Cout = K.shape[1]
    Kc = K.reshape(18, C, Cout)

    Ap = jnp.where(A > 0, A, jnp.zeros_like(A))
    S = Ap.sum()
    R = Ap.sum(axis=1)                       # [P]
    trA = jnp.trace(Ap)

    T_ab = T.sum(axis=2)                     # [a,b,f]
    T_bc = T.sum(axis=0)                     # [b,c,f]
    T_a = T_ab.sum(axis=1)                   # [a,f]
    T_b = T_bc.sum(axis=1)                   # [b,f]
    T_full = T_a.sum(axis=0)                 # [f]
    D_bc = jnp.einsum("abbf->abf", T)        # T[a,b,b,f]
    D_aab = jnp.einsum("aacf->acf", T)       # T[a,a,c,f]
    Tdiag_bc_a = D_bc.sum(axis=1)            # [a,f] (case 8)
    Tdiag_ac_b = jnp.einsum("abaf->bf", T)   # [b,f] (case 11)
    s14 = D_aab.sum(axis=(0, 1))             # [f]
    s15 = D_bc.sum(axis=(0, 1))              # [f]
    t18 = jnp.einsum("aaaf->f", T)           # [f]
    W16 = jnp.einsum("aeef->aef", T)         # [a,e,f]
    W17 = jnp.einsum("ebef->bef", T)         # [b,e,f]

    # --- spatial-broadcast cases 1, 3, 7: T_red[x,y,:] @ (scalar * K) ------
    K_ab = S * Kc[0] + trA * Kc[6]           # cases 1 and 7 share T_ab
    Z = T_ab.reshape(P * P, C) @ K_ab
    Z = Z + T_bc.reshape(P * P, C) @ (S * Kc[2])

    # --- row-broadcast cases 2, 4, 8, 11: u[x] K * R[y] --------------------
    U = jnp.concatenate([T_a, T_b, Tdiag_bc_a, Tdiag_ac_b], axis=1)  # [P,4C]
    K_B = jnp.concatenate([Kc[1], Kc[3], Kc[7], Kc[10]], axis=0)     # [4C,Co]
    UK = U @ K_B                                                     # [P,Co]
    Z = Z.reshape(P, P, Cout) + UK[:, None, :] * R[None, :, None]

    # --- adj-broadcast cases 5, 14, 15, 18: A'[x,y] * (t K) ----------------
    t_cat = jnp.concatenate([T_full, s14, s15, t18])                 # [4C]
    K_C = jnp.concatenate([Kc[4], Kc[13], Kc[14], Kc[17]], axis=0)
    tK = t_cat @ K_C                                                 # [Co]
    Z = Z + Ap[:, :, None] * tK[None, None, :]

    # --- full-map cases 6, 9, 10, 12, 13, 16, 17 ---------------------------
    M6 = jnp.einsum("abdf,d->abf", T, R)
    M9 = jnp.einsum("aef,de->adf", T_ab, Ap)
    M10 = jnp.einsum("dbcf,d->bcf", T, R)
    M12 = jnp.einsum("ebf,de->bdf", T_ab, Ap)
    M13 = jnp.einsum("bef,de->bdf", T_bc, Ap)
    M16 = jnp.einsum("aef,de->adf", W16, Ap)
    M17 = jnp.einsum("bef,de->bdf", W17, Ap)
    # One [P^2, 7C] @ [7C, Co] matmul instead of seven thin ones.
    M = jnp.concatenate(
        [m.reshape(P * P, C) for m in (M6, M9, M10, M12, M13, M16, M17)],
        axis=1)
    K_D = jnp.concatenate(
        [Kc[i] for i in (5, 8, 9, 11, 12, 15, 16)], axis=0)          # [7C,Co]
    Z = Z + (M @ K_D).reshape(P, P, Cout)
    return Z


def smp2d_layer_fused(T, A, K, b, alpha: float = 0.01):
    """Full fused SMP layer: contraction bank + K + bias + LeakyReLU."""
    Z = risi18_matmul_fused(T, A, K) + b[None, None, :]
    return jnp.where(Z > 0, Z, alpha * Z)
