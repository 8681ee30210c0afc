"""Pallas TPU kernel: single-pass fused RisiContraction_18 + channel matmul.

Motivation (measured): the XLA einsum formulation reads the stacked tensor
T[B, P, P, P, C] from HBM once per distinct reduction pattern (~6 full
passes) and materializes the [P, P, 18C] bank before the channel matmul.
This kernel streams each vertex's T block into VMEM ONCE, computes every
reduction, diagonal and case map on-chip (VPU), feeds the grouped matmuls to
the MXU, and writes only the final [P, P, Cout] — HBM traffic drops to
read-T-once + write-Z-once.

Math identical to ``graphflow_tpu.ops.fused.risi18_matmul_fused`` (the
low-rank case grouping); parity-tested against the einsum spec.

Layout notes:
  * T arrives reshaped [B, P*P, P*C] so the kernel block is 2-D-tileable
    (last dim P*C multiple of 128 for C >= 8 when P = 16).
  * Diagonal extractions are computed as masked sums with broadcasted_iota
    (Mosaic has no gather); each mask is built once per kernel instance.
  * The backward pass reuses jax.linear_transpose via custom_vjp on the
    mathematically-equal einsum implementation, so autodiff stays exact
    while the forward runs the Pallas kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphflow_tpu.ops.fused import risi18_matmul_fused


def _kernel(T_ref, A_ref, K_ref, out_ref, *, P, C, Cout):
    # T block: [P*P, P*C] viewed as (a*P + b, c*C + f)
    Tf = T_ref[...].reshape(P, P, P, C)
    A = A_ref[...]
    K = K_ref[...]                         # [18*C, Cout]

    Ap = jnp.where(A > 0, A, jnp.zeros_like(A))
    S = jnp.sum(Ap)
    R = jnp.sum(Ap, axis=1)                # [P]
    ii = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    eye = (ii == jj).astype(Tf.dtype)      # [P, P]
    trA = jnp.sum(Ap * eye)

    T_ab = jnp.sum(Tf, axis=2)             # [a,b,f]
    T_bc = jnp.sum(Tf, axis=0)             # [b,c,f]
    T_a = jnp.sum(T_ab, axis=1)            # [a,f]
    T_b = jnp.sum(T_bc, axis=1)            # [b,f]
    T_full = jnp.sum(T_a, axis=0)          # [f]

    # Diagonal reductions as masked sums (no gather on TPU):
    eye_bc = eye[None, :, :, None]
    D_bc = jnp.sum(Tf * eye_bc, axis=2)            # T[a,b,b,f] -> [a,b,f]
    eye_ab = eye[:, :, None, None]
    D_aab = jnp.sum(Tf * eye_ab, axis=0)           # [c', c, f]: T[c',c',c,f]
    eye_ac = eye[:, None, :, None]
    D_ac_b = jnp.sum(Tf * eye_ac, axis=(0, 2))     # sum_a T[a,b,a,f] -> [b,f]
    Tdiag_bc_a = jnp.sum(D_bc, axis=1)             # [a,f]
    s14 = jnp.sum(D_aab, axis=(0, 1))              # [f] = sum_{a,c} T[a,a,c,f]
    s15 = jnp.sum(D_bc, axis=(0, 1))               # [f]
    W16 = jnp.sum(Tf * eye_bc, axis=1)             # T[a,e,e,f] -> [a,e,f]
    W17 = jnp.sum(Tf * eye_ac, axis=0)             # T[e,b,e,f] -> [b,e,f]
    # t18[f] = sum_a T[a,a,a,f]: mask W16[a,e] at a==e then sum
    t18 = jnp.sum(W16 * eye[:, :, None], axis=(0, 1))

    Kc = K.reshape(18, C, Cout)

    def mm(x2d, k):
        return jnp.dot(x2d, k, preferred_element_type=jnp.float32)

    # Group A: spatial-broadcast cases 1, 3, 7
    K_ab = S * Kc[0] + trA * Kc[6]
    Z = mm(T_ab.reshape(P * P, C), K_ab)
    Z = Z + mm(T_bc.reshape(P * P, C), S * Kc[2])
    Z = Z.reshape(P, P, Cout)

    # Group B: row-broadcast cases 2, 4, 8, 11
    U = jnp.concatenate([T_a, T_b, Tdiag_bc_a, D_ac_b], axis=1)   # [P, 4C]
    K_B = jnp.concatenate([Kc[1], Kc[3], Kc[7], Kc[10]], axis=0)
    UK = mm(U, K_B)                                               # [P, Cout]
    Z = Z + UK[:, None, :] * R[None, :, None]

    # Group C: adj-broadcast cases 5, 14, 15, 18
    t_cat = jnp.concatenate([T_full, s14, s15, t18])[None, :]     # [1, 4C]
    K_C = jnp.concatenate([Kc[4], Kc[13], Kc[14], Kc[17]], axis=0)
    tK = mm(t_cat, K_C)[0]                                        # [Cout]
    Z = Z + Ap[:, :, None] * tK[None, None, :]

    # Group D: full-map cases 6, 9, 10, 12, 13, 16, 17.
    # Mosaic-friendly forms only: broadcast-multiply reductions for the
    # R-weighted cases, and 2-D matmuls + minor-dim transposes for the
    # A-contracted cases.
    M6 = jnp.sum(Tf * R[None, None, :, None], axis=2)     # [a,b,f]
    M10 = jnp.sum(Tf * R[:, None, None, None], axis=0)    # [b,c,f]

    ApT = Ap.T

    def contract_e_suffix(X):
        # X: [x, e, f] -> Y[x, d, f] = sum_e Ap[d, e] X[x, e, f]
        Xt = jnp.transpose(X, (0, 2, 1)).reshape(P * C, P)   # [(x f), e]
        Y = jnp.dot(Xt, ApT, preferred_element_type=jnp.float32)
        return jnp.transpose(Y.reshape(P, C, P), (0, 2, 1))  # [x, d, f]

    def contract_e_prefix(X):
        # X: [e, y, f] -> Y[y, d, f] = sum_e Ap[d, e] X[e, y, f]
        Y = jnp.dot(Ap, X.reshape(P, P * C),
                    preferred_element_type=jnp.float32)      # [d, (y f)]
        return jnp.transpose(Y.T.reshape(P, C, P), (0, 2, 1))

    M9 = contract_e_suffix(T_ab)                          # [a,d,f]
    M12 = contract_e_prefix(T_ab)                         # [b,d,f]
    M13 = contract_e_suffix(T_bc)                         # [b,d,f]
    M16 = contract_e_suffix(W16)                          # [a,d,f]
    M17 = contract_e_suffix(W17)                          # [b,d,f]

    M = jnp.concatenate(
        [m.reshape(P * P, C) for m in (M6, M9, M10, M12, M13, M16, M17)],
        axis=1)                                                   # [P^2, 7C]
    K_D = jnp.concatenate(
        [Kc[i] for i in (5, 8, 9, 11, 12, 15, 16)], axis=0)
    Z = Z + mm(M, K_D).reshape(P, P, Cout)

    out_ref[...] = Z.reshape(P * P, Cout).astype(out_ref.dtype)


def risi18_matmul_pallas(T, A, K):
    """Fused Z = reshape(Risi18(T, A)) @ K via a single-pass Pallas kernel.

    T: [B, P, P, P, C], A: [B, P, P], K: [18C, Cout] -> [B, P, P, Cout].
    """
    B, P = T.shape[0], T.shape[1]
    C, Cout = T.shape[4], K.shape[1]
    T2 = T.reshape(B, P * P, P * C)

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P * P, P * C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18 * C, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P * P, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_squeeze_kernel, P=P, C=C, Cout=Cout)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, P * P, Cout), T.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (10 * P**3 * C + P * P * 11 * C * Cout),
            bytes_accessed=T.nbytes + A.nbytes + K.nbytes
            + B * P * P * Cout * 4,
            transcendentals=0,
        ),
    )(T2, A, K)
    return out.reshape(B, P, P, Cout)


def _squeeze_kernel(T_ref, A_ref, K_ref, out_ref, *, P, C, Cout):
    # Block shapes carry a leading length-1 batch dim; strip it.
    _kernel(T_ref.at[0], A_ref.at[0], K_ref, out_ref.at[0],
            P=P, C=C, Cout=Cout)


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
    # The einsum implementation is mathematically identical; its VJP is the
    # exact gradient of the Pallas forward.
    _, vjp = jax.vjp(
        lambda t, a, k: jax.vmap(
            lambda ti, ai: risi18_matmul_fused(ti, ai, k))(t, a), T, A, K)
    return vjp(g)


risi18_layer.defvjp(_fwd, _bwd)
