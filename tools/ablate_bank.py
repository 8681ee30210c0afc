"""On-chip ablation of the one-layout Pallas bank kernel (ops/risi_pallas.py).

Times stripped-down variants of the kernel to attribute the per-call cost:

  full      the production kernel (reference point, == tools/bench_bank.py)
  dma       grid + X/out DMA only (no compute): HBM + pipeline floor
  reduce    the T reductions only (T_ab/D_bc/V_ac/T_bc/W17/...), one K matmul
  nogroupd  everything except group D's E9/E12/rowswap matmuls
  novpu     full, but mask elementwise-multiplies removed (wrong results;
            measures the VPU mask cost)

Usage: python tools/ablate_bank.py [B] [P] [C]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphflow_tpu.ops.risi_pallas import _constants, _CONST_NAMES, _tile_concat


def _kernel(Xab_ref, A_ref, K_ref,
            S_ref, Sa_ref, Sb_ref, sel_rdiv_ref, sel_rmod_ref,
            blockdiag_ref, crossdiag_ref, mask_cb_ref, mask_ca_ref,
            dmask_row_ref, Srep_ref, Sexp_ref,
            out_ref, *, P, C, Cout, mode):
    f32 = jnp.float32
    Xab = Xab_ref[0].astype(f32)
    if mode == "dma":
        out_ref[0] = Xab[:, :Cout].astype(out_ref.dtype)
        return
    A = A_ref[0]
    K = K_ref[...].astype(f32)
    S, Sa, Sb = S_ref[...], Sa_ref[...], Sb_ref[...]
    sel_rdiv, sel_rmod = sel_rdiv_ref[...], sel_rmod_ref[...]
    blockdiag, crossdiag = blockdiag_ref[...], crossdiag_ref[...]
    mask_cb, mask_ca = mask_cb_ref[...], mask_ca_ref[...]
    dmask_row, Srep, Sexp = dmask_row_ref[...], Srep_ref[...], Sexp_ref[...]
    if mode == "novpu":
        one = jnp.ones((), f32)
        mask_cb = mask_ca = one
        dmask_row = jnp.ones((P * P, 1), f32)

    def mm(x, y):
        return jnp.dot(x, y, preferred_element_type=f32)

    N2 = P * P
    ones_row = jnp.ones((1, N2), f32)
    ones_colP = jnp.ones((P, 1), f32)

    Ap = jnp.where(A > 0, A, jnp.zeros_like(A))
    S_adj = jnp.sum(Ap)
    eyeP = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)).astype(f32)
    trA = jnp.sum(Ap * eyeP)
    R_col = mm(Ap, ones_colP)
    R_row = R_col.T
    Rcol_weights = mm(R_row, Srep)

    T_ab = mm(Xab, S)
    D_bc = mm(Xab * mask_cb, S)
    V_ac = mm(Xab * mask_ca, S)

    def bc_rows(Y):
        return mm(mm(sel_rdiv, Y) * mask_cb, S)

    T_bc = bc_rows(mm(Sb, Xab))
    rowswap = crossdiag * crossdiag.T
    W17 = mm(rowswap, V_ac)
    T_a = mm(Sa, T_ab)
    T_b = mm(Sb, T_ab)
    Tdiag_bc_a = mm(Sa, D_bc)
    D_ac_b = mm(Sb, V_ac)
    T_full = mm(ones_row, T_ab)
    s14 = mm(mm(ones_row, Xab * dmask_row), S)
    s15 = mm(ones_row, D_bc)
    t18 = mm(ones_row, D_bc * dmask_row)

    def Kblk(i):
        return K[i * C:(i + 1) * C, :]

    if mode == "reduce":
        out_ref[0] = (mm(T_ab + T_bc + W17, Kblk(0))
                      + mm(D_bc + V_ac, Kblk(1))).astype(out_ref.dtype)
        return

    Z = mm(T_ab, S_adj * Kblk(0) + trA * Kblk(6))
    Z = Z + mm(T_bc, S_adj * Kblk(2))

    U = jnp.concatenate([T_a, T_b, Tdiag_bc_a, D_ac_b], axis=1)
    K_B = jnp.concatenate([Kblk(1), Kblk(3), Kblk(7), Kblk(10)], axis=0)
    UK = mm(U, K_B)
    rowR = mm(sel_rmod, R_col)
    Z = Z + mm(sel_rdiv * rowR, UK)

    t_cat = jnp.concatenate([T_full, s14, s15, t18], axis=1)
    K_C = jnp.concatenate([Kblk(4), Kblk(13), Kblk(14), Kblk(17)], axis=0)
    tK = mm(t_cat, K_C)
    G = mm(sel_rdiv, Ap)
    Ap_flat = mm(G * sel_rmod, ones_colP)
    Z = Z + mm(Ap_flat, tK)

    if mode != "nogroupd":
        M6 = mm(Xab * Rcol_weights, S)
        rowRa = mm(sel_rdiv, R_col)
        M10 = bc_rows(mm(Sb, Xab * rowRa))
        E9 = _tile_concat(Ap, P, P) * blockdiag
        E12 = _tile_concat(mm(Ap, Sexp), P, 1) * crossdiag
        M9 = mm(E9, T_ab)
        M12 = mm(E12, T_ab)
        M13 = mm(E9, T_bc)
        M16 = mm(E9, D_bc)
        M17 = mm(E9, W17)
        M = jnp.concatenate([M6, M9, M10, M12, M13, M16, M17], axis=1)
        K_D = jnp.concatenate(
            [Kblk(i) for i in (5, 8, 9, 11, 12, 15, 16)], axis=0)
        Z = Z + mm(M, K_D)

    out_ref[0] = Z.astype(out_ref.dtype)


def variant(T, A, K, mode):
    B, P = T.shape[0], T.shape[1]
    C, Cout = T.shape[4], K.shape[1]
    N2, PC = P * P, P * C
    A = A.astype(jnp.float32)
    X_ab = T.reshape(B, N2, PC)
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
        ] + [fixed(consts[n].shape) for n in _CONST_NAMES],
        out_specs=pl.BlockSpec((1, N2, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, P=P, C=C, Cout=Cout, mode=mode)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N2, Cout), T.dtype),
    )(X_ab, A, K, *const_args)
    return out.reshape(B, P, P, Cout)


def time_fn(fn, args, chain_len=33, reps=5):
    # Chain on the small adjacency operand (see tools/bench_bank.py).
    def chain(k):
        @jax.jit
        def run(T, A, K):
            def body(a, _):
                Z = fn(T, a, K)
                a = a * (1.0 + 0.0 * Z.mean())
                return a, Z.mean()
            _, zs = jax.lax.scan(body, A, None, length=k)
            return zs.sum()
        return run

    r1, rk = chain(1), chain(chain_len)
    float(r1(*args)); float(rk(*args))

    def best(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, tk = best(r1), best(rk)
    return max((tk - t1) / (chain_len - 1), 1e-9)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    rng = np.random.RandomState(0)
    T = jnp.asarray(rng.randn(B, P, P, P, C), jnp.float32)
    A = jnp.abs(jnp.asarray(rng.randn(B, P, P), jnp.float32))
    K = jnp.asarray(rng.randn(18 * C, C) * 0.1, jnp.float32)

    for mode in ("dma", "reduce", "nogroupd", "novpu", "full"):
        try:
            secs = time_fn(lambda t, a, k, m=mode: variant(t, a, k, m),
                           (T, A, K))
            print(f"{mode:10s}: {secs * 1e3:8.3f} ms")
        except Exception as e:
            print(f"{mode:10s}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
