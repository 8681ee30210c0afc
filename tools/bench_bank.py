"""On-chip microbench: the contraction BANK + channel matmul only (from a
materialized T) — the workload of bench.py — for each implementation path.

Usage: python tools/bench_bank.py [B] [P] [C]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(B, P, C, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    T = jnp.asarray(rng.randn(B, P, P, P, C), dtype)
    A = jnp.abs(jnp.asarray(rng.randn(B, P, P), dtype))
    K = jnp.asarray(rng.randn(18 * C, C) * 0.1, dtype)
    return T, A, K


def bank_xla(T, A, K):
    from graphflow_tpu.ops.contractions import risi_contraction_18
    B, P, C = T.shape[0], T.shape[1], T.shape[4]
    Y = jax.vmap(risi_contraction_18)(T, A)
    Z = (Y.reshape(B * P * P, 18 * C) @ K).reshape(B, P * P, -1)
    return jnp.where(Z > 0, Z, 0.01 * Z)


def bank_fused_xla(T, A, K):
    from graphflow_tpu.ops.fused import risi18_matmul_fused
    Z = jax.vmap(lambda t, a: risi18_matmul_fused(t, a, K))(T, A)
    B, P = T.shape[0], T.shape[1]
    Z = Z.reshape(B, P * P, -1)
    return jnp.where(Z > 0, Z, 0.01 * Z)


def bank_pallas(T, A, K):
    from graphflow_tpu.ops.risi_pallas import risi18_matmul_pallas
    Z = risi18_matmul_pallas(T, A, K)
    B, P = T.shape[0], T.shape[1]
    Z = Z.reshape(B, P * P, -1)
    return jnp.where(Z > 0, Z, 0.01 * Z)


def time_fn(fn, args, chain_len=33, reps=5):
    # Chain on the SMALL adjacency operand: carrying T costs a full
    # read+write of T per link (~0.35 ms of methodology overhead).
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

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        args = make_inputs(B, P, C, dtype)
        for fn, label in ((bank_xla, "xla_einsum_bank"),
                          (bank_fused_xla, "xla_lowrank_fused"),
                          (bank_pallas, "pallas_bank")):
            try:
                secs = time_fn(fn, args)
                print(f"{label:24s} {name}: {secs * 1e3:8.3f} ms")
            except Exception as e:
                print(f"{label:24s} {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
