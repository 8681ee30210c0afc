"""On-chip microbench: the full TRAINING level step (fwd + bwd from state)
for each implementation path, chained-scan timing as in bench.py.

The backward always includes the gather/alignment adjoint and the scatter
back to dstate, plus dK/db — the complete per-level cost of one training
iteration.

Usage: python tools/bench_train_step.py [V] [P] [C]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench_layer import make_inputs  # noqa: E402  (same input builder)


def _gathered(state, nbr, pos):
    from graphflow_tpu.models.smp2d import _gather_neighbor_tensors
    state_pad = jnp.pad(state, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return _gather_neighbor_tensors(state_pad, nbr, pos)


def level_xla(state, nbr, pos, adj, K):
    from graphflow_tpu.ops.contractions import risi_contraction_18
    V, P, C = state.shape[0], state.shape[1], state.shape[3]
    T = _gathered(state, nbr, pos)
    Y = jax.vmap(risi_contraction_18)(T, adj)
    Z = (Y.reshape(V * P * P, 18 * C) @ K).reshape(V, P * P, -1)
    return jnp.where(Z > 0, Z, 0.01 * Z)


def level_pallas_train(state, nbr, pos, adj, K):
    from graphflow_tpu.ops.risi_pallas import risi18_bank_train
    V, P = state.shape[0], state.shape[1]
    T = _gathered(state, nbr, pos)
    Z = risi18_bank_train(T, adj, K).reshape(V, P * P, -1)
    return jnp.where(Z > 0, Z, 0.01 * Z)


def level_fused_recompute(state, nbr, pos, adj, K):
    from graphflow_tpu.ops.risi_fused_pallas import risi18_level
    b = jnp.zeros((K.shape[1],), state.dtype)
    return risi18_level(state, nbr, pos, adj.astype(jnp.float32), K, b)


def level_v3t(state, nbr, pos, adj, K):
    """Fully fused training path: Pallas fwd (T2 residual) + Pallas bwd."""
    from graphflow_tpu.ops.risi_fused_pallas import risi18_level_train
    b = jnp.zeros((K.shape[1],), state.dtype)
    return risi18_level_train(state, nbr, pos, adj, K, b)


def time_train(fn, args, chain_len=9, reps=5):
    state, nbr, pos, adj, K = args

    def chain(k):
        @jax.jit
        def run(state, nbr, pos, adj, K):
            def body(carry, _):
                s, kk = carry
                def loss(s_, k_):
                    return jnp.sum(fn(s_, nbr, pos, adj, k_) ** 2)
                l, (gs, gk) = jax.value_and_grad(
                    loss, argnums=(0, 1))(s, kk)
                s = s + 1e-12 * gs
                kk = kk + 1e-12 * gk
                return (s, kk), l
            _, ls = jax.lax.scan(body, (state, K), None, length=k)
            return ls.sum()
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
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from graphflow_tpu.models import smp2d

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        args = make_inputs(V, P, C, dtype)
        for gather in ("onehot", "take"):
            smp2d._GATHER_DEFAULT = gather
            for fn, label in ((level_xla, "xla_composition"),
                              (level_pallas_train, "pallas_fwd+bwd_bank")):
                try:
                    secs = time_train(fn, args)
                    print(f"{label:22s} {gather:16s} {name}: "
                          f"{secs * 1e3:8.3f} ms/step")
                except Exception as e:
                    print(f"{label:22s} {gather:16s} {name}: FAILED "
                          f"{type(e).__name__}: {str(e)[:160]}")
        smp2d._GATHER_DEFAULT = "onehot"
        for fn, label in ((level_fused_recompute, "fusedlvl_recompute_bwd"),
                          (level_v3t, "v3t_fused_fwd+bwd")):
            try:
                secs = time_train(fn, args)
                print(f"{label:39s} {name}: {secs * 1e3:8.3f} ms/step")
            except Exception as e:
                print(f"{label:39s} {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
