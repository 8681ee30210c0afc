"""On-chip microbench: the FULL second-order SMP level step, from state.

Measures gather (X f X^T alignment) + contraction bank + channel matmul as
one jitted function at production shapes, for each implementation path.
Chained-scan timing (see bench.py) so the tunnel RTT cancels.

Usage: python tools/bench_layer.py [V] [P] [C]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(V, P, C, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    state = jnp.asarray(rng.randn(V, P, P, C), dtype)
    # Random receptive fields: nbr ids in [0, V); pos maps in [0, P+1)
    nbr = jnp.asarray(rng.randint(0, V, size=(V, P)), jnp.int32)
    pos = jnp.asarray(rng.randint(0, P + 1, size=(V, P, P)), jnp.int32)
    adj = jnp.abs(jnp.asarray(rng.randn(V, P, P), dtype))
    K = jnp.asarray(rng.randn(18 * C, C) * 0.1, dtype)
    return state, nbr, pos, adj, K


def layer_xla(state, nbr, pos, adj, K):
    from graphflow_tpu.models.smp2d import _gather_neighbor_tensors
    from graphflow_tpu.ops.contractions import risi_contraction_18

    state_pad = jnp.pad(state, ((0, 0), (0, 1), (0, 1), (0, 0)))
    T = _gather_neighbor_tensors(state_pad, nbr, pos)
    Y = jax.vmap(risi_contraction_18)(T, adj)
    V, P, C = state.shape[0], state.shape[1], state.shape[3]
    Z = Y.reshape(V, P * P, 18 * C) @ K
    return jnp.where(Z > 0, Z, 0.01 * Z).reshape(V, P, P, -1)


def layer_pallas(state, nbr, pos, adj, K):
    from graphflow_tpu.models.smp2d import _gather_neighbor_tensors
    from graphflow_tpu.ops.risi_pallas import risi18_matmul_pallas

    state_pad = jnp.pad(state, ((0, 0), (0, 1), (0, 1), (0, 0)))
    T = _gather_neighbor_tensors(state_pad, nbr, pos)
    Z = risi18_matmul_pallas(T, adj, K)
    return jnp.where(Z > 0, Z, 0.01 * Z)


def layer_fused(state, nbr, pos, adj, K):
    from graphflow_tpu.ops import risi_fused_pallas as rf

    V, P, _, C = state.shape
    b = jnp.zeros((K.shape[1],), state.dtype)
    Z = rf.risi18_level_fused_raw(rf.pack_state_cm(state), nbr,
                                  rf.build_xsel(pos, state.dtype),
                                  adj.astype(jnp.float32), K, b)
    return Z.reshape(V, P, P, -1)


def time_layer(fn, args, chain_len=17, reps=5):
    state = args[0]

    def chain(k):
        @jax.jit
        def run(state, nbr, pos, adj, K):
            def body(s, _):
                Z = fn(s, nbr, pos, adj, K)
                s = s * (1.0 + 0.0 * Z.mean())
                return s, Z.mean()
            _, zs = jax.lax.scan(body, state, None, length=k)
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
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        args = make_inputs(V, P, C, dtype)
        for fn, label in ((layer_xla, "xla_einsum"),
                          (layer_pallas, "pallas_bank"),
                          (layer_fused, "pallas_fused_level")):
            try:
                secs = time_layer(fn, args)
                print(f"{label:24s} {name}: {secs * 1e3:8.3f} ms/layer")
            except Exception as e:
                print(f"{label:24s} {name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
