"""Ablate the v3 fused level kernel: where do its 2.76 ms/level go?

Variants (cumulative removals, timed with the chained-scan method):

  full        production v3 (DMA + align + bank assembly)
  noassemble  DMA + per-slot alignment only (cheap T2all consumer)
  nocol       DMA + row-align only (no per-slot column alignment)
  noalign     DMA only (T2 = raw buffer slice)
  nodma       full compute, no DMA (reads stale buffer)

full - noassemble   = assembly (bank + K matmul) cost
noassemble - nocol  = column-alignment cost (the chunked block-diag kron)
nocol - noalign     = row-alignment cost
noalign             = DMA + loop-overhead floor
full - nodma        = DMA contribution when overlapped with full compute

Usage: python tools/ablate_v3.py [V] [P] [C] [dtype]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from graphflow_tpu.ops import risi_fused_pallas as rf

    V = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    dt = jnp.dtype(sys.argv[4] if len(sys.argv) > 4 else "float32")

    rng = np.random.RandomState(0)
    state = jnp.asarray(rng.randn(V, P, P, C), dt)
    nbr = jnp.asarray(rng.randint(0, V, size=(V, P)), jnp.int32)
    pos = jnp.asarray(rng.randint(0, P + 1, size=(V, P, P)), jnp.int32)
    adj = jnp.abs(jnp.asarray(rng.randn(V, P, P), jnp.float32))
    K = jnp.asarray(rng.randn(18 * C, C) * 0.1, dt)
    b = jnp.zeros((C,), dt)

    state_cm = rf.pack_state_cm(state)
    xsel = rf.build_xsel(pos, dt)

    def level(ablate):
        def fn(state_cm, nbr, xsel, adj, K, b):
            return rf.risi18_level_fused_v3_raw(
                state_cm, nbr, xsel, adj, K, b, ablate=ablate)
        return fn

    def chain_time(fn, chain_len=9, reps=5):
        def chain(k):
            @jax.jit
            def run(state_cm, nbr, xsel, adj, K, b):
                def body(a, _):
                    Z = fn(state_cm, nbr, xsel, a, K, b)
                    a = a * (1.0 + 0.0 * Z.astype(jnp.float32).mean())
                    return a, Z.astype(jnp.float32).mean()
                _, zs = jax.lax.scan(body, adj, None, length=k)
                return zs.sum()
            return run

        r1, rk = chain(1), chain(chain_len)
        args = (state_cm, nbr, xsel, adj, K, b)
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

    results = {}
    for name, ab in (("full", ()),
                     ("noassemble", ("noassemble",)),
                     ("nocol", ("nocol", "noassemble")),
                     ("noalign", ("noalign", "noassemble")),
                     ("nodma", ("nodma",))):
        secs = chain_time(level(ab))
        results[name] = secs
        print(f"{name:12s} {secs*1e3:7.3f} ms/level", flush=True)

    f, na, nc, nl, nd = (results[k] for k in
                         ("full", "noassemble", "nocol", "noalign", "nodma"))
    print(f"\nassembly       : {(f - na)*1e3:7.3f} ms")
    print(f"column align   : {(na - nc)*1e3:7.3f} ms")
    print(f"row align      : {(nc - nl)*1e3:7.3f} ms")
    print(f"dma+loop floor : {nl*1e3:7.3f} ms")
    print(f"dma overlap    : {(f - nd)*1e3:7.3f} ms (full - nodma)")


if __name__ == "__main__":
    main()
