"""SpMM round 2: kill the [V*D, H] materialization around the flat gather.

Round-1 findings (tools/bench_spmm.py on-chip, V=8192 D=16 H=64):
  flat gather + promise_in_bounds + einsum = 112.9 us (1.16 Gedges/s),
  which matches HBM-BW-bound traffic INCLUDING a full write+read of the
  gathered [V*D, H] tensor (~101 MB total).  The gather itself runs at
  full HBM bandwidth.  bf16 slotloop gather was SLOWER (row-rate path).

Candidates here try to keep ONE big gather but fuse the FMA+reduction:
  mulsum      (g * w).reshape(V, D, H).sum(1)  (reduce fusion pulls in mul)
  chunk_g4/g8 D split into groups: per group one flat gather + fused
              mul+sum, accumulated — bounds materialization to g*V rows
  bf16_flat   flat_pib on bf16 h (halves gather bytes if BW-bound)
  bf16_mulsum mulsum on bf16
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(make_chain, args, chain_len=65, reps=5):
    r1, rk = make_chain(1), make_chain(chain_len)
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


def timed(spmm_fn, nbr, w, h, chain_len=65):
    def chain(k):
        @jax.jit
        def run(nbr, w, h):
            def body(hh, _):
                out = spmm_fn(nbr, w, hh)
                return out.astype(hh.dtype), out.astype(jnp.float32).mean()
            _, zs = jax.lax.scan(body, h, None, length=k)
            return zs.sum()
        return run
    return chain_time(chain, (nbr, w, h), chain_len)


def spmm_flat_pib(nbr, w, h):
    V, H = h.shape
    D = nbr.shape[1]
    g = h.at[nbr.reshape(-1)].get(mode="promise_in_bounds").reshape(V, D, H)
    return jnp.einsum("vd,vdh->vh", w, g.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def spmm_mulsum(nbr, w, h):
    V, H = h.shape
    D = nbr.shape[1]
    g = h.at[nbr.reshape(-1)].get(mode="promise_in_bounds")
    prod = g.astype(jnp.float32) * w.reshape(-1)[:, None]
    return prod.reshape(V, D, H).sum(axis=1)


def make_chunked(gsize):
    def spmm_chunked(nbr, w, h):
        V, H = h.shape
        D = nbr.shape[1]
        acc = jnp.zeros((V, H), jnp.float32)
        for k in range(0, D, gsize):
            ids = nbr[:, k:k + gsize].reshape(-1)
            g = h.at[ids].get(mode="promise_in_bounds")
            prod = g.astype(jnp.float32) * w[:, k:k + gsize].reshape(-1)[:, None]
            acc = acc + prod.reshape(V, gsize, H).sum(axis=1)
        return acc
    return spmm_chunked


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    rng = np.random.RandomState(0)
    nbr = jnp.asarray(rng.randint(0, V, size=(V, D)), jnp.int32)
    w = jnp.asarray(rng.rand(V, D), jnp.float32)
    h = jnp.asarray(rng.randn(V, H), jnp.float32)
    n_edges = V * D

    ref = np.zeros((V, H), np.float64)
    nb, wn = np.asarray(nbr), np.asarray(w)
    hn = np.asarray(h, np.float64)
    for d in range(D):
        ref += wn[:, d:d + 1] * hn[nb[:, d]]

    def report(name, fn, hh):
        try:
            out = np.asarray(jax.jit(fn)(nbr, w, hh), np.float64)
            err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-30)
            secs = timed(fn, nbr, w, hh)
            print(f"{name:16s} {secs*1e6:9.1f} us  "
                  f"{n_edges/secs/1e6:9.1f} Medges/s  relerr {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED {type(e).__name__}: {e}", flush=True)

    report("flat_pib", spmm_flat_pib, h)
    report("mulsum", spmm_mulsum, h)
    report("chunk_g2", make_chunked(2), h)
    report("chunk_g4", make_chunked(4), h)
    report("chunk_g8", make_chunked(8), h)
    h16 = h.astype(jnp.bfloat16)
    report("bf16_flat", spmm_flat_pib, h16)
    report("bf16_mulsum", spmm_mulsum, h16)
    report("bf16_chunk_g4", make_chunked(4), h16)


if __name__ == "__main__":
    main()
