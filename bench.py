"""Benchmark: the fused second-order SMP layer (RisiContraction_18 + channel
reduction) on the available accelerator.

The reference publishes no numbers (BASELINE.md); its measurement harness is
tests/test_RisiContraction_18_gpu.cu (kernel wall-ms + parity).  This bench
measures the TPU contraction-bank layer at production shapes and reports
GFLOP/s.  vs_baseline is the per-workload speedup over the ACTUAL reference
C++ kernels (RisiContraction_18 + MatMul forward) measured on this machine by
tools/bench_reference.cpp and recorded in BASELINE_MEASURED.json — i.e.
"same task, reference CPU framework vs this TPU framework".

Timing method: the TPU here sits behind a high-latency tunnel (~30 ms RTT),
so per-call host timing is useless.  We run the layer k times inside one
jitted lax.scan (data-dependent chain) and subtract the k=1 time — one
dispatch, RTT cancels.  The chain carries the SMALL adjacency operand
(262 KB), not T: carrying T costs a full 268 MB elementwise read+write of
the carrier per link (~0.35 ms of pure methodology overhead, measured).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time


def layer_flops(B, P, C, n_cases=18):
    """Analytic FLOP count for the bank + K matmul (mul+add = 2)."""
    contraction = 2 * B * (10 * P**3 * C)
    k_matmul = 2 * B * (P * P) * (n_cases * C) * C
    return contraction + k_matmul


def smp_layer(T, A, K, b):
    import jax.numpy as jnp
    from graphflow_tpu.ops.risi_pallas import risi18_matmul_pallas

    # Single-pass one-layout Pallas kernel (fastest bank path measured:
    # 1.18 ms vs 1.78 ms XLA einsum at these shapes, docs/KERNEL_NOTES.md);
    # parity-tested against the brute-force spec and the reference binary.
    z = risi18_matmul_pallas(T, A, K) + b[None, None, :]
    return jnp.where(z > 0, z, 0.01 * z)


def run(device, B=256, P=16, C=32, chain_len=33, reps=5):
    """Median-of-reps chained-scan timing; returns seconds per layer call."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    with jax.default_device(device):
        T = jax.random.normal(k1, (B, P, P, P, C), jnp.float32)
        A = jnp.abs(jax.random.normal(k2, (B, P, P), jnp.float32))
        K = jax.random.normal(k3, (18 * C, C), jnp.float32)
        b = jax.random.normal(k4, (C,), jnp.float32)

        def chain(k):
            @jax.jit
            def run_fn(T, A, K, b):
                def body(Ac, _):
                    Z = smp_layer(T, Ac, K, b)
                    Ac = Ac * (1.0 + 0.0 * Z.mean())
                    return Ac, Z.mean()
                _, zs = jax.lax.scan(body, A, None, length=k)
                return zs.sum()
            return run_fn

        r1, rk = chain(1), chain(chain_len)
        float(r1(T, A, K, b))
        float(rk(T, A, K, b))

        def best(f):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(T, A, K, b))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, tk = best(r1), best(rk)
    return max((tk - t1) / (chain_len - 1), 1e-9)


def main():
    import os
    import jax

    B, P, C = 256, 16, 32
    accel = jax.devices()[0]
    secs = run(accel, B=B, P=P, C=C)
    gflops = layer_flops(B, P, C) / secs / 1e9

    vs_baseline = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base["P"] == P and base["C"] == C:
            ref_per_unit = base["seconds_per_call"] / base["B"]
            vs_baseline = ref_per_unit / (secs / B)

    print(json.dumps({
        "metric": "risi18_layer_gflops",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
