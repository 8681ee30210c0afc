"""Benchmark: the fused second-order SMP layer (RisiContraction_18 + channel
reduction) on the available accelerator.

The reference publishes no numbers (BASELINE.md); its measurement harness is
tests/test_RisiContraction_18_gpu.cu (kernel wall-ms + parity).  This bench
measures the TPU contraction-bank layer at production shapes and reports
GFLOP/s.  vs_baseline is the per-workload speedup over the ACTUAL reference
C++ kernels (RisiContraction_18 + MatMul forward) measured on this machine by
tools/bench_reference.cpp and recorded in BASELINE_MEASURED.json — i.e.
"same task, reference CPU framework vs this TPU framework".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def layer_flops(B, P, C, n_cases=18):
    """Analytic FLOP count for the optimized bank + K matmul (mul+add = 2)."""
    contraction = 2 * B * (10 * P**3 * C)        # shared reductions + matmul cases
    k_matmul = 2 * B * (P * P) * (n_cases * C) * C
    return contraction + k_matmul


def smp_layer(T, A, K, b):
    import jax
    import jax.numpy as jnp
    from graphflow_tpu.ops.contractions import risi_contraction_18

    def per_vertex(t, a):
        y = risi_contraction_18(t, a)
        P = t.shape[0]
        z = y.reshape(P * P, -1) @ K + b[None, :]
        return jnp.where(z > 0, z, 0.01 * z)

    return jax.vmap(per_vertex)(T, A)


def run(device, B=256, P=16, C=32, iters=20, warmup=3):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    with jax.default_device(device):
        T = jax.random.normal(k1, (B, P, P, P, C), jnp.float32)
        A = jnp.abs(jax.random.normal(k2, (B, P, P), jnp.float32))
        K = jax.random.normal(k3, (18 * C, C), jnp.float32)
        b = jax.random.normal(k4, (C,), jnp.float32)
        f = jax.jit(smp_layer)
        out = f(T, A, K, b)
        out.block_until_ready()
        for _ in range(warmup):
            f(T, A, K, b).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(T, A, K, b)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
    return layer_flops(B, P, C) / dt / 1e9


def main():
    import os
    import jax

    B, P, C = 256, 16, 32
    accel = jax.devices()[0]
    gflops = run(accel, B=B, P=P, C=C)

    # Reference baseline: seconds per (P=16, C=32) vertex-neighborhood layer
    # on the reference C++ kernels (tools/bench_reference.cpp).
    vs_baseline = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base["P"] == P and base["C"] == C:
            ref_per_unit = base["seconds_per_call"] / base["B"]
            our_per_unit = layer_flops(B, P, C) / (gflops * 1e9) / B
            vs_baseline = ref_per_unit / our_per_unit

    print(json.dumps({
        "metric": "risi18_layer_gflops",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
