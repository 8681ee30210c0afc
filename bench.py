"""Benchmark: the second-order SMP hot path + sparse aggregation on the
available accelerator.

The reference publishes no numbers (BASELINE.md); its measurement harness is
tests/test_RisiContraction_18_gpu.cu (kernel wall-ms + parity).  This bench
measures, at production shapes (V=256 vertex neighborhoods, P=16, C=32):

  headline  bank-from-materialized-T layer (RisiContraction_18 + channel
            matmul), the Pallas one-layout kernel — comparable to the
            round-1/2 records and to the reference C++ kernels measured on
            THIS machine (tools/bench_reference.cpp, BASELINE_MEASURED.json)
  extra     the FULL fused level step from state (gather included), f32 and
            bf16; one training level step (fwd+bwd+param grads); ELLPACK
            SpMM edges/s on a V=8192 graph (BASELINE.json's first metric);
            MFU vs the chip's bf16 peak; and an ON-CHIP parity check of the
            Pallas bank against the float64 NumPy contraction spec so a
            fast-but-wrong kernel can never ship a number.

Timing method: the TPU here sits behind a high-latency tunnel (~30 ms RTT),
so per-call host timing is useless.  We run the op k times inside one jitted
lax.scan (data-dependent chain) and subtract the k=1 time — one dispatch,
RTT cancels.  Chains carry a SMALL operand (carrying the big tensor costs a
full read+write of it per link, ~0.35 ms of methodology overhead, measured —
docs/KERNEL_NOTES.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import time

# device_kind reports "TPU v5 lite" (v5e, public bf16 peak 197 TFLOP/s),
# but the calibration matmul has measured up to ~300 TFLOP/s through the
# tunnel — the real clock/part behind the proxy is uncertain, so treat
# mfu_pct_vs_bf16_peak as a lower-bound-denominator convention and use
# device_calib_bf16_matmul_tflops to compare rounds.
V5E_BF16_PEAK = 197e12


def layer_flops(B, P, C, n_cases=18):
    """Analytic FLOP count for the bank + K matmul (mul+add = 2)."""
    contraction = 2 * B * (10 * P**3 * C)
    k_matmul = 2 * B * (P * P) * (n_cases * C) * C
    return contraction + k_matmul


def _best(f, args, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _chain_time(make_chain, args, chain_len, reps=5):
    """Median chained-scan timing: seconds per inner call."""
    r1, rk = make_chain(1), make_chain(chain_len)
    float(r1(*args))
    float(rk(*args))
    t1, tk = _best(r1, args, reps), _best(rk, args, reps)
    return max((tk - t1) / (chain_len - 1), 1e-9)


# ----------------------------------------------------------------------
# 0. Device-speed calibration: the tunneled chip's effective speed swings
#    ~2x between sessions (measured: identical compiled SpMM programs at
#    112.9 us vs 269 us on different days — docs/KERNEL_NOTES.md).  A
#    known-roofline dense matmul pins down the chip state so recorded
#    numbers are comparable across rounds.
# ----------------------------------------------------------------------

def run_gather_calibration(V=65536, H=64, chain_len=129, reps=5):
    """Flat row-gather GB/s on a fixed [V, H] f32 array.

    The ~2x cross-session speed swing CONCENTRATES in gather throughput
    while matmul-bound kernels stay stable (docs/KERNEL_NOTES.md, round-4
    variance analysis) — so gather-bound numbers (spmm_edges_per_s) are
    only comparable across rounds as a ratio to THIS calibration, not to
    the matmul one.

    A per-link workload of 32 MB (read + write) keeps the chained-scan
    delta well above tunnel RTT noise (an 8192x64 version measured 4 MB
    links and the k-vs-1 delta collapsed into the noise floor).  The
    scalar carry feeds the index so the links cannot be reordered.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(V, H), jnp.float32)
    idx = jnp.asarray(rng.randint(0, V, size=(V,)), jnp.int32)

    def chain(k):
        @jax.jit
        def run_fn(x, idx):
            def body(c, _):
                idx2 = idx + (c * 0).astype(jnp.int32)   # order dependency
                out = jnp.take(x, idx2, axis=0)
                return out[0, 0], out[1, 1]
            _, zs = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return zs.sum()
        return run_fn

    secs = _chain_time(chain, (x, idx), chain_len, reps)
    bytes_moved = 2 * V * H * 4          # read + write
    return bytes_moved / secs / 1e9


def run_calibration(n=4096, chain_len=17, reps=5):
    """bf16 [n,n]@[n,n] achieved TFLOP/s (peak ~197 on v5e)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (n, n), jnp.bfloat16)

    def chain(k):
        @jax.jit
        def run_fn(A):
            def body(x, _):
                y = jnp.dot(x, A, preferred_element_type=jnp.bfloat16)
                # renormalize so the chain cannot overflow
                return y / jnp.float32(n).astype(jnp.bfloat16), y[0, 0]
            _, zs = jax.lax.scan(body, A, None, length=k)
            return zs.astype(jnp.float32).sum()
        return run_fn

    secs = _chain_time(chain, (A,), chain_len, reps)
    return 2 * n ** 3 / secs / 1e12


# ----------------------------------------------------------------------
# 1. Headline: bank + K matmul from a materialized T (round-1/2 metric)
# ----------------------------------------------------------------------

def smp_layer(T, A, K, b):
    import jax.numpy as jnp
    from graphflow_tpu.ops.risi_pallas import risi18_matmul_pallas

    # Single-pass one-layout Pallas kernel (fastest bank path measured,
    # docs/KERNEL_NOTES.md); parity-tested against the reference binary.
    z = risi18_matmul_pallas(T, A, K) + b[None, None, :]
    return jnp.where(z > 0, z, 0.01 * z)


def run_bank(B=256, P=16, C=32, chain_len=33, reps=5):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
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

    return _chain_time(chain, (T, A, K, b), chain_len, reps)


# ----------------------------------------------------------------------
# 2. Full fused level step from state (gather included)
# ----------------------------------------------------------------------

def _level_inputs(V, P, C, dtype, seed=0):
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(seed)
    state = jnp.asarray(rng.randn(V, P, P, C), dtype)
    nbr = jnp.asarray(rng.randint(0, V, size=(V, P)), jnp.int32)
    pos = jnp.asarray(rng.randint(0, P + 1, size=(V, P, P)), jnp.int32)
    adj = jnp.abs(jnp.asarray(rng.randn(V, P, P), jnp.float32))
    K = jnp.asarray(rng.randn(18 * C, C) * 0.1, dtype)
    b = jnp.zeros((C,), dtype)
    return state, nbr, pos, adj, K, b


def run_level(V=256, P=16, C=32, dtype="float32", chain_len=9, reps=5):
    """The production inference level step (state -> state): the fused v3
    Pallas kernel for both dtypes (bf16 tile-pads to sublane 16 and halves
    the neighbor-DMA traffic; smp2d_states routing)."""
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype)
    args = _level_inputs(V, P, C, dt)

    def level(state, nbr, pos, adj, K, b):
        from graphflow_tpu.ops.risi_fused_pallas import risi18_level
        return risi18_level(state, nbr, pos, adj, K, b)

    def chain(k):
        @jax.jit
        def run_fn(state, nbr, pos, adj, K, b):
            def body(s, _):
                Z = level(s, nbr, pos, adj, K, b)
                s = s * (1.0 + 0.0 * Z.astype(s.dtype).mean())
                return s, Z.mean()
            _, zs = jax.lax.scan(body, state, None, length=k)
            return zs.sum()
        return run_fn

    return _chain_time(chain, args, chain_len, reps)


def run_train_level(V=256, P=16, C=32, dtype="float32", chain_len=9,
                    reps=5):
    """One training level step: fwd + bwd to state and K (the production
    training routing for both dtypes: the fully fused v3t path — Pallas
    forward with T2 residual, Pallas backward, one-hot-matmul scatter)."""
    import jax
    import jax.numpy as jnp

    args = _level_inputs(V, P, C, jnp.dtype(dtype))

    def level(state, nbr, pos, adj, K):
        from graphflow_tpu.ops.risi_fused_pallas import risi18_level_train
        b = jnp.zeros((C,), state.dtype)
        return risi18_level_train(state, nbr, pos, adj, K, b)

    def chain(k):
        @jax.jit
        def run_fn(state, nbr, pos, adj, K, b):
            def body(carry, _):
                s, kk = carry
                def loss(s_, k_):
                    out = level(s_, nbr, pos, adj, k_)
                    return jnp.sum(out.astype(jnp.float32) ** 2)
                l, (gs, gk) = jax.value_and_grad(loss, argnums=(0, 1))(s, kk)
                return (s + 1e-12 * gs, kk + 1e-12 * gk), l
            _, ls = jax.lax.scan(body, (state, K), None, length=k)
            return ls.sum()
        return run_fn

    return _chain_time(chain, args, chain_len, reps)


def run_train_step_production(V=256, P=16, C=32, L=2, chain_len=5, reps=5):
    """END-TO-END train step at the production kernel shapes (VERDICT r4
    weak item 5: the level-step and whole-model numbers lived in different
    regimes).  One synthetic prepared graph at V=256/P=16/C=32, the full
    smp2d forward (fused v3t levels + head) + loss + backward + Adam
    update, timed as a chained scan.  Returns seconds per full step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graphflow_tpu.models.smp2d import (SMP2DConfig, init_smp2d_params,
                                            smp2d_forward)
    from graphflow_tpu import optim as optim_lib

    cfg = SMP2DConfig(max_nVertices=V, max_receptive_field=P, nLevels=L,
                      nChanels=C, nFeatures=4, nDepth=0)
    params = init_smp2d_params(jax.random.PRNGKey(0), cfg)
    opt = optim_lib.make_optimizer("adam")
    opt_state = opt.init(params)

    rng = np.random.RandomState(0)
    g = {
        "wl_feat": jnp.asarray(rng.randn(V, 4), jnp.float32),
        "vmask": jnp.ones((V,), jnp.float32),
        "sizes": jnp.full((L + 1, V), P, jnp.int32),
        "nbr": jnp.asarray(rng.randint(0, V, (L, V, P)), jnp.int32),
        "pos": jnp.asarray(rng.randint(0, P + 1, (L, V, P, P)), jnp.int32),
        "radj": jnp.abs(jnp.asarray(rng.randn(L, V, P, P), jnp.float32)),
        "smask": jnp.ones((L + 1, V, P, P), jnp.float32),
    }
    target = jnp.float32(3.0)

    def chain(k):
        @jax.jit
        def run_fn(params, opt_state, g):
            def body(carry, _):
                p, s = carry

                def loss_fn(p_):
                    pred, _ = smp2d_forward(p_, g, cfg, training=True)
                    return 0.5 * (pred - target) ** 2

                loss, grads = jax.value_and_grad(loss_fn)(p)
                p, s = opt.update(p, s, grads, 1e-4, nBatch=1)
                return (p, s), loss
            (_, _), ls = jax.lax.scan(body, (params, opt_state), None,
                                      length=k)
            return ls.sum()
        return run_fn

    return _chain_time(chain, (params, opt_state, g), chain_len, reps)


# ----------------------------------------------------------------------
# 3. Sparse aggregation edges/s (BASELINE.json's first metric)
# ----------------------------------------------------------------------

def run_edges(V=8192, D=16, H=64, chain_len=65, reps=5):
    """ELLPACK SpMM at large-graph shapes; returns (secs, edges)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graphflow_tpu.ops.sparse import ell_spmm

    rng = np.random.RandomState(0)
    nbr = jnp.asarray(rng.randint(0, V, size=(V, D)), jnp.int32)
    w = jnp.asarray(rng.rand(V, D), jnp.float32)
    h = jnp.asarray(rng.randn(V, H), jnp.float32)

    def chain(k):
        @jax.jit
        def run_fn(nbr, w, h):
            def body(hh, _):
                out = ell_spmm(nbr, w, hh)
                return out, out.mean()
            _, zs = jax.lax.scan(body, h, None, length=k)
            return zs.sum()
        return run_fn

    secs = _chain_time(chain, (nbr, w, h), chain_len, reps)
    return secs, V * D


# ----------------------------------------------------------------------
# 3b. Whole-model number (VERDICT r3 item 6): full SMP_omega BatchLearn
#     at the BASELINE.md round-1 workload so end-to-end regressions are
#     visible every round (reference analog tests/test_SMP_omega.cpp:151-207).
# ----------------------------------------------------------------------

def run_model(nMol=16, V=20, rf=10, L=3, C=20, reps=5):
    """Returns (batchlearn_seconds, predict_batched_seconds_per_mol).

    Same molecule distribution/config as tools/bench_model.py and the
    reference harness tools/bench_reference_model.cpp (recorded in
    BASELINE_MEASURED.json's "model" section).  Wall-clock includes host
    prep + tunnel RTT — an upper bound on real cost.
    """
    import numpy as np
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_model import make_molecules
    from graphflow_tpu.models import SMP_omega

    graphs, targets = make_molecules(nMol, V)
    model = SMP_omega(max_nVertices=V, max_receptive_field=rf, nLevels=L,
                      nChanels=C, nFeatures=4, nDepth=5, seed=0)
    model.BatchLearn(graphs, targets, 1e-4)          # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        model.BatchLearn(graphs, targets, 1e-4)
        times.append(time.perf_counter() - t0)
    model.Threaded_Predict(graphs)                    # compile + warm
    tp = []
    for _ in range(reps):
        t0 = time.perf_counter()
        model.Threaded_Predict(graphs)
        tp.append(time.perf_counter() - t0)
    return float(np.median(times)), float(np.median(tp)) / nMol


# ----------------------------------------------------------------------
# 4. On-chip parity gate (a Mosaic regression cannot ship a fast number)
# ----------------------------------------------------------------------

def parity_check(B=16, P=16, C=32):
    """On-chip bank parity vs the CPU einsum spec.  Uses the PRODUCTION
    (P, C) — off-tile instantiations (e.g. P=8, C=16) take Mosaic minutes
    to compile and are not what the bench measures anyway."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graphflow_tpu.ops.risi_pallas import risi18_matmul_pallas
    from graphflow_tpu.ops.contractions import risi_contraction_18

    rng = np.random.RandomState(7)
    T = rng.randn(B, P, P, P, C).astype(np.float32)
    A = np.abs(rng.randn(B, P, P)).astype(np.float32)
    K = (rng.randn(18 * C, C) * 0.1).astype(np.float32)

    got = np.asarray(jax.jit(risi18_matmul_pallas)(
        jnp.asarray(T), jnp.asarray(A), jnp.asarray(K))
        ).reshape(B, P * P, C)
    # ground truth through the einsum spec on CPU (f32, HIGHEST precision)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        Y = jax.vmap(risi_contraction_18)(jnp.asarray(T), jnp.asarray(A))
        want = np.asarray(Y.reshape(B, P * P, 18 * C) @ jnp.asarray(K))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-30)
    # DEFAULT MXU precision is bf16-level: gate at 1e-2 relative.
    assert err < 1e-2, f"on-chip bank parity FAILED: rel err {err}"
    return float(err)


def main():
    import os
    import sys
    import jax

    def note(msg):
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    B, P, C = 256, 16, 32
    note("parity gate")
    parity_err = parity_check()

    note("device calibration")
    calib_tflops = run_calibration()
    note("gather calibration")
    calib_gather = run_gather_calibration()

    note("bank layer")
    secs = run_bank(B=B, P=P, C=C)
    gflops = layer_flops(B, P, C) / secs / 1e9

    note("level f32")
    level_f32 = run_level(V=B, P=P, C=C, dtype="float32")
    note("level bf16")
    level_bf16 = run_level(V=B, P=P, C=C, dtype="bfloat16")
    note("train level")
    train_f32 = run_train_level(V=B, P=P, C=C)
    note("train level bf16")
    train_bf16 = run_train_level(V=B, P=P, C=C, dtype="bfloat16")

    # VERDICT r4 item 3: the C=128 escape hatch.  The op-issue-wall
    # analysis (docs/KERNEL_NOTES.md) says the v3 kernel is bound by
    # scalar-core op issue at C=32 (~1.3% MFU) and predicts ~4x MXU payload
    # per op at C=128 with the same op count — measure it instead of
    # arguing it.
    c128 = {}
    for cw in (64, 128):
        try:
            note(f"level f32 C={cw}")
            l_f32 = run_level(V=B, P=P, C=cw, dtype="float32", chain_len=5)
            note(f"level bf16 C={cw}")
            l_bf16 = run_level(V=B, P=P, C=cw, dtype="bfloat16",
                               chain_len=5)
            fl = layer_flops(B, P, cw)
            c128.update({
                f"level_step_ms_f32_c{cw}": round(l_f32 * 1e3, 3),
                f"level_step_gflops_f32_c{cw}": round(fl / l_f32 / 1e9, 2),
                f"level_step_ms_bf16_c{cw}": round(l_bf16 * 1e3, 3),
                f"level_step_gflops_bf16_c{cw}": round(fl / l_bf16 / 1e9,
                                                       2),
            })
        except Exception as e:   # Mosaic/compile trouble: record and go on
            note(f"level C={cw} failed: {type(e).__name__}")
            c128[f"level_step_c{cw}_error"] = str(e)[:160]
    note("spmm edges")
    edge_secs, n_edges = run_edges()
    note("production train step")
    try:
        prod_step = run_train_step_production(V=B, P=P, C=C)
    except Exception as e:
        note(f"production step failed: {type(e).__name__}")
        prod_step = None
    note("whole model")
    model_bl_s, model_pred_s = run_model()
    note("done")

    vs_baseline = 1.0
    model_vs_ref = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base["P"] == P and base["C"] == C:
            ref_per_unit = base["seconds_per_call"] / base["B"]
            vs_baseline = ref_per_unit / (secs / B)
        ref_model = base.get("model", {}).get("reference_serial", {})
        if ref_model.get("batchlearn_seconds"):
            model_vs_ref = round(
                ref_model["batchlearn_seconds"] / model_bl_s, 1)

    lvl_flops = layer_flops(B, P, C)  # bank+K dominates the level step
    print(json.dumps({
        "metric": "risi18_layer_gflops",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs_baseline, 2),
        "extra": {
            "bank_ms_f32": round(secs * 1e3, 3),
            "level_step_ms_f32": round(level_f32 * 1e3, 3),
            "level_step_gflops_f32": round(lvl_flops / level_f32 / 1e9, 2),
            "level_step_ms_bf16": round(level_bf16 * 1e3, 3),
            "train_level_ms_f32": round(train_f32 * 1e3, 3),
            "train_level_gflops_f32": round(3 * lvl_flops / train_f32 / 1e9,
                                            2),
            "train_level_ms_bf16": round(train_bf16 * 1e3, 3),
            "spmm_edges_per_s": round(n_edges / edge_secs / 1e6, 2),
            "spmm_edges_unit": "Medges/s/chip (V=8192, D=16, H=64)",
            # SpMM is gather-bound; only the ratio to the gather
            # calibration is comparable across rounds/sessions.
            "spmm_edges_per_gather_gbps": round(
                n_edges / edge_secs / 1e6 / calib_gather, 3),
            # LOWER-BOUND convention: the denominator is the v5e public
            # bf16 peak (197 TF), but the calibration matmul has measured
            # up to ~300 TF through the tunnel proxy — the true peak of
            # the part is uncertain, so treat this as a floor.
            "mfu_pct_vs_bf16_peak_lowerbound": round(
                100 * gflops * 1e9 / V5E_BF16_PEAK, 2),
            "prod_train_step_ms": (round(prod_step * 1e3, 3)
                                   if prod_step else None),
            "prod_train_step_workload": "SMP_omega-shape full train step "
                                        "(fwd+bwd+Adam), V=256 P=16 C=32 "
                                        "L=2, one synthetic graph",
            "model_batchlearn_s": round(model_bl_s, 4),
            "model_batchlearn_workload": "SMP_omega 16 mols V=20 rf=10 "
                                         "L=3 C=20 (BASELINE.md table)",
            "model_batchlearn_vs_ref_serial": model_vs_ref,
            "model_predict_batched_ms_per_mol": round(model_pred_s * 1e3, 3),
            "device_calib_bf16_matmul_tflops": round(calib_tflops, 1),
            "device_calib_gather_gbps": round(calib_gather, 1),
            "device_calib_note": "chip speed swings ~2x across sessions "
                                 "(the swing concentrates in gather "
                                 "throughput); compare matmul-bound rounds "
                                 "via the matmul calib and gather-bound "
                                 "rounds via the gather calib",
            "onchip_bank_parity_relerr": parity_err,
            **c128,
        },
    }))


if __name__ == "__main__":
    main()
