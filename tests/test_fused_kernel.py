"""Parity tests for the gather-fused Pallas level kernel (interpret mode).

The kernel (ops/risi_fused_pallas.py) computes gather + RisiContraction_18
+ channel matmul + bias + LeakyReLU in one pass; ground truth is the XLA
composition used by the models (itself parity-tested against the
reference binary in test_reference_parity.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphflow_tpu.ops.risi_fused_pallas import (
    risi18_level_fused_raw, risi18_level_fused_v3_raw, pack_state_cm,
    build_xsel, _reference_level)

_RAW_KERNELS = {"v2": risi18_level_fused_raw,
                "v3": risi18_level_fused_v3_raw}


def _case(V, P, C, Cout, seed=0, sentinels=True):
    rng = np.random.RandomState(seed)
    state = jnp.asarray(rng.randn(V, P, P, C), jnp.float32)
    hi = V + 1 if sentinels else V
    nbr = rng.randint(0, hi, size=(V, P)).astype(np.int32)
    pos = np.full((V, P, P), P, np.int32)
    for v in range(V):
        for i in range(P):
            if nbr[v, i] == V:
                continue
            n_valid = rng.randint(1, P + 1)
            pos[v, i, :n_valid] = rng.permutation(P + 1)[:n_valid]
    radj = jnp.asarray(rng.randn(V, P, P), jnp.float32)  # mixed sign: guard
    K = jnp.asarray(rng.randn(18 * C, Cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(Cout) * 0.1, jnp.float32)
    return state, jnp.asarray(nbr), jnp.asarray(pos), radj, K, b


@pytest.mark.parametrize("ver", ["v2", "v3"])
@pytest.mark.parametrize("V,P,C,Cout", [(6, 4, 8, 8), (5, 8, 8, 16),
                                        (4, 4, 16, 8)])
def test_fused_level_parity(V, P, C, Cout, ver):
    state, nbr, pos, radj, K, b = _case(V, P, C, Cout)
    ref = np.asarray(_reference_level(state, nbr, pos, radj, K, b))
    got = np.asarray(_RAW_KERNELS[ver](
        pack_state_cm(state), nbr, build_xsel(pos), radj, K, b,
        interpret=True))
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(ref - got).max() < 1e-4 * scale


@pytest.mark.parametrize("ver", ["v2", "v3"])
def test_fused_level_zero_adjacency_guard(ver):
    """All-negative adjacency must zero every adjacency-weighted case."""
    state, nbr, pos, radj, K, b = _case(5, 4, 8, 8, seed=3)
    radj = -jnp.abs(radj) - 0.1
    ref = np.asarray(_reference_level(state, nbr, pos, radj, K, b))
    got = np.asarray(_RAW_KERNELS[ver](
        pack_state_cm(state), nbr, build_xsel(pos), radj, K, b,
        interpret=True))
    assert np.abs(ref - got).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


@pytest.mark.parametrize("ver", ["v2", "v3"])
def test_fused_level_all_sentinel_slots(ver):
    """A vertex with an empty receptive field contributes bias-only rows."""
    state, nbr, pos, radj, K, b = _case(4, 4, 8, 8, seed=5)
    nbr = nbr.at[2, :].set(4)          # vertex 2: all neighbors absent
    pos = pos.at[2, :, :].set(4)
    ref = np.asarray(_reference_level(state, nbr, pos, radj, K, b))
    got = np.asarray(_RAW_KERNELS[ver](
        pack_state_cm(state), nbr, build_xsel(pos), radj, K, b,
        interpret=True))
    assert np.abs(ref - got).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


@pytest.mark.slow
def test_fused_train_path_grads_match_xla():
    """risi18_level_train (Pallas fwd + Pallas bwd + one-hot scatter) must
    reproduce the XLA composition's gradients exactly."""
    from graphflow_tpu.ops.risi_fused_pallas import risi18_level_train
    from jax.experimental.pallas import tpu as pltpu

    state, nbr, pos, radj, K, b = _case(10, 4, 16, 16, seed=11)

    def loss_ref(s, k, bb):
        return (_reference_level(s, nbr, pos, radj, k, bb) ** 2).sum()

    l_ref = loss_ref(state, K, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(state, K, b)
    with pltpu.force_tpu_interpret_mode():
        def loss_t(s, k, bb):
            return (risi18_level_train(s, nbr, pos, radj, k, bb) ** 2).sum()
        l_t = loss_t(state, K, b)
        g_t = jax.grad(loss_t, argnums=(0, 1, 2))(state, K, b)
    np.testing.assert_allclose(float(l_t), float(l_ref), rtol=1e-5)
    for a, c in zip(g_ref, g_t):
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - c).max()) < 2e-5 * scale


@pytest.mark.slow
def test_fused_level_custom_vjp_matches_xla_grad():
    """risi18_level's VJP equals the autodiff of the XLA composition."""
    from graphflow_tpu.ops.risi_fused_pallas import risi18_level
    state, nbr, pos, radj, K, b = _case(4, 4, 8, 8, seed=7)

    def loss_ref(s, k, bb):
        return (_reference_level(s, nbr, pos, radj, k, bb) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(state, K, b)
    # forward of risi18_level is Pallas; run it in interpret mode
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        def loss_fused(s, k, bb):
            return (risi18_level(s, nbr, pos, radj, k, bb) ** 2).sum()
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(state, K, b)
    for a, c in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-4)

def test_fused_level_v3_bf16_parity():
    """bf16 routes through the v3 kernel (16-row sublane tile padding);
    output must match the f32 XLA composition at bf16 tolerance."""
    state, nbr, pos, radj, K, b = _case(6, 16, 8, 8, seed=13)
    ref = np.asarray(_reference_level(state, nbr, pos, radj, K, b))
    got = np.asarray(risi18_level_fused_v3_raw(
        pack_state_cm(state.astype(jnp.bfloat16)), nbr,
        build_xsel(pos, jnp.bfloat16), radj,
        K.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        interpret=True), np.float32)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(ref - got).max() < 3e-2 * scale


@pytest.mark.slow
def test_fused_train_path_bf16_grads_match_xla():
    """The v3t training path in bf16 (f32 T2 residual, bf16 state/K) must
    track the f32 XLA composition's gradients at bf16 tolerance."""
    from graphflow_tpu.ops.risi_fused_pallas import risi18_level_train
    from jax.experimental.pallas import tpu as pltpu

    state, nbr, pos, radj, K, b = _case(6, 16, 8, 8, seed=17)

    def loss_ref(s, k, bb):
        return (_reference_level(s, nbr, pos, radj, k, bb) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(state, K, b)
    sb, kb, bb16 = (state.astype(jnp.bfloat16), K.astype(jnp.bfloat16),
                    b.astype(jnp.bfloat16))
    with pltpu.force_tpu_interpret_mode():
        def loss_t(s, k, bbb):
            out = risi18_level_train(s, nbr, pos, radj, k, bbb)
            return (out.astype(jnp.float32) ** 2).sum()
        g_t = jax.grad(loss_t, argnums=(0, 1, 2))(sb, kb, bb16)
    for a, c in zip(g_ref, g_t):
        a32 = np.asarray(a, np.float32)
        c32 = np.asarray(c, np.float32)
        scale = max(np.abs(a32).max(), 1.0)
        assert np.abs(a32 - c32).max() < 3e-2 * scale
