"""Fused-layer and Pallas-kernel parity tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphflow_tpu.ops import contractions
from graphflow_tpu.ops.fused import (
    risi18_matmul_fused, risi18_matmul_reference, smp2d_layer_fused,
)


def _inputs(rng, P=6, C=4, Co=5, B=None):
    shape = (P, P, P, C) if B is None else (B, P, P, P, C)
    T = rng.standard_normal(shape)
    a_shape = (P, P) if B is None else (B, P, P)
    A = np.abs(rng.standard_normal(a_shape))
    K = rng.standard_normal((18 * C, Co))
    return jnp.asarray(T), jnp.asarray(A), jnp.asarray(K)


class TestFused:
    def test_fused_equals_unfused(self, rng):
        T, A, K = _inputs(rng)
        a = risi18_matmul_reference(T, A, K)
        b = risi18_matmul_fused(T, A, K)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)

    def test_fused_with_negative_adjacency(self, rng):
        """The adj > 0 guard must be inside the fusion too."""
        T, A, K = _inputs(rng)
        A = A - float(np.median(np.asarray(A)))  # half negative
        a = risi18_matmul_reference(T, A, K)
        b = risi18_matmul_fused(T, A, K)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)

    def test_fused_gradients_match(self, rng):
        T, A, K = _inputs(rng, P=4, C=3, Co=3)

        def loss_ref(t, k):
            return jnp.sum(risi18_matmul_reference(t, A, k) ** 2)

        def loss_fus(t, k):
            return jnp.sum(risi18_matmul_fused(t, A, k) ** 2)

        gt_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(T, K)
        gt_f, gk_f = jax.grad(loss_fus, argnums=(0, 1))(T, K)
        np.testing.assert_allclose(np.asarray(gt_r), np.asarray(gt_f),
                                   rtol=1e-8)
        np.testing.assert_allclose(np.asarray(gk_r), np.asarray(gk_f),
                                   rtol=1e-8)

    def test_layer_leaky_relu(self, rng):
        T, A, K = _inputs(rng, Co=4)
        b = jnp.asarray(rng.standard_normal(4))
        z = smp2d_layer_fused(T, A, K, b)
        raw = risi18_matmul_fused(T, A, K) + b[None, None, :]
        np.testing.assert_allclose(
            np.asarray(z), np.where(np.asarray(raw) > 0, np.asarray(raw),
                                    0.01 * np.asarray(raw)), rtol=1e-6)


class TestPallasKernel:
    """The Pallas kernel runs in interpreter mode on CPU (compiled-mode
    parity is exercised on real TPU by the bench/verify drives)."""

    def test_interpret_mode_parity(self, rng):
        from jax.experimental.pallas import tpu as pltpu
        from graphflow_tpu.ops import risi_pallas
        T, A, K = _inputs(rng, P=8, C=8, Co=8, B=2)
        T, A, K = (x.astype(jnp.float32) for x in (T, A, K))
        with pltpu.force_tpu_interpret_mode():
            z = risi_pallas.risi18_matmul_pallas(T, A, K)
        ref = jax.vmap(lambda t, a: risi18_matmul_fused(t, a, K))(T, A)
        np.testing.assert_allclose(np.asarray(z), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_custom_vjp_backward(self, rng):
        from jax.experimental.pallas import tpu as pltpu
        from graphflow_tpu.ops import risi_pallas
        T, A, K = _inputs(rng, P=8, C=8, Co=8, B=2)
        T, A, K = (x.astype(jnp.float32) for x in (T, A, K))

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(lambda t: jnp.sum(
                risi_pallas.risi18_layer(t, A, K) ** 2))(T)
        g_ref = jax.grad(lambda t: jnp.sum(
            jax.vmap(lambda ti, ai: risi18_matmul_fused(ti, ai, K))(t, A)
            ** 2))(T)
        # f32 interpret-mode accumulation-order differences amplify through
        # the squared-loss cotangent; compare with a scaled tolerance.
        denom = np.abs(np.asarray(g_ref)).max()
        rel = np.abs(np.asarray(g) - np.asarray(g_ref)).max() / denom
        assert rel < 2e-3, rel


class TestPallasBackwardKernel:
    """The mirrored Pallas backward (risi18_matmul_pallas_bwd): dT and dK
    in one pass, interpret mode on CPU (on-chip parity via bench/verify)."""

    def test_bwd_kernel_parity(self, rng):
        from jax.experimental.pallas import tpu as pltpu
        from graphflow_tpu.ops import risi_pallas
        T, A, K = _inputs(rng, P=8, C=8, Co=8, B=2)
        T, A, K = (x.astype(jnp.float32) for x in (T, A, K))
        A = A - float(np.median(np.asarray(A)))  # exercise the adj>0 guard
        g = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)

        def ref(t, k):
            return jax.vmap(lambda ti, ai: risi18_matmul_fused(ti, ai, k))(
                t, A)

        _, vjp = jax.vjp(ref, T, K)
        dT_ref, dK_ref = vjp(g)
        with pltpu.force_tpu_interpret_mode():
            dT, dK = risi_pallas.risi18_matmul_pallas_bwd(T, A, K, g)
        np.testing.assert_allclose(np.asarray(dT), np.asarray(dT_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dK), np.asarray(dK_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_bank_train_grad(self, rng):
        """risi18_bank_train's custom_vjp == autodiff of the XLA fusion."""
        from jax.experimental.pallas import tpu as pltpu
        from graphflow_tpu.ops import risi_pallas
        T, A, K = _inputs(rng, P=8, C=8, Co=8, B=2)
        T, A, K = (x.astype(jnp.float32) for x in (T, A, K))

        with pltpu.force_tpu_interpret_mode():
            gT, gK = jax.grad(
                lambda t, k: jnp.sum(
                    risi_pallas.risi18_bank_train(t, A, k) ** 2),
                argnums=(0, 1))(T, K)
        gT_ref, gK_ref = jax.grad(
            lambda t, k: jnp.sum(jax.vmap(
                lambda ti, ai: risi18_matmul_fused(ti, ai, k))(t, A) ** 2),
            argnums=(0, 1))(T, K)
        # Squared-loss cotangents amplify f32 accumulation-order noise;
        # compare max-norm relative (as test_custom_vjp_backward).
        for got, want in ((gT, gT_ref), (gK, gK_ref)):
            denom = np.abs(np.asarray(want)).max()
            rel = np.abs(np.asarray(got) - np.asarray(want)).max() / denom
            assert rel < 2e-3, rel
