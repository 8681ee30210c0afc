"""Op-library tests: closed forms vs brute force, reference-semantics checks."""

import numpy as np
import jax
import jax.numpy as jnp

from graphflow_tpu import ops


class TestRisiLayers:
    def test_risi_layer_2d_closed_form(self, rng):
        """Closed form vs the reference's O(n^2 D^2) loop
        (RisiLayer2D.h:37-51)."""
        n, D = 5, 3
        X = rng.standard_normal((n, D))
        want = np.zeros(D)
        for i in range(D):
            for k in range(D):
                for u in range(n):
                    for v in range(u + 1, n):
                        want[i] += X[u, i] * X[v, k] + X[u, k] * X[v, i]
        got = np.asarray(ops.risi_layer_2d(jnp.asarray(X)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_risi_layer_3d_closed_form(self, rng):
        """Inclusion-exclusion vs the reference's ordered-distinct-triples loop
        (RisiLayer3D.h:43-69)."""
        n, D = 4, 2
        X = rng.standard_normal((n, D))
        want = np.zeros((D, D, D))
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                for v in range(n):
                    if v == i or v == j:
                        continue
                    want += np.einsum("x,y,z->xyz", X[i], X[j], X[v])
        got = np.asarray(ops.risi_layer_3d(jnp.asarray(X)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)

    def test_risi_layer_masked(self, rng):
        X = rng.standard_normal((4, 3))
        mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        got = ops.risi_layer_1d(jnp.asarray(X), mask)
        np.testing.assert_allclose(np.asarray(got), X[:2].sum(0), rtol=1e-6)


class TestLinalg:
    def test_mat_tensor_mul(self, rng):
        m = rng.standard_normal((3, 4))
        t = rng.standard_normal((4, 5, 2))
        got = np.asarray(ops.mat_tensor_mul(jnp.asarray(m), jnp.asarray(t)))
        want = np.einsum("rs,scd->rcd", m, t)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_quadratic_permutation_form(self, rng):
        """X f X^T via mat_tensor_mul + tensor_mat_mul equals per-depth
        X @ f[:, :, d] @ X.T (the SMP_omega.h:641-645 pattern)."""
        X = rng.standard_normal((3, 4))
        f = rng.standard_normal((4, 4, 2))
        mid = ops.mat_tensor_mul(jnp.asarray(X), jnp.asarray(f))
        out = np.asarray(ops.tensor_mat_mul(mid, jnp.asarray(X.T)))
        for d in range(2):
            np.testing.assert_allclose(out[:, :, d], X @ f[:, :, d] @ X.T,
                                       rtol=1e-6)

    def test_vector_broadcast_mat(self, rng):
        v = rng.standard_normal(3)
        m = rng.standard_normal((2, 2))
        got = np.asarray(ops.vector_broadcast_mat(jnp.asarray(v), jnp.asarray(m)))
        for c in range(3):
            np.testing.assert_allclose(got[:, :, c], v[c] * m, rtol=1e-6)

    def test_linear_gram(self, rng):
        X = rng.standard_normal((4, 6))
        got = np.asarray(ops.linear_gram(jnp.asarray(X)))
        np.testing.assert_allclose(got, X @ X.T, rtol=1e-6)


class TestReductionOps:
    def test_shrink_tensor(self, rng):
        t = rng.standard_normal((3, 4, 5))
        got = np.asarray(ops.shrink_tensor(jnp.asarray(t)))
        np.testing.assert_allclose(got, t.sum((0, 1)), rtol=1e-6)

    def test_kmax(self, rng):
        v = jnp.asarray([3.0, 1.0, 4.0, 1.0, 5.0])
        np.testing.assert_allclose(np.asarray(ops.kmax(v, 2)), [4.0, 5.0])

    def test_shuffle_matrix(self, rng):
        m = jnp.asarray(rng.standard_normal((4, 3)))
        seq = jnp.asarray([2, 0, 1])
        got = np.asarray(ops.shuffle_matrix(m, seq))
        np.testing.assert_allclose(got, np.asarray(m)[[2, 0, 1]])

    def test_vertex_representation(self):
        f = jnp.asarray([1.0, 2.0])
        w = jnp.asarray([3.0, 4.0])
        got = np.asarray(ops.vertex_representation(f, w, vertex=2, n=4))
        np.testing.assert_allclose(got, [0, 0, 11.0, 0])


class TestActivationsLosses:
    def test_leaky_relu_default_alpha(self):
        x = jnp.asarray([-2.0, 3.0])
        np.testing.assert_allclose(np.asarray(ops.leaky_relu(x)),
                                   [-0.02, 3.0])

    def test_dropout_eval_scales(self):
        x = jnp.ones((5,))
        y = ops.dropout(x, jax.random.PRNGKey(0), probability=0.7, train=False)
        np.testing.assert_allclose(np.asarray(y), 0.7)

    def test_squared_loss(self):
        loss = ops.squared_loss(jnp.asarray([3.0]), jnp.asarray([1.0]))
        assert float(loss) == 2.0  # 0.5 * (3-1)^2

    def test_log_loss_matches_manual(self, rng):
        score = jnp.asarray(rng.standard_normal(5))
        p = np.exp(np.asarray(score) - np.asarray(score).max())
        p = p / p.sum()
        got = float(ops.log_loss(score, 2))
        np.testing.assert_allclose(got, -np.log(p[2]), rtol=1e-6)

    def test_norm3d(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 4, 3)))
        y = np.asarray(ops.norm3d(x))
        assert np.isclose(y.min(), 0) and np.isclose(y.max(), 1)


class TestConv:
    def test_conv2d_matches_manual(self, rng):
        H = W = 5; C1, C2, K = 2, 3, 3
        x = rng.standard_normal((H, W, C1))
        filt = rng.standard_normal((K, K, C1, C2))
        bias = rng.standard_normal((C1, C2))
        got = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(filt),
                                    jnp.asarray(bias), stride=1, pad=1))
        xp = np.pad(x, [(1, 1), (1, 1), (0, 0)])
        want = np.zeros((H, W, C2))
        for r in range(H):
            for c in range(W):
                patch = xp[r:r + K, c:c + K]
                want[r, c] = np.einsum("xyi,xyio->o", patch, filt)
        want += bias.sum(0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_max_pool2d(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 4, 1)))
        y = np.asarray(ops.max_pool2d(x, window=2, stride=2))
        assert y.shape == (2, 2, 1)
        assert np.isclose(y[0, 0, 0], np.asarray(x)[:2, :2, 0].max())


class TestOptimizers:
    def _roundtrip(self, opt, steps=3):
        from graphflow_tpu import optim
        params = {"w": jnp.asarray([1.0, -2.0]), "b": jnp.asarray([[0.5]])}
        state = opt.init(params)
        for _ in range(steps):
            grads = jax.tree_util.tree_map(lambda p: 0.1 * p, params)
            params, state = opt.update(params, state, grads, 0.01)
        return params

    def test_all_optimizers_run(self):
        from graphflow_tpu import optim
        for name in ["sgd", "momentum", "adam", "adamax", "adadelta"]:
            p = self._roundtrip(optim.make_optimizer(name))
            assert np.isfinite(np.asarray(p["w"])).all()

    def test_sgd_formula(self):
        from graphflow_tpu import optim
        opt = optim.sgd()
        params = {"w": jnp.asarray([1.0])}
        grads = {"w": jnp.asarray([0.5])}
        p, _ = opt.update(params, opt.init(params), grads, 0.1)
        np.testing.assert_allclose(np.asarray(p["w"]), [0.95])
        # nBatch divides
        p, _ = opt.update(params, opt.init(params), grads, 0.1, nBatch=5)
        np.testing.assert_allclose(np.asarray(p["w"]), [0.99])

    def test_momentum_formula(self):
        from graphflow_tpu import optim
        opt = optim.momentum(gamma=0.9)
        params = {"w": jnp.asarray([1.0])}
        grads = {"w": jnp.asarray([1.0])}
        state = opt.init(params)
        p, state = opt.update(params, state, grads, 0.1)
        np.testing.assert_allclose(np.asarray(p["w"]), [0.9])
        p, state = opt.update(p, state, grads, 0.1)
        # v = 0.9*0.1 + 0.1 = 0.19; p = 0.9 - 0.19
        np.testing.assert_allclose(np.asarray(p["w"]), [0.71])

    def test_adam_first_step(self):
        from graphflow_tpu import optim
        opt = optim.adam()
        params = {"w": jnp.asarray([1.0])}
        grads = {"w": jnp.asarray([0.3])}
        p, _ = opt.update(params, opt.init(params), grads, 0.1)
        # first Adam step is ~ -lr * sign(g)
        np.testing.assert_allclose(np.asarray(p["w"]), [1.0 - 0.1], rtol=1e-4)


def test_adam_nbatch_per_element_beta_schedule():
    """The reference's Learn(alpha, nBatch) advances beta1_t/beta2_t once
    per scalar ELEMENT (Adam.h:108-136).  With the element schedule
    installed (as GraphModel does via param_order), our nBatch path must
    match an element-loop transcription of the reference for several
    steps."""
    import numpy as np
    import jax.numpy as jnp
    from graphflow_tpu import optim

    rng = np.random.default_rng(5)
    shapes = {"a": (3, 4), "b": (7,), "c": (2, 2)}
    order = ["a", "b", "c"]
    params = {k: jnp.asarray(rng.normal(size=s), jnp.float32)
              for k, s in shapes.items()}
    opt = optim.adam()
    opt.set_element_schedule(params, order)
    state = opt.init(params)

    # NumPy transcription of Adam.h:108-136 over the flat element order.
    ref = {k: np.asarray(v, np.float64).copy() for k, v in params.items()}
    m = {k: np.zeros(shapes[k]) for k in order}
    v = {k: np.zeros(shapes[k]) for k in order}
    beta1, beta2, eps, lr, nBatch = 0.9, 0.999, 1e-8, 0.05, 4
    b1t = b2t = 1.0

    p = params
    for step in range(3):
        grads = {k: rng.normal(size=shapes[k]) for k in order}
        for k in order:
            gk = grads[k].reshape(-1)
            mk, vk, pk = (m[k].reshape(-1), v[k].reshape(-1),
                          ref[k].reshape(-1))
            for j in range(gk.size):
                g = gk[j] / nBatch
                mk[j] = beta1 * mk[j] + (1 - beta1) * g
                vk[j] = beta2 * vk[j] + (1 - beta2) * g * g
                b1t *= beta1
                b2t *= beta2
                m_hat = mk[j] / (1 - b1t)
                v_hat = vk[j] / (1 - b2t)
                pk[j] -= lr * m_hat / (np.sqrt(v_hat) + eps)
        p, state = opt.update(
            p, state, {k: jnp.asarray(grads[k], jnp.float32)
                       for k in order}, lr, nBatch=nBatch)
        for k in order:
            np.testing.assert_allclose(np.asarray(p[k]), ref[k], rtol=2e-5,
                                       atol=1e-6,
                                       err_msg=f"step {step} leaf {k}")
