"""MLP and CNN example models (the "framework as library" path).

The reference exercises its raw engine with hand-built MLP/CNN programs:
  tests/test_mlp.cpp:75-107          784-128-10 Sigmoid MLP, SquaredLoss
                                     on one-hot targets, Momentum
  tests/test_CNN_MNIST_MaxPool.cpp:109-146
                                     Conv2D(5x5, 8) -> LeakyReLU -> MaxPool2
                                     -> Conv2D(5x5, 16) -> LeakyReLU ->
                                     MaxPool2 -> dense + bias -> LogLoss,
                                     with L2 regularization, SGD
Here those programs are small model classes over the same op library.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from graphflow_tpu import optim as optim_lib
from graphflow_tpu.ops import activations, conv, losses
from graphflow_tpu.optim.utils import uniform_init
from graphflow_tpu.utils import checkpoint as ckpt


class MLP:
    """Sigmoid MLP with SquaredLoss-on-one-hot (reference test_mlp.cpp)."""

    def __init__(self, layer_dims: Sequence[int], optimizer="momentum",
                 seed=0, **opt_kwargs):
        self.dims = list(layer_dims)
        self.opt = optim_lib.make_optimizer(optimizer, **opt_kwargs)
        keys = jax.random.split(jax.random.PRNGKey(seed), len(self.dims) - 1)
        self.params = {
            f"W{i+1}": uniform_init(k, (self.dims[i + 1], self.dims[i]),
                                    jnp.float32)
            for i, k in enumerate(keys)
        }
        self.opt_state = self.opt.init(self.params)
        self.nOutputs = self.dims[-1]

        def forward(params, x):
            h = x
            for i in range(len(self.dims) - 1):
                h = activations.sigmoid(params[f"W{i+1}"] @ h)
            return h

        def batch_loss(params, xs, ys):
            preds = jax.vmap(lambda x: forward(params, x))(xs)
            onehot = jax.nn.one_hot(ys, self.nOutputs)
            return 0.5 * jnp.sum((preds - onehot) ** 2)

        self._forward = jax.jit(jax.vmap(forward, in_axes=(None, 0)))
        self._grad = jax.jit(jax.value_and_grad(batch_loss))
        self._loss = jax.jit(batch_loss)

    def BatchLearn(self, xs, ys, learning_rate):
        xs = jnp.asarray(xs, jnp.float32).reshape(len(xs), -1)
        ys = jnp.asarray(ys, jnp.int32)
        loss, grads = self._grad(self.params, xs, ys)
        self.params, self.opt_state = self.opt.update(
            self.params, self.opt_state, grads, learning_rate)
        return float(loss)

    def Predict(self, xs) -> np.ndarray:
        xs = jnp.asarray(xs, jnp.float32).reshape(len(xs), -1)
        return np.asarray(jnp.argmax(self._forward(self.params, xs), axis=-1))

    def accuracy(self, xs, ys) -> float:
        return float((self.Predict(xs) == np.asarray(ys)).mean())

    def save_model(self, fn):
        ckpt.save_text(fn, self.params, None)

    def load_model(self, fn):
        self.params = ckpt.load_text(fn, self.params, None)
        self.opt_state = self.opt.init(self.params)


class CNN:
    """The reference MNIST CNN (test_CNN_MNIST_MaxPool.cpp:109-146)."""

    def __init__(self, height=28, width=28, in_channels=1, nOutputs=10,
                 c1=8, c2=16, kernel=5, lam=0.0, pool="max",
                 optimizer="sgd", seed=0):
        self.pool = pool
        self.lam = lam
        self.nOutputs = nOutputs
        self.opt = optim_lib.make_optimizer(optimizer)
        h2, w2 = height // 4, width // 4   # two stride-2 pools
        flat = h2 * w2 * c2
        keys = iter(jax.random.split(jax.random.PRNGKey(seed), 5))
        self.params = {
            "filter1": uniform_init(next(keys), (kernel, kernel, in_channels,
                                                 c1), jnp.float32, fan=kernel),
            "bias1": uniform_init(next(keys), (in_channels, c1), jnp.float32),
            "filter2": uniform_init(next(keys), (kernel, kernel, c1, c2),
                                    jnp.float32, fan=kernel),
            "bias2": uniform_init(next(keys), (c1, c2), jnp.float32),
            "W": uniform_init(next(keys), (nOutputs, flat), jnp.float32),
            "bias": jnp.zeros((nOutputs,), jnp.float32),
        }
        self.opt_state = self.opt.init(self.params)
        pool_fn = conv.max_pool2d if pool == "max" else conv.avg_pool2d

        def forward(params, x):               # x: [H, W, Cin]
            h = conv.conv2d(x, params["filter1"], params["bias1"], 1, 2)
            h = pool_fn(activations.leaky_relu(h), 2, 2)
            h = conv.conv2d(h, params["filter2"], params["bias2"], 1, 2)
            h = pool_fn(activations.leaky_relu(h), 2, 2)
            return params["W"] @ h.reshape(-1) + params["bias"]

        def batch_loss(params, xs, ys):
            scores = jax.vmap(lambda x: forward(params, x))(xs)
            ce = jax.vmap(losses.log_loss)(scores, ys).sum()
            if lam > 0:
                ce = ce + losses.l2_regularization(
                    {k: params[k] for k in ("filter1", "filter2", "W")}, lam)
            return ce

        self._forward = jax.jit(jax.vmap(forward, in_axes=(None, 0)))
        self._grad = jax.jit(jax.value_and_grad(batch_loss))

    def _shape(self, xs):
        xs = jnp.asarray(xs, jnp.float32)
        if xs.ndim == 3:
            xs = xs[..., None]
        return xs

    def BatchLearn(self, xs, ys, learning_rate):
        xs, ys = self._shape(xs), jnp.asarray(ys, jnp.int32)
        loss, grads = self._grad(self.params, xs, ys)
        self.params, self.opt_state = self.opt.update(
            self.params, self.opt_state, grads, learning_rate)
        return float(loss)

    def Predict(self, xs) -> np.ndarray:
        scores = self._forward(self.params, self._shape(xs))
        return np.asarray(jnp.argmax(scores, axis=-1))

    def accuracy(self, xs, ys) -> float:
        return float((self.Predict(xs) == np.asarray(ys)).mean())

    def save_model(self, fn):
        ckpt.save_text(fn, self.params, None)

    def load_model(self, fn):
        self.params = ckpt.load_text(fn, self.params, None)
        self.opt_state = self.opt.init(self.params)
