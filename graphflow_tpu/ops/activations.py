"""Elementwise / activation ops (reference L2 op library).

Each function mirrors one reference op header's forward math; backward comes
for free from ``jax.grad``.  All are shape-polymorphic and vmap/jit friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def identity(x):
    """``Identity.h``: y = x."""
    return x


def sigmoid(x):
    """``Sigmoid.h:29-37``: y = 1 / (1 + exp(-x))."""
    return jax.nn.sigmoid(x)


def tanh(x):
    """``Tanh.h``: y = tanh(x)."""
    return jnp.tanh(x)


def relu(x):
    """``ReLU.h``: y = max(x, 0)."""
    return jnp.maximum(x, 0)


def leaky_relu(x, alpha: float = 0.01):
    """``LeakyReLU.h`` / ``LeakyReLU2D.h`` / ``LeakyReLU3D.h``.

    The reference defaults alpha = 0.01 when not supplied
    (``LeakyReLU.h:31``); shape rank is irrelevant here so one function
    covers all three reference classes.
    """
    return jnp.where(x > 0, x, alpha * x)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax(x, axis: int = -1):
    """``Softmax.h`` / ``Softmax2D.h`` / ``Softmax3D.h``: max-subtracted
    softmax — WITH the reference's backward.

    ``Softmax::backward`` (``Softmax.h:57-61``) applies the DIAGONAL-only
    Jacobian, dL/dx_i += g_i * y_i * (1 - y_i), as if softmax were an
    elementwise sigmoid — the off-diagonal -y_i y_j terms are missing.
    Every reference Softmax node therefore trains with these gradients;
    reproducing them is what makes end-to-end training dynamics match
    (caught by the round-5 dataset closure: with the true VJP, GCN_1D's
    float64 loss curve forks from the reference geometrically from
    iteration ~6 — DATASET_r05.json).  Use :func:`softmax_exact` for the
    true gradient."""
    return jax.nn.softmax(x, axis=axis)


def _softmax_fwd(x, axis):
    y = jax.nn.softmax(x, axis=axis)
    return y, y


def _softmax_bwd(axis, y, g):
    return (g * y * (1.0 - y),)


softmax.defvjp(_softmax_fwd, _softmax_bwd)


def softmax_exact(x, axis: int = -1):
    """Softmax with the TRUE Jacobian VJP (what the reference's backward
    would be without its diagonal approximation)."""
    return jax.nn.softmax(x, axis=axis)


def dropout(x, key, probability: float, train: bool):
    """``DropOut.h:41-67``: *keep* with ``probability`` at train time (no
    rescale), multiply by ``probability`` at eval — non-inverted dropout,
    faithfully reproduced."""
    if train:
        mask = jax.random.uniform(key, x.shape) <= probability
        return jnp.where(mask, x, 0.0)
    return probability * x


def masking(x, mask):
    """``Masking.h``: zero out entries where mask <= 0; gradient gated too."""
    return jnp.where(mask > 0.0, x, 0.0)


def norm3d(x, eps_free: bool = True):
    """``Norm3D.h``: per-depth min-max normalization of a [R, Ch, D] tensor.

    The reference treats min/max as constants in backward (gradient is
    g / range only), which is exactly what ``stop_gradient`` on the range
    achieves here.
    """
    mn = jax.lax.stop_gradient(jnp.min(x, axis=(0, 1), keepdims=True))
    mx = jax.lax.stop_gradient(jnp.max(x, axis=(0, 1), keepdims=True))
    rng = jnp.where(mn < mx, mx - mn, 1.0)
    return (x - mn) / rng
