"""Pytree optimizers with reference semantics (L4).

Mirrors ``SGD.h``, ``Momentum.h``, ``Adam.h``, ``AdaMax.h``, ``AdaDelta.h``:
each optimizer is a pair of pure functions (init, update) over parameter
pytrees, packaged optax-style so they compose with `jit`/`shard_map`.

The reference's ``Learn(lr, nBatch)`` overloads divide gradients by nBatch
before the moment updates; pass ``nBatch=...`` to ``update`` for the same
behavior.  (One deliberate divergence: ``Adam.h:108-136``'s batched overload
updates beta^t inside the per-element loop — a reference bug producing
per-element bias corrections; we use the standard per-step correction.)

These are hand-rolled rather than thin optax wrappers so the update math can
be pinned against the reference formulas in tests; `optax` optimizers can be
used interchangeably anywhere an (init, update) pair is accepted.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class Optimizer(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[..., Any]  # (params, state, grads, lr, nBatch=None)
    # adam only: install the per-ELEMENT beta_t schedule of the reference's
    # nBatch overload (see adam()); called by GraphModel._finish_init with
    # (params, param_order).
    set_element_schedule: Optional[Callable[..., None]] = None


def _lookup_path(params, path: str):
    node = params
    for k in path.split("/"):
        node = node[int(k)] if isinstance(node, (list, tuple)) else node[k]
    return node


def _keypath_str(kp) -> str:
    parts = []
    for k in kp:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _scale(grads, nBatch: Optional[int]):
    if nBatch is None:
        return grads
    return jax.tree_util.tree_map(lambda g: g / nBatch, grads)


def sgd() -> Optimizer:
    """``SGD.h:36-50``: p -= lr * g."""

    def init(params):
        return ()

    def update(params, state, grads, lr, nBatch=None):
        grads = _scale(grads, nBatch)
        new = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new, state

    return Optimizer(init, update)


def momentum(gamma: float = 0.9) -> Optimizer:
    """``Momentum.h:46-68``: v = gamma*v + lr*g; p -= v (gamma default 0.9)."""

    def init(params):
        return jax.tree_util.tree_map(jnp.zeros_like, params)

    def update(params, state, grads, lr, nBatch=None):
        grads = _scale(grads, nBatch)
        v = jax.tree_util.tree_map(lambda m, g: gamma * m + lr * g, state, grads)
        new = jax.tree_util.tree_map(lambda p, m: p - m, params, v)
        return new, v

    return Optimizer(init, update)


def adam(beta1: float = 0.9, beta2: float = 0.999,
         epsilon: float = 1e-8) -> Optimizer:
    """``Adam.h``: BOTH reference Learn overloads, selected by ``nBatch``.

    * ``nBatch=None`` — ``Learn(alpha)`` (``Adam.h:77-106``): standard
      Adam with per-STEP bias correction (beta_t advanced once per call).
    * ``nBatch=k`` — ``Learn(alpha, nBatch)`` (``Adam.h:108-136``), used
      by every reference BatchLearn: the reference advances beta1_t /
      beta2_t once per scalar ELEMENT inside the update loop, so element
      number e (0-based, in optimizer REGISTRATION order, counting across
      steps) is bias-corrected by 1 - beta^(e+1).  For a model with N
      registered scalars this means step s corrects element k by
      1 - beta^((s-1) N + k + 1) — a per-element schedule that decays to
      "no correction" but is MATERIAL through the first steps when N is
      only a few thousand (beta2 = 0.999).  When the model installs the
      schedule (``set_element_schedule``, wired by GraphModel via
      param_order), it is reproduced exactly (pow instead of the
      reference's running product: ~1e-13 relative); without it the
      asymptotic no-correction form is used.
    """
    holder = {"offsets": None, "total": None}

    def set_element_schedule(params, order):
        import numpy as np
        offs, total = {}, 0
        for path in order:
            leaf = np.asarray(_lookup_path(params, path))
            n = int(leaf.size)
            offs[path] = np.arange(total, total + n,
                                   dtype=np.float32).reshape(leaf.shape)
            total += n
        holder["offsets"], holder["total"] = offs, total

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"m": z, "v": jax.tree_util.tree_map(jnp.zeros_like, params),
                "t": jnp.zeros((), jnp.int32)}

    def update(params, state, grads, lr, nBatch=None):
        grads = _scale(grads, nBatch)
        t = state["t"] + 1
        m = jax.tree_util.tree_map(
            lambda m, g: beta1 * m + (1 - beta1) * g, state["m"], grads)
        v = jax.tree_util.tree_map(
            lambda v, g: beta2 * v + (1 - beta2) * g * g, state["v"], grads)

        if nBatch is None:
            c1 = 1 - beta1 ** t.astype(jnp.float32)
            c2 = 1 - beta2 ** t.astype(jnp.float32)

            def step(p, m, v):
                return p - lr * (m / c1) / (jnp.sqrt(v / c2) + epsilon)

            new = jax.tree_util.tree_map(step, params, m, v)
        elif holder["offsets"] is None:
            # No schedule installed: asymptotic form (correction absent).
            def step(p, m, v):
                return p - lr * m / (jnp.sqrt(v) + epsilon)

            new = jax.tree_util.tree_map(step, params, m, v)
        else:
            N = holder["total"]
            tt = t.astype(jnp.float32)

            def step(kp, p, m, v):
                off = holder["offsets"].get(_keypath_str(kp))
                if off is None:   # unregistered leaf: asymptotic form
                    return p - lr * m / (jnp.sqrt(v) + epsilon)
                dt = p.dtype
                expo = (jnp.asarray(off, jnp.float32) + 1.0
                        + (tt - 1.0) * N)
                c1 = (1.0 - beta1 ** expo).astype(dt)
                c2 = (1.0 - beta2 ** expo).astype(dt)
                return p - lr * (m / c1) / (jnp.sqrt(v / c2) + epsilon)

            new = jax.tree_util.tree_map_with_path(step, params, m, v)
        return new, {"m": m, "v": v, "t": t}

    return Optimizer(init, update, set_element_schedule)


def adamax(beta1: float = 0.9, beta2: float = 0.999) -> Optimizer:
    """``AdaMax.h:70-95``: infinity-norm Adam.

    Faithful quirk: the reference tracks ONE exponentially-weighted infinity
    norm per parameter *tensor* (``infinity_norm[i]`` is a scalar), not per
    element; reproduced here with a per-leaf scalar."""

    def init(params):
        return {"m": jax.tree_util.tree_map(jnp.zeros_like, params),
                "u": jax.tree_util.tree_map(
                    lambda p: jnp.zeros((), p.dtype), params),
                "t": jnp.zeros((), jnp.int32)}

    def update(params, state, grads, lr, nBatch=None):
        grads = _scale(grads, nBatch)
        t = state["t"] + 1
        m = jax.tree_util.tree_map(
            lambda m, g: beta1 * m + (1 - beta1) * g, state["m"], grads)
        u = jax.tree_util.tree_map(
            lambda u, g: jnp.maximum(beta2 * u, jnp.max(jnp.abs(g))),
            state["u"], grads)
        c1 = 1 - beta1 ** t.astype(jnp.float32)

        def step(p, m, u):
            return p - lr / c1 * m / u

        new = jax.tree_util.tree_map(step, params, m, u)
        return new, {"m": m, "u": u, "t": t}

    return Optimizer(init, update)


def adadelta(p_decay: float = 0.95, epsilon: float = 1e-6) -> Optimizer:
    """``AdaDelta.h:67-89``: learning-rate-free AdaDelta (lr ignored, as in
    the reference where alpha is unused)."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"eg": z, "ed": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(params, state, grads, lr=None, nBatch=None):
        grads = _scale(grads, nBatch)

        def step(p, eg, ed, g):
            eg = p_decay * eg + (1 - p_decay) * g * g
            dx = -jnp.sqrt(ed + epsilon) / jnp.sqrt(eg + epsilon) * g
            ed = p_decay * ed + (1 - p_decay) * dx * dx
            return p + dx, eg, ed

        out = jax.tree_util.tree_map(step, params, state["eg"], state["ed"],
                                     grads)
        new = jax.tree_util.tree_map(lambda o: o[0], out,
                                     is_leaf=lambda x: isinstance(x, tuple))
        eg = jax.tree_util.tree_map(lambda o: o[1], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        ed = jax.tree_util.tree_map(lambda o: o[2], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        return new, {"eg": eg, "ed": ed}

    return Optimizer(init, update)


_REGISTRY = {
    "sgd": sgd,
    "momentum": momentum,
    "adam": adam,
    "adamax": adamax,
    "adadelta": adadelta,
}


def make_optimizer(name: str, **kwargs) -> Optimizer:
    """Build an optimizer by reference class name (case-insensitive)."""
    return _REGISTRY[name.lower()](**kwargs)
