"""Backtracking learning-rate training loop.

Reference pattern (``GCN_1D.h:361-434``, ``SMP_omega.h:843-871``): take a
gradient step; if the batch loss increased, restore the cached parameters and
halve the learning rate (down to min_lr), else keep going.  This is the
reference's de-facto line search; reproduced here as a generic driver over
(loss_fn, optimizer).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple


def backtracking_learn(
    params,
    opt_state,
    loss_and_grads: Callable[[Any], Tuple[float, Any]],
    opt_update: Callable[..., Tuple[Any, Any]],
    learning_rate: float,
    nIterations: int,
    epsilon: float = 1e-8,
    decay_lr: float = 0.5,
    min_lr: float = 1e-6,
    nBatch=None,
):
    """Run up to nIterations steps with halve-on-increase backtracking.

    ``loss_and_grads(params) -> (loss, grads)`` evaluates the batch.
    Returns (params, opt_state, initial_loss, final_loss).
    """
    loss0, grads = loss_and_grads(params)
    loss0 = float(loss0)
    best_loss = loss0
    lr = learning_rate

    for _ in range(nIterations):
        if best_loss < epsilon:
            break
        cached, cached_state = params, opt_state
        new_params, new_state = opt_update(params, opt_state, grads, lr,
                                           nBatch)
        new_loss, new_grads = loss_and_grads(new_params)
        new_loss = float(new_loss)
        if new_loss > best_loss:
            params, opt_state = cached, cached_state
            lr = max(lr * decay_lr, min_lr)
            if lr <= min_lr:
                break
        else:
            params, opt_state = new_params, new_state
            best_loss, grads = new_loss, new_grads

    return params, opt_state, loss0, best_loss
