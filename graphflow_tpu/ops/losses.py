"""Loss and regularization ops.

The reference's loss nodes self-seed the reverse sweep (``SquaredLoss.h``
backward sets gradient[0]=1, ``LogLoss.h`` sets -1); here every loss returns
the scalar *to be minimized* and ``jax.grad`` does the seeding, which folds
the reference's sign conventions into the return value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_ZERO = -1e9  # reference LogLoss.h LOG_ZERO guard


def squared_loss(predict, target):
    """``SquaredLoss.h:41-66``: 0.5 * ||predict - target||^2."""
    d = predict - target
    return 0.5 * jnp.sum(d * d)


def log_loss(score, label):
    """``LogLoss.h:38-76``: softmax cross-entropy of logits vs integer label.

    Returns -log softmax(score)[label] (the minimized quantity; the
    reference's ``getLoss`` returns +log p and seeds gradient -1, which is the
    same optimization problem).
    """
    logp = jax.nn.log_softmax(score)
    return -logp[label]


def l1_regularization(params, lam: float):
    """``L1Regularization.h``: lam * sum |w| over a pytree of parameters."""
    leaves = jax.tree_util.tree_leaves(params)
    return lam * sum(jnp.sum(jnp.abs(p)) for p in leaves)


def l2_regularization(params, lam: float):
    """``L2Regularization.h``: lam/2 * sum w^2 over a pytree of parameters."""
    leaves = jax.tree_util.tree_leaves(params)
    return 0.5 * lam * sum(jnp.sum(p * p) for p in leaves)
