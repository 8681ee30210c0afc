"""Checkpointing: reference-compatible text dumps + npz pytree snapshots.

The reference saves every optimizer-registered parameter as whitespace-
separated plain text in registration order (``SMP_omega.h:1033-1055``,
``SMP_2D.h:797-807``).  ``save_text``/``load_text`` reproduce that format so
checkpoints can be diffed against reference runs; ``save_npz``/``load_npz``
are the practical binary path.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ordered_leaves(params: Any, order: Optional[List[str]]):
    """Flatten params; with ``order`` given (list of '/'-joined key paths),
    use that exact registration order."""
    if order is None:
        leaves, _ = jax.tree_util.tree_flatten(params)
        return leaves
    leaves = []
    for path in order:
        node = params
        for k in path.split("/"):
            node = node[int(k)] if isinstance(node, (list, tuple)) else node[k]
        leaves.append(node)
    return leaves


def save_text(filename: str, params: Any, order: Optional[List[str]] = None):
    leaves = _ordered_leaves(params, order)
    with open(filename, "w") as f:
        for leaf in leaves:
            for v in np.asarray(leaf).reshape(-1):
                f.write(f"{float(v)} ")


def load_text(filename: str, params_template: Any,
              order: Optional[List[str]] = None):
    with open(filename) as f:
        vals = [float(x) for x in f.read().split()]
    leaves = _ordered_leaves(params_template, order)
    out = []
    pos = 0
    for leaf in leaves:
        n = int(np.prod(leaf.shape)) if leaf.ndim else 1
        arr = np.asarray(vals[pos:pos + n], dtype=np.asarray(leaf).dtype)
        out.append(jnp.asarray(arr.reshape(leaf.shape)))
        pos += n
    assert pos == len(vals), f"checkpoint has {len(vals)} values, expected {pos}"

    if order is None:
        _, treedef = jax.tree_util.tree_flatten(params_template)
        return jax.tree_util.tree_unflatten(treedef, out)

    # Rebuild by assigning into a deep copy of the template dict structure.
    import copy
    params = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, params_template))
    for path, leaf in zip(order, out):
        node = params
        keys = path.split("/")
        for k in keys[:-1]:
            node = node[int(k)] if isinstance(node, (list, tuple)) else node[k]
        last = keys[-1]
        if isinstance(node, (list, tuple)):
            node[int(last)] = leaf
        else:
            node[last] = leaf
    return params


def save_npz(filename: str, params: Any):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    np.savez(filename, *[np.asarray(l) for l in leaves],
             treedef=str(treedef))


def load_npz(filename: str, params_template: Any):
    data = np.load(filename, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(params_template)
    arrs = [jnp.asarray(data[f"arr_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, arrs)


def save_orbax(directory: str, params: Any):
    """Orbax checkpoint (production path for large models/sharded params)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), params)
    ckptr.wait_until_finished()


def load_orbax(directory: str, params_template: Any):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(directory), target=params_template)
