"""Device mesh helpers.

The reference's maximum parallel scope is CPU threads + one GPU with streams
(SURVEY.md section 2.8); the TPU framework scales instead via named meshes and
collectives.  Axis conventions:

  "data"  — batch (graph-level) data parallelism; psum of gradients
  "graph" — partitioned-graph parallelism (vertices/edges of the padded
            batch sharded across chips, halo exchange for boundaries)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_shapes: Optional[dict] = None, devices=None) -> Mesh:
    """Build a mesh from {axis_name: size}. Default: 1-D "data" mesh over
    all local devices."""
    if devices is None:
        devices = jax.devices()
    if axis_shapes is None:
        axis_shapes = {"data": len(devices)}
    names = tuple(axis_shapes.keys())
    shape = tuple(axis_shapes.values())
    n = int(np.prod(shape))
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis of every array over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
