"""Device mesh helpers + multi-host scaffolding.

The reference's maximum parallel scope is CPU threads + one GPU with streams
(SURVEY.md section 2.8); the TPU framework scales instead via named meshes and
collectives.  Axis conventions:

  "host"  — DCN (data-center network) axis across hosts/slices: slow,
            high-latency; only gradient psums should cross it
  "data"  — batch (graph-level) data parallelism; psum of gradients
  "graph" — partitioned-graph parallelism (vertices/edges of the padded
            batch sharded across chips, halo exchange for boundaries);
            must ride ICI, never DCN

Multi-host: call :func:`init_distributed` once per process, then build a
host x chip mesh with :func:`make_hybrid_mesh` — DCN axes lead (slowest
varying), ICI axes trail, so collectives over the trailing axes stay inside
a slice.
"""

from __future__ import annotations

import os
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


_DISTRIBUTED_INITIALIZED = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     **kwargs) -> int:
    """Initialize the multi-host runtime (wraps ``jax.distributed``).

    The reference is strictly single-process (SURVEY.md section 2.8: no
    MPI/NCCL/Gloo anywhere); this is the TPU-native scale-out entry point.
    Arguments default to the standard JAX coordinator environment
    variables; on single-process launches (nothing configured) this is a
    no-op.  Returns the process count.  Idempotent.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return jax.process_count()
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None and num_processes is None:
        # Single-process launch: jax.distributed not needed.
        _DISTRIBUTED_INITIALIZED = True
        return jax.process_count()
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    _DISTRIBUTED_INITIALIZED = True
    return jax.process_count()


def make_hybrid_mesh(dcn_axes: dict, ici_axes: dict, devices=None) -> Mesh:
    """Build a host x chip mesh with explicit DCN/ICI axis placement.

    ``dcn_axes`` ({name: size}) vary across hosts/slices (slow network);
    ``ici_axes`` vary within a slice (fast chip interconnect).  DCN axes
    lead so that reshaping the process-major ``jax.devices()`` order puts
    host boundaries exactly on the DCN axes: collectives over ICI axis
    names never cross hosts.

    On a real multi-slice TPU deployment the device order is refined with
    ``mesh_utils.create_hybrid_device_mesh``; on single-process dryruns
    (e.g. 8 virtual CPU devices standing in for 2 hosts x 4 chips) the
    plain process-major reshape is used.
    """
    names = tuple(dcn_axes.keys()) + tuple(ici_axes.keys())
    dcn_shape = tuple(dcn_axes.values())
    ici_shape = tuple(ici_axes.values())
    n = int(np.prod(dcn_shape) * np.prod(ici_shape))
    if devices is None:
        devices = jax.devices()
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"

    if jax.process_count() > 1 and devices[0].platform == "tpu":
        from jax.experimental import mesh_utils
        # create_hybrid_device_mesh merges per-axis DCN x ICI factors; give
        # DCN axes their own leading dimensions (ICI factor 1) and ICI axes
        # theirs (DCN factor 1).
        mesh_shape = (1,) * len(dcn_shape) + ici_shape
        dcn_mesh_shape = dcn_shape + (1,) * len(ici_shape)
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape, dcn_mesh_shape, devices=devices)
    else:
        dev_array = np.asarray(devices[:n]).reshape(dcn_shape + ici_shape)
    return Mesh(dev_array, names)
