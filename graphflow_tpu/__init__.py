"""GraphFlow-TPU: a TPU-native deep learning framework for graph neural networks.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GraphFlow
(HyTruongSon/GraphFlow): symbolic differentiation over computation graphs,
a ~70-op differentiable op library, the Covariant Compositional Network (CCN)
"Steerable Message Passing" model family with permutation-covariant tensor
contractions (RisiContraction 4/10/18/50), plus GCN, Neural Graph Fingerprint,
PATCHY-SAN, Gated Graph Sequence Networks, MLP/CNN/LSTM/GRU/autoencoders.

Design (TPU-first, not a port):
  * The reference's dynamic per-example computation graphs become trace-once
    JIT-compiled pure functions over padded, masked graph batches.
  * The reference's hand-written forward/backward loops become `jax.grad`;
    hot contraction kernels get fused Pallas TPU kernels with custom VJPs.
  * The reference's CPU-thread/CUDA-stream data parallelism becomes
    `shard_map` over a `jax.sharding.Mesh` with `psum` gradient reduction.
  * The reference's two precision trees (double/float) collapse into a dtype
    parameter; bfloat16 is first-class for MXU throughput.

Reference layout mapping (see SURVEY.md for the full inventory):
  GraphFlow/{Vector,Matrix,Tensor3D,Tensor4D}.h -> jnp arrays (L0)
  GraphFlow/GraphFlow.h (type-tag engine)       -> XLA itself (L1)
  GraphFlow/*.h op headers                      -> graphflow_tpu.ops (L2/L3)
  GraphFlow/{SGD,Momentum,Adam,...}.h           -> graphflow_tpu.optim (L4)
  GraphFlow/DenseGraph.h                        -> graphflow_tpu.core.graph (L5)
  GraphFlow/SMP_*.h, GCN_*.h, ...               -> graphflow_tpu.models (L6)
  tests/*.cpp                                   -> tests/ (pytest, real asserts)
"""

from graphflow_tpu.version import __version__


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt out: GRAPHFLOW_TPU_NO_CACHE=1).

    TPU compiles of the full train-step program take minutes when the
    chip sits behind a remote-compile tunnel; the persistent cache makes
    every later process start in milliseconds.  Respects a user-set
    ``jax_compilation_cache_dir``.
    """
    import os

    if os.environ.get("GRAPHFLOW_TPU_NO_CACHE"):
        return
    # CPU-only processes (tests, the driver's multichip dryrun) gain
    # nothing from the persistent cache — XLA:CPU compiles are fast — and
    # reloading AOT entries compiled under different host-feature flags
    # spams pages of cpu_aot_loader errors that bury real failures.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir is None:
            cache = os.path.join(
                os.path.expanduser("~"), ".cache", "graphflow_tpu", "xla")
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


_enable_compilation_cache()

from graphflow_tpu.core.graph import DenseGraph
from graphflow_tpu.core import prep
from graphflow_tpu import ops
from graphflow_tpu import optim
from graphflow_tpu import models

__all__ = [
    "__version__",
    "DenseGraph",
    "prep",
    "ops",
    "optim",
    "models",
]
