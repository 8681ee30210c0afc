from graphflow_tpu.core.graph import DenseGraph
from graphflow_tpu.core import prep
from graphflow_tpu.core import batching

__all__ = ["DenseGraph", "prep", "batching"]
