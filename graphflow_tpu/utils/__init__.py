from graphflow_tpu.utils import checkpoint
from graphflow_tpu.utils import datasets
