from graphflow_tpu.utils import checkpoint
