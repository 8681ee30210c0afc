from graphflow_tpu.optim.optimizers import (
    Optimizer, sgd, momentum, adam, adamax, adadelta, make_optimizer,
)
from graphflow_tpu.optim.utils import (
    sum_gradients_init, sum_gradients_add, cache_parameters,
    restore_parameters, uniform_init, xavier_init, init_like,
)
from graphflow_tpu.optim.backtracking import backtracking_learn

__all__ = [
    "Optimizer", "sgd", "momentum", "adam", "adamax", "adadelta",
    "make_optimizer", "sum_gradients_init", "sum_gradients_add",
    "cache_parameters", "restore_parameters", "uniform_init", "xavier_init",
    "init_like", "backtracking_learn",
]
