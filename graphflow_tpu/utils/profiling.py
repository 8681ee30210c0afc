"""Profiling and timing utilities (SURVEY.md section 5).

The reference hand-rolls wall-clock timers in each test driver
(``tests/test_SMP_omega.cpp:151-207`` time(), ``test_RisiContraction_18_gpu.cu:31-40``
gettimeofday).  Here timing is a first-class module with JAX-aware semantics:

  * ``Timer`` — wall-clock context manager / accumulator
  * ``time_jax`` — robust accelerator timing (block_until_ready fencing,
    warmup, per-call statistics)
  * ``trace`` — wraps jax.profiler tracing for XLA/TPU timelines
  * ``flops_report`` — analytic FLOP helpers for the contraction layers
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


class Timer:
    """Accumulating wall-clock timer.

    >>> t = Timer()
    >>> with t:
    ...     work()
    >>> t.total, t.count, t.mean
    """

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def time_jax(fn: Callable, *args, iters: int = 10, warmup: int = 2,
             **kwargs) -> Dict[str, float]:
    """Time a JAX callable with device fencing.

    Blocks on every call's output (conservative through async dispatch and
    remote-tunnel runtimes).  Returns {mean, min, max, std} in seconds.
    """
    def run_once():
        out = fn(*args, **kwargs)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)

    for _ in range(warmup):
        run_once()
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        samples.append(time.perf_counter() - t0)
    a = np.asarray(samples)
    return {"mean": float(a.mean()), "min": float(a.min()),
            "max": float(a.max()), "std": float(a.std())}


@contextlib.contextmanager
def trace(logdir: str):
    """XLA/TPU profiler trace context (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def risi18_layer_flops(B: int, P: int, C: int, Cout: Optional[int] = None,
                       fused: bool = True) -> int:
    """Analytic FLOPs of the fused contraction layer (see bench.py)."""
    Cout = Cout or C
    contraction = 2 * B * (10 * P ** 3 * C)
    k_cols = 11 if fused else 18
    return contraction + 2 * B * P * P * k_cols * C * Cout


def step_timer(step_fn: Callable):
    """Wrap a train step with a Timer; returns (wrapped, timer)."""
    t = Timer()

    def wrapped(*args, **kwargs):
        with t:
            out = step_fn(*args, **kwargs)
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready()
                if hasattr(x, "block_until_ready") else x, out)
        return out

    return wrapped, t
