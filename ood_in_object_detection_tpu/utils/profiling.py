"""Profiling/tracing harness.

The reference's only profiling is per-layer wall-clock + thop FLOPs
(ultralytics/nn/tasks.py:220-229 _profile_one_layer). TPU-native equivalents:

- ``trace(path)``: jax.profiler trace context producing a TensorBoard/XProf
  trace of the jitted pipeline (device + host timelines),
- ``time_fn``: block_until_ready wall-clock timing with warmup, reporting
  both per-call latency (block every call) and pipelined throughput (block
  once at the end) — on an async dispatch runtime the two differ and both
  matter,
- ``flops_estimate``: XLA's own cost analysis of a compiled function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> Dict[str, float]:
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    latency = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    pipelined = (time.perf_counter() - t0) / iters
    return {"latency_s": latency, "pipelined_s": pipelined}


def flops_estimate(fn: Callable, *args) -> float:
    """FLOPs from XLA cost analysis of the lowered computation."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", -1.0))
