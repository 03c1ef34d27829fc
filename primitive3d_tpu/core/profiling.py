"""Profiling / observability helpers (SURVEY.md §5 tracing row).

The reference's only instrumentation is the wall-clock Timer
(reference: prim3d/misc/utils.py:41-116). Here: a ``jax.profiler`` trace
context, throughput reporters for the framework's standard metrics
(rays/s, Mvox/s), and an amortized timer that is correct on asynchronous /
high-latency backends (only a host fetch truly synchronizes on the TPU
tunnel; single-call wall clocks measure dispatch latency).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/prim3d_trace") -> Iterator[None]:
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    with jax.profiler.trace(log_dir):
        yield


def amortized_seconds(fn_scalar: Callable, iters: int = 10) -> float:
    """Seconds per call of ``fn_scalar(salt) -> scalar`` over ``iters``
    dependent iterations inside one jit (one compile, one host sync)."""

    @jax.jit
    def looped(z):
        def body(i, acc):
            return acc + fn_scalar(acc * 1e-30 + z)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(looped(jnp.float32(0)))  # compile + warm
    t0 = time.perf_counter()
    float(looped(jnp.float32(0)))
    return (time.perf_counter() - t0) / iters


def report_throughput(
    name: str, items: int, seconds: float, unit: str = "items"
) -> str:
    rate = items / seconds
    scale, suffix = (1e6, "M") if rate >= 1e6 else (1e3, "K")
    line = f"{name}: {seconds*1e3:.2f} ms = {rate/scale:.2f} {suffix}{unit}/s"
    print(line)
    return line
