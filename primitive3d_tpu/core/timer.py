"""Wall-clock timing utilities.

Covers the reference's ``prim3d.Timer`` capability (reference:
prim3d/misc/utils.py:41-116 — an OpenMMLab-style context-manager timer) and adds
JAX-aware helpers: on an asynchronous-dispatch backend like TPU, a naive
wall-clock around a jitted call measures dispatch, not execution, so
``block`` / ``time_fn`` synchronize via ``jax.block_until_ready``.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax


class TimerError(Exception):
    pass


class Timer:
    """Context-manager + checkpoint timer.

    Usage mirrors the reference API::

        with Timer("marching cubes: {:.6f}s"):
            ...                      # prints elapsed on exit
        t = Timer()
        t.since_start()              # seconds since construction
        t.since_last_check()         # seconds since previous check
    """

    def __init__(self, print_tmpl: Optional[str] = None, start: bool = True):
        self._is_running = False
        if print_tmpl is not None and "{" not in print_tmpl:
            print_tmpl += " {:.3f}"
        self.print_tmpl = print_tmpl if print_tmpl else "{:.3f}"
        if start:
            self.start()

    @property
    def is_running(self) -> bool:
        return self._is_running

    def __enter__(self) -> "Timer":
        self.start()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        print(self.print_tmpl.format(self.since_last_check()))
        self._is_running = False

    def start(self) -> None:
        if not self._is_running:
            self._t_start = time.perf_counter()
            self._is_running = True
        self._t_last = time.perf_counter()

    def since_start(self) -> float:
        if not self._is_running:
            raise TimerError("timer is not running")
        self._t_last = time.perf_counter()
        return self._t_last - self._t_start

    def since_last_check(self) -> float:
        if not self._is_running:
            raise TimerError("timer is not running")
        now = time.perf_counter()
        dur = now - self._t_last
        self._t_last = now
        return dur


def block(tree: Any) -> Any:
    """Block until every array in ``tree`` is computed; returns ``tree``."""
    return jax.block_until_ready(tree)


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall-clock seconds per call of ``fn(*args)``, synchronized.

    Runs ``warmup`` untimed calls first (compilation + cache warm), then
    ``iters`` timed calls, returning the median.
    """
    for _ in range(warmup):
        block(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        block(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
