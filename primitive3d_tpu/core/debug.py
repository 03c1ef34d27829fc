"""Opt-in device-side debug assertions (the TPU analog of a sanitizer).

The reference's only runtime guards are device-side ``printf`` warnings — a
zero edge-id check in the MC face kernel (reference:
src/prim3d/Utility/marching_cubes.cu:204-206) and the traversal stack
overflow warning (src/prim3d/Geometry/bvh.h:22-24). Pallas/XLA kernels here
are race-free by construction (no atomics), but data invariants can still
break silently under ``jit`` — capacity overflow in the padded marching
cubes, non-finite / zero-length ray directions, out-of-range tet indices.

This module provides a ``checkify``-based debug layer:

    from primitive3d_tpu.core import debug

    with debug.checks():                # trace-time flag
        f = debug.checked(my_jitted_fn) # functionalize + jit
        f(bad_input)                    # raises JaxRuntimeError

``debug.check(pred, msg)`` calls are sprinkled through the package at the
invariant sites; they trace to NOTHING unless a ``checks()`` scope is active
when the function is traced, so production ``jit`` programs are unchanged.
"""
from __future__ import annotations

import contextlib
import functools
import threading

import jax
from jax.experimental import checkify

_state = threading.local()


def enabled() -> bool:
    return getattr(_state, "on", False)


@contextlib.contextmanager
def checks():
    """Enable debug checks for functions TRACED inside this scope.

    Already-compiled programs are unaffected (the flag is read at trace
    time); wrap the call in :func:`checked` to functionalize the checks.
    """
    prev = enabled()
    _state.on = True
    try:
        yield
    finally:
        _state.on = prev


def check(pred, msg: str, **fmt) -> None:
    """Device-side assertion; no-op unless inside a :func:`checks` scope."""
    if enabled():
        checkify.check(pred, msg, **fmt)


def checked(fn, *, errors=checkify.user_checks):
    """Functionalize ``fn``'s debug checks and re-raise on error.

    Returns a wrapper that runs ``fn`` under ``checkify.checkify`` within a
    :func:`checks` scope and calls ``err.throw()`` — the first failed
    :func:`check` raises ``JaxRuntimeError`` with its message.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with checks():
            err, out = checkify.checkify(fn, errors=errors)(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def check_finite(x: jax.Array, name: str) -> None:
    import jax.numpy as jnp

    check(jnp.all(jnp.isfinite(x)), f"{name} contains non-finite values")
