"""Timing + profiling utilities.

`time_desc_decorator` mirrors the reference's wall-clock printer
(reference src/utils/time_track.py:5-31) - which the reference imports but
never actually applies (decorators commented at src/solver.py:59,102).  Here
it works and is used.

`StepTimer` gives device-accurate step timing (block_until_ready-bracketed),
and `profile` wraps jax.profiler tracing (the TPU-native observability the
reference lacks - SURVEY.md §5 tracing row).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional

import jax


def time_desc_decorator(desc: str):
    """Print `desc` and the wall time of each call (reference parity)."""

    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            print(desc)
            start = time.time()
            out = fn(*args, **kwargs)
            elapsed = time.time() - start
            print(f"{desc}: {elapsed:.3f}s")
            return out

        return wrapper

    return decorator


class StepTimer:
    """Device-accurate timing: call `stop(x)` with a device array; it blocks
    until the array is ready so async dispatch doesn't hide compute."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.laps = []

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, wait_on=None) -> float:
        if wait_on is not None:
            jax.block_until_ready(wait_on)
        dt = time.perf_counter() - self._t0
        self.laps.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.laps) / max(len(self.laps), 1)


@contextlib.contextmanager
def profile(log_dir: Optional[str]):
    """jax.profiler trace scope (view with TensorBoard / xprof).  No-op when
    log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Debugging scope: jax_debug_nans raises on the op producing a NaN;
    disable_jit runs op-by-op.  The TPU-native analog of the reference's
    CUDA_LAUNCH_BLOCKING=1 (src/config.py:11) - SURVEY.md §5 sanitizers row."""
    ctxs = []
    if nans:
        ctxs.append(jax.debug_nans(True))
    if disable_jit:
        ctxs.append(jax.disable_jit())
    with contextlib.ExitStack() as stack:
        for c in ctxs:
            stack.enter_context(c)
        yield
