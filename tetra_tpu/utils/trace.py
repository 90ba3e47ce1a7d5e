"""Tracing / stage taps / timing instrumentation.

Reference behaviour (SURVEY.md §5): DEBUGP printf tracing compiled in
with -DDEBUG (tetra_common.h:12-16) dumping per-stage type-2/3/4/5 bit
strings, GNU Radio file_sink taps on every demod stage (cqpsk.py
log=True), and external `time` wrapping for benchmarks
(tetra-rx-tests.sh:56-57).

Here: a process-wide trace level, per-stage tensor taps that record (or
dump to files) intermediate bit tensors, and a lightweight timer
registry — plus jax.profiler passthrough for device traces.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import numpy as np

__all__ = ["set_level", "enabled", "debugp", "tap", "taps", "clear_taps",
           "timer", "timings", "device_trace"]

_LEVEL = int(os.environ.get("TETRA_TPU_TRACE", "0"))
_TAPS: dict[str, list] = defaultdict(list)
_TAP_DIR: str | None = None
_TIMINGS: dict[str, list] = defaultdict(list)


def set_level(level: int, tap_dir: str | None = None):
    """0 = off, 1 = stage logs, 2 = stage logs + tensor taps."""
    global _LEVEL, _TAP_DIR
    _LEVEL = level
    _TAP_DIR = tap_dir


def enabled(level: int = 1) -> bool:
    return _LEVEL >= level


def debugp(fmt: str, *args):
    """DEBUGP analogue: stage logging at level >= 1."""
    if _LEVEL >= 1:
        print(fmt % args if args else fmt)


def tap(stage: str, tensor, meta=None):
    """Record an intermediate tensor under a stage name (level >= 2).

    The analogue of the reference's per-stage type-N dumps
    (tetra_lower_mac.c:175-255) and GNU Radio file_sink taps."""
    if _LEVEL < 2:
        return
    arr = np.asarray(tensor)
    _TAPS[stage].append((arr, meta))
    if _TAP_DIR:
        idx = len(_TAPS[stage]) - 1
        np.save(os.path.join(_TAP_DIR, f"{stage}_{idx}.npy"), arr)


def taps(stage: str) -> list:
    return _TAPS.get(stage, [])


def clear_taps():
    _TAPS.clear()


@contextlib.contextmanager
def timer(name: str):
    """Wall-clock section timer; aggregated in timings()."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TIMINGS[name].append(time.perf_counter() - t0)


def timings() -> dict[str, dict]:
    return {k: {"n": len(v), "total_s": sum(v), "mean_ms": 1e3 * sum(v) / len(v)}
            for k, v in _TIMINGS.items() if v}


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace capture (TensorBoard-compatible)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
