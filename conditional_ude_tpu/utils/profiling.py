"""Profiling helpers: device traces and simple wall-clock scopes.

The reference's only observability is ProgressMeter displays; here the
equivalents are loss traces (returned arrays), ``log_every`` live prints,
and — for performance work — ``jax.profiler`` traces viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import sys
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def device_trace(log_dir: str | Path):
    """Capture a jax.profiler trace of the enclosed block.

    Usage::

        with device_trace("/tmp/trace"):
            result = train_conditional(...)
            jax.block_until_ready(result.objectives)
    """
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def scope(name: str, out=sys.stderr):
    """Wall-clock scope printed as ``[name] 1.23s``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        print(f"[{name}] {time.perf_counter() - t0:.2f}s", file=out,
              flush=True)
