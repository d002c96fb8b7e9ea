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


def checked(fn, *, errors=None):
    """Wrap a jittable function with ``jax.experimental.checkify`` NaN/div
    policing for debugging (SURVEY §5: the rebuild's sanitizer tier).

    Production losses deliberately propagate ``inf`` (solver failure ⇒
    ``inf`` objective, matching the reference's retcode checks); this
    wrapper is for pinpointing WHERE a non-finite value first appears when
    that propagation hides the source.  Returns ``wrapped(*args) ->
    (error, out)``; call ``error.throw()`` to raise with location info.

    Usage::

        err, loss = checked(lambda p: population_sse(model, p["neural"],
                                                     p["conditional"],
                                                     cohort))(params)
        err.throw()   # raises if any NaN/inf/oob was produced
    """
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.index_checks

    return checkify.checkify(fn, errors=errors)
