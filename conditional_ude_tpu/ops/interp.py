"""Piecewise-linear interpolation of forcing signals.

The c-peptide models force the ODE with the measured glucose curve, evaluated
inside the RHS at every solver stage (reference ``src/c-peptide-models.jl:71,89``
via DataInterpolations ``LinearInterpolation``).  Here the knots are static
per-trajectory arrays so evaluation is a fixed-shape gather+lerp that fuses
into the RHS; queries clamp to the knot range (the reference never evaluates
outside the data range).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LinearInterp(NamedTuple):
    """Piecewise-linear interpolant ``y(t)`` over sorted knots ``ts``.

    Shapes: ``ts[K]``, ``ys[K]`` (a single channel).  Batched interpolants are
    built by vmapping the constructor or by leading batch dims handled through
    ``jax.vmap`` at the call site.
    """

    ts: jax.Array
    ys: jax.Array

    def __call__(self, t: jax.Array) -> jax.Array:
        ts, ys = self.ts, self.ys
        t = jnp.clip(t, ts[0], ts[-1])
        # index of the left knot of the interval containing t
        idx = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, ts.shape[0] - 2)
        t0 = ts[idx]
        t1 = ts[idx + 1]
        y0 = ys[idx]
        y1 = ys[idx + 1]
        w = (t - t0) / (t1 - t0)
        return y0 + w * (y1 - y0)
