"""Loss functions for c-peptide model fitting.

Reference parity (``src/parameter-estimation.jl``):
  * ``sse``            — per-individual sum of squared errors with
                         solver-failure ⇒ ``inf`` (:56-68),
  * ``sse_sigma``      — Gaussian NLL with fitted σ (:70-75, 101-109),
  * ``population_sse`` — mean over individuals of per-individual SSE with a
                         shared NN and per-individual β (:126-140).

All are pure, batched functions: the reference's serial ``for individual``
loop is a ``vmap`` axis, and the early-exit-on-``Inf`` becomes ordinary IEEE
propagation through the mean.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from conditional_ude_tpu.models.cpeptide import (
    Cohort,
    CPeptideModel,
    Individual,
    simulate,
)


def sse(
    model: CPeptideModel,
    params: Any,
    ind: Individual,
    timepoints: jax.Array,
    data: jax.Array,
    **solver_kwargs,
) -> jax.Array:
    """Sum of squared errors on the plasma compartment; ``inf`` on failure."""
    res = simulate(model, params, ind, timepoints, **solver_kwargs)
    err = jnp.sum((res.ys[:, 0] - data) ** 2)
    return jnp.where(res.success, err, jnp.inf)


def sse_sigma(
    model: CPeptideModel,
    params: Any,
    sigma: jax.Array,
    ind: Individual,
    timepoints: jax.Array,
    data: jax.Array,
    **solver_kwargs,
) -> jax.Array:
    """Gaussian NLL: (n/2)·log σ² + SSE/(2σ²)."""
    err = sse(model, params, ind, timepoints, data, **solver_kwargs)
    n = timepoints.shape[0]
    return (n / 2.0) * jnp.log(sigma**2) + err / (2.0 * sigma**2)


def conditional_sse(
    model: CPeptideModel,
    beta: jax.Array,
    nn_params: jax.Array,
    ind: Individual,
    timepoints: jax.Array,
    data: jax.Array,
    **solver_kwargs,
) -> jax.Array:
    """β-only SSE with frozen NN (reference :93-99)."""
    params = {"neural": nn_params, "conditional": beta}
    return sse(model, params, ind, timepoints, data, **solver_kwargs)


def population_sse(
    model: CPeptideModel,
    nn_params: jax.Array,
    betas: jax.Array,
    cohort: Cohort,
    **solver_kwargs,
) -> jax.Array:
    """Mean over individuals of per-individual SSE (reference :126-140).

    ``betas`` has shape ``[N]`` or ``[N, c]``; the NN is shared.  A single
    diverged individual makes the population loss ``inf`` (matching the
    reference's early-exit semantics without breaking the batch).
    """

    def one(beta, ind, data):
        params = {"neural": nn_params, "conditional": beta}
        return sse(model, params, ind, cohort.timepoints, data,
                   **solver_kwargs)

    errs = jax.vmap(one)(betas, cohort.individuals, cohort.cpeptide)
    return jnp.mean(errs)
