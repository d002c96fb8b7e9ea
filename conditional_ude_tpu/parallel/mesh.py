"""Device-mesh sharding for the framework's parallel axes.

The reference's only parallelism is serial loops / ``Distributed.pmap`` over
local CPU workers (SURVEY.md §2.13).  Here the scaling axes — multi-start
*restarts* and population *individuals* — are leading array dimensions, and
this module lays them out over a ``jax.sharding.Mesh`` so that the vmapped
losses partition across chips with XLA inserting the (tiny) collectives over
ICI: per-lane ODE solves are fully independent, so the only communication is
the final ``mean``/``argsort`` reductions.

Usage pattern (idiomatic pjit, no manual collectives):
  * build a mesh with :func:`make_mesh` — 1D ``("restarts",)`` for
    multi-start stages, 2D ``("restarts", "individuals")`` for joint
    screening over both axes;
  * place batched inputs with :func:`shard_leading` /
    :func:`shard_cohort`;
  * call the ordinary jitted batched function — XLA propagates the input
    shardings through ``vmap`` and partitions the program.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("restarts",),
    shape: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all available).

    With ``shape=None`` the first axis takes all devices and the remaining
    axes get size 1 — the safe default for the restart-dominant workloads
    here (restarts ≫ individuals-per-chip gains for tiny ODEs).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {tuple(shape)} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def pad_to_multiple(x: jax.Array, multiple: int, axis: int = 0,
                    fill=None) -> jax.Array:
    """Pad ``axis`` up to a multiple so it divides evenly across shards.

    Padded lanes replicate the last real entry by default (``fill=None``),
    keeping them numerically benign (they converge like real lanes and are
    sliced off by the caller).
    """
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x
    pad = target - n
    if fill is None:
        import jax.numpy as jnp
        last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
        reps = [1] * x.ndim
        reps[axis] = pad
        return jnp.concatenate([x, jnp.tile(last, reps)], axis=axis)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    import jax.numpy as jnp
    return jnp.pad(x, widths, constant_values=fill)


def shard_leading(tree: Any, mesh: Mesh, axis_name: str = "restarts") -> Any:
    """Place every leaf with its leading dim sharded over ``axis_name``.

    Leading dims must divide the mesh axis size (use :func:`pad_to_multiple`
    first). Scalar / 0-d leaves are replicated.
    """

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            spec = P()
        else:
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf across the whole mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(jax.numpy.asarray(x),
                                 NamedSharding(mesh, P())), tree)


def sharded_screen_pallas(net, nn_inits, betas, cohort, mesh: Mesh,
                          axis_name: str = "restarts",
                          substeps: int = 8) -> jax.Array:
    """Multi-chip screening: the fused Pallas RK4 kernel under ``shard_map``
    over the restart axis — each chip screens its shard of the multi-start
    grid with zero cross-chip communication (lanes are independent; the
    only collective in the pipeline is the later top-k over [G]).

    ``nn_inits [G, P]`` / ``betas [G, N]`` with G divisible by the mesh
    axis.  Falls back to interpret mode off-TPU (for mesh dry runs).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from conditional_ude_tpu.ops.pallas_rk4 import (
        _population_sse_pallas_impl,
        cohort_kinetics,
    )

    interpret = jax.default_backend() != "tpu"
    # the cohort DATA crosses the jit boundary as replicated traced
    # operands (a closure-captured cohort bakes the data bytes into the
    # HLO, so the persistent-compile-cache key would depend on them and
    # every same-shape cohort would repay the compile); only the static
    # time grid stays closure-side — the kernel needs it concrete
    inds = cohort.individuals
    kin = cohort_kinetics(cohort, with_age=net.input_dims == 3)
    tp = tuple(float(t) for t in np.asarray(cohort.timepoints))
    fn = shard_map(
        lambda nn_, b_, gl_, cp_, kin_: _population_sse_pallas_impl(
            net, nn_, b_, gl_, cp_, kin_, tp, substeps, interpret),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(), P(), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(fn)(nn_inits, betas, inds.glucose, cohort.cpeptide, kin)


def sharded_screen_tsit5_pallas(net, nn_params, betas, cohort, mesh: Mesh,
                                axis_name: str = "restarts",
                                max_steps: int = 256) -> jax.Array:
    """Multi-chip adaptive-Tsit5 population evaluation: the fused kernel of
    ``ops/pallas_tsit5.py`` under ``shard_map`` over the restart axis (the
    tolerance-parity ranking pass of ``train_conditional``).  Each chip
    expands ITS restart shard to (restart × individual) lanes locally, so
    the lane blow-up never crosses chips.  ``nn_params [G, P]`` /
    ``betas [G, N]`` with G divisible by the mesh axis; interpret mode
    off-TPU (driver dry runs)."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from conditional_ude_tpu.ops.pallas_rk4 import cohort_kinetics
    from conditional_ude_tpu.ops.pallas_tsit5 import cohort_sse_tsit5_pallas

    interpret = jax.default_backend() != "tpu"
    kin = cohort_kinetics(cohort, with_age=net.input_dims == 3)
    tp = tuple(float(t) for t in np.asarray(cohort.timepoints))
    inds = cohort.individuals

    def body(nn_, b_, gl_, cp_, kin_):
        g_, n_ = b_.shape

        def rep(x):
            return jnp.broadcast_to(
                x[None], (g_,) + x.shape).reshape((g_ * n_,) + x.shape[1:])

        nn_l = jnp.broadcast_to(
            nn_[:, None, :], (g_, n_, nn_.shape[-1])).reshape(g_ * n_, -1)
        sse, _ = cohort_sse_tsit5_pallas(
            net, nn_l, b_.reshape(-1), rep(gl_), rep(cp_), rep(kin_), tp,
            max_steps, interpret=interpret)
        return jnp.mean(sse.reshape(g_, n_), axis=1)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis_name, None), P(axis_name, None),
                             P(), P(), P()),
                   out_specs=P(axis_name), check_vma=False)
    return jax.jit(fn)(nn_params, betas, inds.glucose, cohort.cpeptide, kin)


def shard_cohort(cohort: Any, mesh: Mesh,
                 axis_name: str = "individuals") -> Any:
    """Shard a :class:`~conditional_ude_tpu.models.cpeptide.Cohort` over the
    individuals axis: per-individual leaves split, shared leaves replicate.

    The cohort's ``timepoints`` (shape [T], shared) replicates; everything
    under ``individuals`` plus ``cpeptide`` ([N, …]) shards on N.
    """
    from conditional_ude_tpu.models.cpeptide import Cohort

    inds = shard_leading(cohort.individuals, mesh, axis_name)
    cpep = shard_leading(cohort.cpeptide, mesh, axis_name)
    tp = jax.device_put(cohort.timepoints, NamedSharding(mesh, P()))
    return Cohort(individuals=inds, cpeptide=cpep, timepoints=tp)


def pad_cohort(cohort: Any, multiple: int) -> Any:
    """Pad a cohort's individuals axis up to a multiple (replicating the
    last subject) so it divides evenly across a mesh axis; callers slice
    the padded results back to the true ``n``."""
    from conditional_ude_tpu.models.cpeptide import Cohort

    if cohort.n % multiple == 0:
        return cohort
    inds = jax.tree.map(lambda a: pad_to_multiple(a, multiple),
                        cohort.individuals)
    cpep = pad_to_multiple(cohort.cpeptide, multiple)
    return Cohort(individuals=inds, cpeptide=cpep,
                  timepoints=cohort.timepoints)


def sharded_fit_betas(model, nn_params, cohort, mesh: Mesh,
                      axis_name: str = "individuals", sigma: bool = False,
                      **kwargs):
    """Per-individual (β[, σ]) re-estimation sharded over the population
    axis: the cohort splits over ``axis_name`` and the ordinary vmapped
    bounded-L-BFGS program partitions with zero cross-chip communication
    (each subject's fit is independent — the reference's serial loop at
    ``src/parameter-estimation.jl:272-307``).

    ``sigma=True`` routes to :func:`~…fit.train.fit_betas_sigma`.
    """
    from conditional_ude_tpu.fit.train import fit_betas, fit_betas_sigma

    n = cohort.n
    size = mesh.shape[axis_name]
    cohort_s = shard_cohort(pad_cohort(cohort, size), mesh, axis_name)
    fn = fit_betas_sigma if sigma else fit_betas
    out = fn(model, nn_params, cohort_s, **kwargs)
    return tuple(x[:n] for x in out)


def sharded_beta_profiles(model, nn_params, cohort, mesh: Mesh,
                          axis_name: str = "individuals",
                          sigmas=1.0, center=None,
                          use_pallas: bool | None = None,
                          lower: float = -4.0, upper: float = 1.0,
                          steps: int = 10_000, chunk: int = 500,
                          **solver_kwargs):
    """Cohort likelihood-profile scans sharded over the individuals axis
    (``src/likelihood-profiles.jl`` looped per subject in the reference);
    each chip scans its population shard over the full β grid.

    On TPU the fused Pallas RK4 kernel runs under ``shard_map`` (the
    Mosaic custom call has no SPMD partitioning rule, so the kernel cannot
    be fed globally-sharded operands under plain jit — but inside a
    ``shard_map`` body it sees only its chip-local block, mirroring
    ``sharded_screen_pallas``): each chip expands (grid-chunk × local
    individuals) lanes with zero cross-chip communication.  Off-TPU (the
    driver's virtual mesh dry runs) the kernel runs in interpret mode when
    forced; the default off-TPU path is the auto-partitioned XLA scan."""
    import jax.numpy as jnp

    from conditional_ude_tpu.analysis.profiles import (
        Profile,
        cohort_beta_profiles,
        fused_kernel_eligible,
    )

    n = cohort.n
    size = mesh.shape[axis_name]
    kernel_ok = fused_kernel_eligible(model, solver_kwargs)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and kernel_ok
    elif use_pallas and not kernel_ok:
        raise ValueError(
            "use_pallas=True requires the canonical conditional or "
            "covariate model (2- or 3-input tanh/softplus net) and "
            "supports only the 'substeps' solver kwarg")

    cohort_p = pad_cohort(cohort, size)
    sig = jnp.broadcast_to(jnp.asarray(sigmas, jnp.float32), (n,))
    sig_p = pad_to_multiple(sig, size)
    ctr = (jnp.zeros((n,), jnp.float32) if center is None
           else jnp.asarray(center, jnp.float32))
    ctr_p = pad_to_multiple(ctr, size)

    if not use_pallas:
        prof = cohort_beta_profiles(
            model, nn_params, shard_cohort(cohort_p, mesh, axis_name),
            sigmas=shard_leading(sig_p, mesh, axis_name),
            center=shard_leading(ctr_p, mesh, axis_name),
            use_pallas=False, lower=lower, upper=upper, steps=steps,
            chunk=chunk, **solver_kwargs)
        return Profile(grid=prof.grid, values=prof.values[:n],
                       minimum=prof.minimum[:n])

    from jax import shard_map
    from conditional_ude_tpu.ops.pallas_rk4 import (
        cohort_kinetics,
        cohort_sse_pallas,
    )

    interpret = jax.default_backend() != "tpu"
    substeps = int(solver_kwargs.get("substeps", 8))
    kin = cohort_kinetics(cohort_p, with_age=model.net.input_dims == 3)
    tp = tuple(float(t) for t in np.asarray(cohort_p.timepoints))
    grid = jnp.linspace(lower, upper, steps)
    n_local = cohort_p.n // size
    p_dim = nn_params.shape[0]

    def body(nn_, gl_, cp_, kin_, sig_, ctr_, grid_):
        def expand(x):
            return jnp.broadcast_to(
                x[None], (s_chunk,) + x.shape).reshape(
                    (s_chunk * n_local,) + x.shape[1:])

        parts = []
        for i in range(0, steps, chunk):
            g_chunk = grid_[i:i + chunk]
            s_chunk = g_chunk.shape[0]
            lanes = cohort_sse_pallas(
                model.net,
                jnp.broadcast_to(nn_[None], (s_chunk * n_local, p_dim)),
                (g_chunk[:, None] + ctr_[None, :]).reshape(-1),
                expand(gl_), expand(cp_), expand(kin_), tp, substeps,
                interpret=interpret)
            vals = lanes.reshape(s_chunk, n_local).T   # [n_local, s_chunk]
            parts.append(vals / (2.0 * sig_[:, None] ** 2))
        return jnp.concatenate(parts, axis=1)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P()),
        out_specs=P(axis_name), check_vma=False)
    values = jax.jit(fn)(nn_params, cohort_p.individuals.glucose,
                         cohort_p.cpeptide, kin, sig_p, ctr_p, grid)[:n]
    return Profile(grid=grid, values=values,
                   minimum=jnp.min(values, axis=1))
