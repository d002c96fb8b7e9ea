"""Pallas TPU kernel: fused cohort RK4 c-peptide solve + SSE.

The screening pass of joint cUDE training evaluates the population loss for
tens of thousands of (restart × individual) lanes; this kernel runs the
ENTIRE fixed-step RK4 solve — van Cauter kinetics + the conditional-MLP
production term + glucose forcing + SSE accumulation — inside one Pallas
program per lane block, with every intermediate living in VMEM/registers.

Kernel-enabling structure (vs the generic XLA path in ``ops/rk4.py``):
  * **scalar interpolation weights** — all lanes share the observation grid
    and step in lockstep, so the glucose interpolant's segment index and
    blend weight are compile-time/scalar values, eliminating per-lane
    gathers (XLA's ``searchsorted`` per stage);
  * **hoisted baseline MLP** — NN([0, e^β]) is time-invariant and computed
    once per solve instead of once per RK stage (halves MLP work);
  * **per-lane weights as VMEM rows** — the multi-start axis gives every
    lane its own 37-vector of MLP weights; they are read once into
    registers and reused across all 4·substeps·(T−1) stages.

Primal-only (no reverse-mode rule): used for the gradient-free hot paths —
screening, likelihood-profile scans, MCMC likelihoods.  The pure-JAX RK4 /
Tsit5 paths cover gradients and tolerance parity.

Reference capability: the screening loop at
``src/parameter-estimation.jl:362-366`` (25k × N_individuals serial solves).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conditional_ude_tpu.nn import MLP

LANE_BLOCK = 1024   # lanes per grid program (multiple of 128)


def check_net_canonical(net: MLP, input_dims: int | tuple = (2, 3)) -> None:
    """The fused kernels hard-code tanh hidden layers + a softplus head on
    2 inputs ([ΔG, e^β], canonical cUDE) or 3 ([ΔG, e^β, age], the covariate
    model of ``c-peptide/07-covariate-inclusion.jl:32``); reject any other
    architecture loudly instead of silently screening a different model."""
    allowed = (input_dims,) if isinstance(input_dims, int) else input_dims
    if (net.input_dims not in allowed
            or any(a != "tanh" for a in net.activations)
            or net.output_activation != "softplus"):
        raise ValueError(
            f"Pallas c-peptide kernels support only {allowed}-input MLPs "
            "with tanh hidden layers and a softplus output head; got "
            f"input_dims={net.input_dims}, activations={net.activations}, "
            f"output_activation={net.output_activation!r}. Use the XLA "
            "path (use_pallas=False / solver kwargs) for this network.")


def cohort_kinetics(cohort, with_age: bool) -> jax.Array:
    """Per-individual kinetic rows ``[N, 4]`` (k0, k1, k2, c0) — plus the
    age covariate as a 5th column when the model feeds it to the MLP."""
    inds = cohort.individuals
    cols = [inds.k0, inds.k1, inds.k2, inds.c0]
    if with_age:
        cols.append(inds.age)
    return jnp.stack(cols, axis=-1)


def _mlp_rows(nn_ref, layer_dims):
    """Split the [P, B] per-lane weight block into per-layer row lists.

    Returns [(W_rows[fo][fi], b_rows[fo]), ...] where each entry is a
    (1, B) row of per-lane scalars.
    """
    layers = []
    i = 0
    for fi, fo in layer_dims:
        W = [[nn_ref[i + o * fi + k] for k in range(fi)] for o in range(fo)]
        i += fi * fo
        b = [nn_ref[i + o] for o in range(fo)]
        i += fo
        layers.append((W, b))
    return layers


def _mlp_forward(layers, x, hidden_act, out_act):
    """Evaluate the per-lane MLP on a list of (1, B) input rows."""
    h = x
    n_layers = len(layers)
    for li, (W, b) in enumerate(layers):
        act = out_act if li == n_layers - 1 else hidden_act
        h = [act(sum(W[o][k] * h[k] for k in range(len(h))) + b[o])
             for o in range(len(W))]
    return h[0]


def _build_kernel(net: MLP, timepoints: tuple[float, ...], substeps: int,
                  with_age: bool = False):
    layer_dims = net.layer_dims
    p = net.num_params
    tp = timepoints
    n_seg = len(tp) - 1
    hidden = jnp.tanh
    softplus = jax.nn.softplus

    def kernel(nn_hbm, g_ref, data_ref, kin_ref, eb_ref, out_ref):
        B = out_ref.shape[1]
        rows = [nn_hbm[i] for i in range(p)]           # (B,) rows
        layers = _mlp_rows(rows, layer_dims)
        eb = eb_ref[0]
        k0, k1, k2, c0 = kin_ref[0], kin_ref[1], kin_ref[2], kin_ref[3]
        # covariate model: age is the 3rd (time-invariant) MLP input, one
        # scalar per lane carried as the 5th kinetics row
        extra = [kin_ref[4]] if with_age else []

        # baseline production input: ΔG = 0 (hoisted out of the time loop)
        zero = jnp.zeros_like(eb)
        base = _mlp_forward(layers, [zero, eb] + extra, hidden, softplus)

        # glucose value at absolute time 0 (the ΔG baseline; reference
        # t0 = 0.0, src/c-peptide-models.jl:69-75)
        ts = np.asarray(tp)
        j = int(np.clip(np.searchsorted(ts, 0.0, side="right") - 1,
                        0, n_seg - 1))
        w0 = float(np.clip((0.0 - ts[j]) / (ts[j + 1] - ts[j]), 0.0, 1.0))
        g_at0 = (1.0 - w0) * g_ref[j] + w0 * g_ref[j + 1]

        def production(dg):
            out = _mlp_forward(layers, [dg, eb] + extra, hidden, softplus)
            return out - base

        u1 = c0
        u2 = (k2 / k1) * c0
        sse = jnp.zeros_like(c0)
        # save point exactly at t0 (timepoints[0]): residual of u1 = c0
        sse = sse + (u1 - data_ref[0]) ** 2

        for seg in range(n_seg):
            t0_s, t1_s = float(tp[seg]), float(tp[seg + 1])
            dt = (t1_s - t0_s) / substeps
            gl, gr = g_ref[seg], g_ref[seg + 1]
            inv_span = 1.0 / (t1_s - t0_s)

            def rhs(t_scalar, v1, v2):
                w = (t_scalar - t0_s) * inv_span
                dg = (1.0 - w) * gl + w * gr - g_at0
                prod = production(dg)
                d1 = -(k0 + k2) * v1 + k1 * v2 + k0 * c0 + prod
                d2 = -k1 * v2 + k2 * v1
                return d1, d2

            def substep(i, carry):
                v1, v2 = carry
                t = t0_s + i.astype(jnp.float32) * dt
                a1, a2 = rhs(t, v1, v2)
                b1, b2 = rhs(t + 0.5 * dt, v1 + 0.5 * dt * a1,
                             v2 + 0.5 * dt * a2)
                c1, c2 = rhs(t + 0.5 * dt, v1 + 0.5 * dt * b1,
                             v2 + 0.5 * dt * b2)
                e1, e2 = rhs(t + dt, v1 + dt * c1, v2 + dt * c2)
                v1 = v1 + (dt / 6.0) * (a1 + 2 * b1 + 2 * c1 + e1)
                v2 = v2 + (dt / 6.0) * (a2 + 2 * b2 + 2 * c2 + e2)
                return v1, v2

            u1, u2 = jax.lax.fori_loop(0, substeps, substep, (u1, u2))
            sse = sse + (u1 - data_ref[seg + 1]) ** 2

        out_ref[0] = jnp.where(jnp.isfinite(sse), sse,
                               jnp.asarray(jnp.inf, sse.dtype))

    return kernel


@partial(jax.jit, static_argnums=(0, 6, 7, 8))
def cohort_sse_pallas(
    net: MLP,
    nn_params: jax.Array,    # [L, P] per-lane MLP weights
    betas: jax.Array,        # [L] conditional parameters (β, not e^β)
    glucose: jax.Array,      # [L, K] glucose curves
    data: jax.Array,         # [L, K] c-peptide observations
    kinetics: jax.Array,     # [L, 4] rows (k0, k1, k2, c0) — [L, 5] with a
                             # trailing age column for the covariate model
    timepoints: tuple[float, ...],
    substeps: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused per-lane SSE of the conditional-UDE c-peptide model.

    Lanes are (restart × individual) pairs; returns ``sse[L]`` with ``inf``
    for non-finite trajectories.  ``timepoints`` must be a static tuple
    (shared observation grid).
    """
    check_net_canonical(net)
    with_age = net.input_dims == 3
    n_kin = 4 + int(with_age)
    if kinetics.shape[-1] != n_kin:
        raise ValueError(
            f"kinetics must have {n_kin} columns for a "
            f"{net.input_dims}-input net, got {kinetics.shape[-1]}")
    l_total = betas.shape[0]
    p = net.num_params
    k = len(timepoints)
    block = min(LANE_BLOCK, _round_up(l_total, 128))
    l_pad = _round_up(l_total, block)

    def pad(x):
        widths = [(0, l_pad - l_total)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    nn_t = pad(nn_params).T                       # [P, Lp]
    g_t = pad(glucose).T                          # [K, Lp]
    d_t = pad(data).T                             # [K, Lp]
    kin_t = pad(kinetics).T                       # [4|5, Lp]
    # guard padded lanes: c0=1, k1=1 avoid 0/0 in u2 init
    if l_pad != l_total:
        kin_t = kin_t.at[1, l_total:].set(1.0)
        kin_t = kin_t.at[3, l_total:].set(1.0)
    eb_t = jnp.exp(pad(betas))[None, :]           # [1, Lp]

    kernel = _build_kernel(net, timepoints, substeps, with_age)
    grid = (l_pad // block,)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, l_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_kin, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(nn_t, g_t, d_t, kin_t, eb_t)
    return out[0, :l_total]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _build_population_kernel(net: MLP, timepoints: tuple[float, ...],
                             substeps: int, n_ind: int,
                             with_age: bool = False):
    """Population-loss kernel: lanes are RESTARTS; the individual axis is a
    ``fori_loop`` over per-individual scalars held in SMEM.

    Avoids the [restarts × individuals]-lane expansion of
    :func:`screen_population_pallas` entirely: the NN weight block is read
    once per restart lane (not once per lane × individual), and the only
    per-(restart, individual) array is the β matrix.
    """
    layer_dims = net.layer_dims
    p = net.num_params
    tp = timepoints
    n_seg = len(tp) - 1
    hidden = jnp.tanh
    softplus = jax.nn.softplus

    ts = np.asarray(tp)
    j0 = int(np.clip(np.searchsorted(ts, 0.0, side="right") - 1,
                     0, n_seg - 1))
    w0 = float(np.clip((0.0 - ts[j0]) / (ts[j0 + 1] - ts[j0]), 0.0, 1.0))

    def kernel(nn_ref, b_ref, g_smem, d_smem, kin_smem, out_ref):
        rows = [nn_ref[i] for i in range(p)]            # (B,) lane rows
        layers = _mlp_rows(rows, layer_dims)
        (w1, bias1), rest = layers[0], layers[1:]
        fo0 = len(w1)

        def per_individual(nidx, acc):
            k0 = kin_smem[0, nidx]
            k1 = kin_smem[1, nidx]
            k2 = kin_smem[2, nidx]
            c0 = kin_smem[3, nidx]
            eb = jnp.exp(b_ref[nidx])                   # (B,) lane row
            # β (and the age covariate, when present) only enter layer 1
            # and are time-invariant; their partial pre-activations are
            # constant across the whole solve — hoist them (the baseline
            # NN([0, e^β, …]) is then just tanh of the hoisted sums)
            s1 = [w1[o][1] * eb + bias1[o] for o in range(fo0)]
            if with_age:
                age = kin_smem[4, nidx]
                s1 = [s1[o] + w1[o][2] * age for o in range(fo0)]
            base = _mlp_forward(rest, [hidden(v) for v in s1],
                                hidden, softplus)

            def production(dg, eb_, base_):
                h1 = [hidden(w1[o][0] * dg + s1[o]) for o in range(fo0)]
                return _mlp_forward(rest, h1, hidden, softplus) - base_
            g_at0 = (1.0 - w0) * g_smem[j0, nidx] + w0 * g_smem[j0 + 1, nidx]

            u1 = c0 * jnp.ones_like(eb)
            u2 = (k2 / k1) * u1
            sse = (u1 - d_smem[0, nidx]) ** 2

            for seg in range(n_seg):
                t0_s, t1_s = float(tp[seg]), float(tp[seg + 1])
                dt = (t1_s - t0_s) / substeps
                gl, gr = g_smem[seg, nidx], g_smem[seg + 1, nidx]
                inv_span = 1.0 / (t1_s - t0_s)

                def rhs(t_scalar, v1, v2):
                    w = (t_scalar - t0_s) * inv_span
                    dg = (1.0 - w) * gl + w * gr - g_at0
                    prod = production(dg, eb, base)
                    d1 = -(k0 + k2) * v1 + k1 * v2 + k0 * c0 + prod
                    d2 = -k1 * v2 + k2 * v1
                    return d1, d2

                def substep(i, carry):
                    v1, v2 = carry
                    t = t0_s + i.astype(jnp.float32) * dt
                    a1, a2 = rhs(t, v1, v2)
                    b1, b2 = rhs(t + 0.5 * dt, v1 + 0.5 * dt * a1,
                                 v2 + 0.5 * dt * a2)
                    c1, c2 = rhs(t + 0.5 * dt, v1 + 0.5 * dt * b1,
                                 v2 + 0.5 * dt * b2)
                    e1, e2 = rhs(t + dt, v1 + dt * c1, v2 + dt * c2)
                    v1 = v1 + (dt / 6.0) * (a1 + 2 * b1 + 2 * c1 + e1)
                    v2 = v2 + (dt / 6.0) * (a2 + 2 * b2 + 2 * c2 + e2)
                    return v1, v2

                u1, u2 = jax.lax.fori_loop(0, substeps, substep, (u1, u2))
                sse = sse + (u1 - d_smem[seg + 1, nidx]) ** 2

            return acc + sse

        total = jax.lax.fori_loop(
            0, n_ind, per_individual,
            jnp.zeros_like(out_ref[0]))
        mean = total * (1.0 / n_ind)
        out_ref[0] = jnp.where(jnp.isfinite(mean), mean,
                               jnp.asarray(jnp.inf, mean.dtype))

    return kernel


@partial(jax.jit, static_argnums=(0, 6, 7, 8))
def _population_sse_pallas_impl(
    net: MLP,
    nn_params: jax.Array,    # [G, P]
    betas: jax.Array,        # [G, N]
    glucose: jax.Array,      # [N, K] (individual-major)
    data: jax.Array,         # [N, K]
    kinetics: jax.Array,     # [N, 4] ([N, 5] with age for the covariate model)
    timepoints: tuple[float, ...],
    substeps: int,
    interpret: bool,
) -> jax.Array:
    g_total, n_ind = betas.shape
    p = net.num_params
    k = len(timepoints)
    n_kin = kinetics.shape[-1]
    with_age = n_kin == 5
    block = min(LANE_BLOCK, _round_up(g_total, 128))
    g_pad = _round_up(g_total, block)

    def pad(x):
        widths = [(0, g_pad - g_total)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    nn_t = pad(nn_params).T                     # [P, Gp]
    b_t = pad(betas).T                          # [N, Gp]
    g_small = glucose.T.astype(jnp.float32)     # [K, N]
    d_small = data.T.astype(jnp.float32)        # [K, N]
    kin_small = kinetics.T.astype(jnp.float32)  # [4|5, N]

    kernel = _build_population_kernel(net, timepoints, substeps, n_ind,
                                      with_age)
    grid = (g_pad // block,)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, g_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ind, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_ind), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((k, n_ind), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_kin, n_ind), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(nn_t, b_t, g_small, d_small, kin_small)
    return out[0, :g_total]


def population_sse_pallas(
    net: MLP,
    nn_inits: jax.Array,     # [G, P] restart NN weights
    betas: jax.Array,        # [G, N] restart × individual conditionals
    cohort,
    substeps: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Population mean-SSE per restart with NO lane expansion.

    Preferred over :func:`screen_population_pallas` for screening: lanes
    are restarts, the individual axis runs as an in-kernel loop over SMEM
    scalars, so the broadcast/reshape of weights and cohort arrays to
    [G × N] lanes (and its HBM traffic) disappears — ~1.4× end-to-end on
    the 8192 × 82 screening workload.
    """
    check_net_canonical(net)
    inds = cohort.individuals
    kin = cohort_kinetics(cohort, with_age=net.input_dims == 3)
    tp = tuple(float(t) for t in np.asarray(cohort.timepoints))
    return _population_sse_pallas_impl(
        net, nn_inits, betas, inds.glucose, cohort.cpeptide, kin, tp,
        substeps, interpret)


def expand_to_lanes(nn_inits: jax.Array, betas: jax.Array, cohort,
                    with_age: bool = False):
    """Expand a [restarts] × [individuals] grid to flat kernel lanes.

    Shared by the RK4 and Tsit5 lane-level kernels.  Returns
    ``(nn[L, P], betas[L], glucose[L, K], data[L, K], kinetics[L, 4|5],
    timepoints_tuple)`` with ``L = G·N``.
    """
    g_, n_ = betas.shape[0], betas.shape[1]
    inds = cohort.individuals
    glucose = jnp.broadcast_to(inds.glucose[None], (g_, n_,
                                                    inds.glucose.shape[-1]))
    data = jnp.broadcast_to(cohort.cpeptide[None], (g_, n_,
                                                    cohort.cpeptide.shape[-1]))
    kin = cohort_kinetics(cohort, with_age)                    # [N, 4|5]
    n_kin = kin.shape[-1]
    kin = jnp.broadcast_to(kin[None], (g_, n_, n_kin))
    nn_lanes = jnp.broadcast_to(nn_inits[:, None, :],
                                (g_, n_, nn_inits.shape[-1]))
    tp = tuple(float(t) for t in np.asarray(cohort.timepoints))
    lanes = g_ * n_
    return (nn_lanes.reshape(lanes, -1), betas.reshape(lanes),
            glucose.reshape(lanes, -1), data.reshape(lanes, -1),
            kin.reshape(lanes, n_kin), tp)


def screen_population_pallas(
    net: MLP,
    nn_inits: jax.Array,     # [G, P] restart NN weights
    betas: jax.Array,        # [G, N] restart × individual conditionals
    cohort,
    substeps: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Population mean-SSE per restart via the lane-level fused kernel.

    Expands the restart × individual grid to lanes, runs one kernel, and
    reduces the individual axis.  Prefer :func:`population_sse_pallas`
    (no expansion) for large screens; this remains the reference
    implementation the expansion-free kernel is tested against.
    """
    g_, n_ = betas.shape[0], betas.shape[1]
    nn_l, b_l, g_l, d_l, kin_l, tp = expand_to_lanes(
        nn_inits, betas, cohort, with_age=net.input_dims == 3)
    sse = cohort_sse_pallas(net, nn_l, b_l, g_l, d_l, kin_l, tp,
                            substeps, interpret)
    return jnp.mean(sse.reshape(g_, n_), axis=1)
