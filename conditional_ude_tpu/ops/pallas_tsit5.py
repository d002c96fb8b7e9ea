"""Pallas TPU kernel: adaptive Tsit5 cohort solve + SSE, fully in-kernel.

The adaptive companion to :mod:`ops.pallas_rk4` — every lane advances its
OWN adaptive step sequence (per-lane t/dt/PI-controller state held as
(1, B) VMEM rows) inside one kernel, with done/failure masks instead of
control-flow divergence.  Residuals against the observations are
accumulated the moment a step crosses a save time, using the Tsit5 free
interpolant, so no trajectory buffer is materialized.

This is the tolerance-parity path (same tableau, controller, and failure
semantics as ``ops/tsit5.py``) at Pallas speed; primal-only like the RK4
kernel.  Reference capability: the adaptive ``solve(...)`` underneath every
loss in ``src/parameter-estimation.jl:56-68``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conditional_ude_tpu.nn import MLP
from conditional_ude_tpu.ops.pallas_rk4 import _mlp_rows, _mlp_forward, \
    _round_up
from conditional_ude_tpu.ops.tsit5 import _A, _BTILDE, _C, _interp_coeffs

LANE_BLOCK = 1024

_ORDER = 5.0
_BETA1 = 0.7 / _ORDER
_BETA2 = 0.4 / _ORDER
_SAFETY = 0.9
_FMIN = 0.2
_FMAX = 10.0


def _build_kernel(net: MLP, timepoints: tuple[float, ...], max_steps: int,
                  rtol: float, atol: float, with_age: bool = False):
    layer_dims = net.layer_dims
    p = net.num_params
    tp = timepoints
    n_save = len(tp)
    t0_f = float(tp[0])
    t1_f = float(tp[-1])
    t_span = t1_f - t0_f
    hidden = jnp.tanh
    softplus = jax.nn.softplus
    ts = np.asarray(tp)

    def kernel(nn_ref, g_ref, data_ref, kin_ref, eb_ref, out_ref, ok_ref):
        rows = [nn_ref[i] for i in range(p)]
        layers = _mlp_rows(rows, layer_dims)
        eb = eb_ref[0]
        k0, k1c, k2c, c0 = kin_ref[0], kin_ref[1], kin_ref[2], kin_ref[3]
        # covariate model: per-lane age as the 3rd MLP input (5th kin row)
        extra = [kin_ref[4]] if with_age else []

        zero = jnp.zeros_like(eb)
        base = _mlp_forward(layers, [zero, eb] + extra, hidden, softplus)

        # glucose interpolant at per-lane query times (knot times static)
        def g_at(t):
            val = g_ref[0]
            for j in range(n_save - 1):
                lo, hi = float(ts[j]), float(ts[j + 1])
                w = jnp.clip((t - lo) / (hi - lo), 0.0, 1.0)
                seg = (1.0 - w) * g_ref[j] + w * g_ref[j + 1]
                val = jnp.where(t >= lo, seg, val)
            return val

        j0 = int(np.clip(np.searchsorted(ts, 0.0, side="right") - 1, 0,
                         n_save - 2))
        w0 = float(np.clip((0.0 - ts[j0]) / (ts[j0 + 1] - ts[j0]), 0, 1))
        g_at0 = (1.0 - w0) * g_ref[j0] + w0 * g_ref[j0 + 1]

        def rhs(t, v1, v2):
            dg = g_at(t) - g_at0
            prod = _mlp_forward(layers, [dg, eb] + extra,
                                hidden, softplus) - base
            d1 = -(k0 + k2c) * v1 + k1c * v2 + k0 * c0 + prod
            d2 = -k1c * v2 + k2c * v1
            return d1, d2

        u1 = c0
        u2 = (k2c / k1c) * c0
        f1a, f1b = rhs(jnp.full_like(c0, t0_f), u1, u2)

        # Hairer initial dt on the 2-state system (ops/tsit5.py:_initial_dt)
        def rms2(a1, a2, s1, s2):
            return jnp.sqrt(0.5 * ((a1 / s1) ** 2 + (a2 / s2) ** 2) + 1e-30)

        s1 = atol + rtol * jnp.abs(u1)
        s2 = atol + rtol * jnp.abs(u2)
        d0 = rms2(u1, u2, s1, s2)
        d1 = rms2(f1a, f1b, s1, s2)
        small = (d0 < 1e-5) | (d1 < 1e-5)
        h0 = jnp.where(small, 1e-6,
                       0.01 * d0 / jnp.where(d1 == 0, 1.0, d1))
        h0 = jnp.minimum(h0, 0.1 * t_span)
        y1a = u1 + h0 * f1a
        y1b = u2 + h0 * f1b
        f2a, f2b = rhs(jnp.full_like(c0, t0_f) + h0, y1a, y1b)
        d2 = rms2(f2a - f1a, f2b - f1b, s1, s2) / h0
        dmax = jnp.maximum(d1, d2)
        # Hairer II.4 step (d): exponent 1/(p+1), p = 5 (ops/tsit5.py)
        h1 = jnp.where(dmax <= 1e-15, jnp.maximum(1e-6, h0 * 1e-3),
                       (0.01 / dmax) ** (1.0 / (_ORDER + 1.0)))
        dt = jnp.minimum(100.0 * h0, jnp.minimum(h1, t_span))
        dt = jnp.where(jnp.isfinite(dt) & (dt > 0), dt, 1e-6 * t_span)

        # SSE: save point at exactly t0 contributes (u1 - data[0])^2 when
        # timepoints[0] == t0 (it does for the OGTT grids)
        sse = (u1 - data_ref[0]) ** 2 if math.isclose(float(tp[0]), t0_f) \
            else jnp.zeros_like(c0)

        t = jnp.full_like(c0, t0_f)
        err_prev = jnp.ones_like(c0)
        # float 0/1 masks: boolean vectors in the fori_loop carry trip a
        # Mosaic layout bug (INTERNAL compile crash)
        done = jnp.zeros_like(c0)
        failed = jnp.zeros_like(c0)
        dt_min = 1e-10 * t_span

        def step(_, carry):
            t, dt, u1, u2, k1a, k1b, err_prev, done, failed, sse = carry
            active = (done == 0.0) & (failed == 0.0)
            dtc = jnp.maximum(jnp.minimum(dt, t1_f - t), 1e-12 * t_span)

            ka, kb = [k1a], [k1b]
            for s in range(1, 6):
                ts_ = t + _C[s] * dtc
                va = u1
                vb = u2
                for j in range(s):
                    va = va + dtc * _A[s][j] * ka[j]
                    vb = vb + dtc * _A[s][j] * kb[j]
                ra, rb = rhs(ts_, va, vb)
                ka.append(ra)
                kb.append(rb)
            ya = u1
            yb = u2
            for j in range(6):
                ya = ya + dtc * _A[6][j] * ka[j]
                yb = yb + dtc * _A[6][j] * kb[j]
            k7a, k7b = rhs(t + dtc, ya, yb)
            ka.append(k7a)
            kb.append(k7b)

            ea = jnp.zeros_like(u1)
            ebb = jnp.zeros_like(u2)
            for j in range(7):
                ea = ea + _BTILDE[j] * ka[j]
                ebb = ebb + _BTILDE[j] * kb[j]
            ea = dtc * ea
            ebb = dtc * ebb
            sc1 = atol + rtol * jnp.maximum(jnp.abs(u1), jnp.abs(ya))
            sc2 = atol + rtol * jnp.maximum(jnp.abs(u2), jnp.abs(yb))
            err = jnp.sqrt(0.5 * ((ea / sc1) ** 2 + (ebb / sc2) ** 2)
                           + 1e-30)

            finite = (jnp.isfinite(ya) & jnp.isfinite(yb)
                      & jnp.isfinite(err))
            accept = finite & (err <= 1.0)

            err_c = jnp.maximum(err, 1e-10)
            fac_acc = jnp.clip(_SAFETY * err_c ** (-_BETA1)
                               * err_prev ** _BETA2, _FMIN, _FMAX)
            fac_rej = jnp.clip(_SAFETY * err_c ** (-1.0 / _ORDER),
                               _FMIN, 1.0)
            factor = jnp.where(accept, fac_acc,
                               jnp.where(finite, fac_rej, 0.5))
            dt_next = dtc * factor

            # accumulate SSE at save points crossed by this step
            t_new = t + dtc
            reached_end = t_new >= t1_f - 1e-8 * t_span
            upd = active & accept
            for si in range(n_save):
                t_s = float(tp[si])
                if math.isclose(t_s, t0_f):
                    continue
                hit = upd & (t_s > t) & ((t_s <= t_new) | reached_end
                                         & (t_s <= t_new + 1e-8 * t_span))
                theta = jnp.clip((t_s - t) / dtc, 0.0, 1.0)
                bs = _interp_coeffs(theta)
                yi = u1
                for j in range(7):
                    yi = yi + dtc * bs[j] * ka[j]
                sse = jnp.where(hit, sse + (yi - data_ref[si]) ** 2, sse)

            new_failed = jnp.where(
                active & ~accept & (dt_next < dt_min), 1.0, failed)
            new_done = jnp.where(upd & reached_end, 1.0, done)
            return (jnp.where(upd, t_new, t),
                    jnp.where(active, dt_next, dt),
                    jnp.where(upd, ya, u1),
                    jnp.where(upd, yb, u2),
                    jnp.where(upd, k7a, k1a),
                    jnp.where(upd, k7b, k1b),
                    jnp.where(upd, err_c, err_prev),
                    new_done, new_failed, sse)

        carry = (t, dt, u1, u2, f1a, f1b, err_prev, done, failed, sse)
        carry = jax.lax.fori_loop(0, max_steps, step, carry)
        _, _, _, _, _, _, _, done, failed, sse = carry
        ok = (done == 1.0) & (failed == 0.0)
        out_ref[0] = jnp.where(ok & jnp.isfinite(sse), sse,
                               jnp.asarray(jnp.inf, sse.dtype))
        ok_ref[0] = ok

    return kernel


@partial(jax.jit, static_argnums=(0, 6, 7, 8, 9, 10))
def cohort_sse_tsit5_pallas(
    net: MLP,
    nn_params: jax.Array,    # [L, P]
    betas: jax.Array,        # [L]
    glucose: jax.Array,      # [L, K]
    data: jax.Array,         # [L, K]
    kinetics: jax.Array,     # [L, 4] (k0, k1, k2, c0) — [L, 5] with age
    timepoints: tuple[float, ...],
    max_steps: int = 256,
    rtol: float = 1e-3,
    atol: float = 1e-6,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Adaptive per-lane SSE; returns (sse[L], success[L])."""
    from conditional_ude_tpu.ops.pallas_rk4 import check_net_canonical

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

    nn_t = pad(nn_params).T
    g_t = pad(glucose).T
    d_t = pad(data).T
    kin_t = pad(kinetics).T
    if l_pad != l_total:
        kin_t = kin_t.at[1, l_total:].set(1.0)
        kin_t = kin_t.at[3, l_total:].set(1.0)
    eb_t = jnp.exp(pad(betas))[None, :]

    kernel = _build_kernel(net, timepoints, max_steps, rtol, atol, with_age)
    grid = (l_pad // block,)
    spec = lambda rows: pl.BlockSpec((rows, block), lambda i: (0, i),  # noqa: E731
                                     memory_space=pltpu.VMEM)

    sse, ok = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, l_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, l_pad), jnp.bool_)),
        grid=grid,
        in_specs=[spec(p), spec(k), spec(k), spec(n_kin), spec(1)],
        out_specs=(spec(1), spec(1)),
        interpret=interpret,
    )(nn_t, g_t, d_t, kin_t, eb_t)
    return sse[0, :l_total], ok[0, :l_total]


def screen_population_tsit5_pallas(
    net: MLP,
    nn_params: jax.Array,    # [G, P] restart NN weights
    betas: jax.Array,        # [G, N] restart × individual conditionals
    cohort,
    max_steps: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Population mean-SSE per restart with the adaptive kernel (the
    tolerance-parity ranking pass of ``train_conditional``); failed lanes
    contribute ``inf`` to their restart's mean."""
    from conditional_ude_tpu.ops.pallas_rk4 import expand_to_lanes

    g_, n_ = betas.shape[0], betas.shape[1]
    nn_l, b_l, g_l, d_l, kin_l, tp = expand_to_lanes(
        nn_params, betas, cohort, with_age=net.input_dims == 3)
    sse, _ = cohort_sse_tsit5_pallas(net, nn_l, b_l, g_l, d_l, kin_l, tp,
                                     max_steps, interpret=interpret)
    return jnp.mean(sse.reshape(g_, n_), axis=1)
