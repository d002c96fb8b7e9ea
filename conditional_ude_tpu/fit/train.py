"""Multi-start training engine for UDE / conditional-UDE models.

Reference parity (``src/parameter-estimation.jl``):
  * joint cUDE training — 25,000 (NN-random × β-LHS) initial screening →
    best 25 → Adam(1e-2)×1000 + L-BFGS×1000 per restart (:340-386),
  * non-conditional UDE training — 10,000 inits → best 10 (:211-247),
  * test-time conditional re-estimation — per-individual bounded L-BFGS on β
    (or β+σ) with the NN frozen (:272-307),
  * validation model selection — objectives matrix over candidate NNs ×
    validation individuals (:406-433).

TPU-first redesign: the screening pass is ONE batched loss evaluation over
the restart axis (chunked ``lax.map`` to bound memory), and each serial
``for restart`` / ``for individual`` loop is a ``vmap`` axis, so the entire
multi-start pipeline is a handful of compiled programs.  Failed restarts
surface as ``inf`` objectives instead of try/catch skips.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from conditional_ude_tpu.fit.losses import (
    population_sse,
    sse,
    sse_sigma,
)
from conditional_ude_tpu.fit.optim import adam_minimize
from conditional_ude_tpu.models.cpeptide import (
    Cohort,
    CPeptideModel,
    Individual,
    cohort_dynamic,
    cohort_times,
    cohort_with_times,
)
from conditional_ude_tpu.ops.lbfgs import lbfgs_minimize
from conditional_ude_tpu.parallel.mesh import (
    pad_to_multiple,
    shard_cohort,
    shard_leading,
)
from conditional_ude_tpu.utils.stats import latin_hypercube


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyper-parameters mirroring the reference's keyword defaults
    (``src/parameter-estimation.jl:340-348``)."""

    initial_guesses: int = 25_000
    selected_initials: int = 25
    lhs_lower: float = -2.0
    lhs_upper: float = 0.0
    n_conditional: int = 1
    adam_iters: int = 1000
    lbfgs_iters: int = 1000
    adam_lr: float = 1e-2
    # fixed-step RK4 is the throughput path: at substeps=8 its trajectories
    # are tighter than the reference's default adaptive tolerance on this
    # problem class (max err 3e-3 vs 1.6e-2) at ~300x the speed; final
    # objectives are re-evaluated with adaptive Tsit5 for parity ranking
    solver: str = "rk4"
    substeps: int = 8
    max_steps: int = 256
    screen_chunk: int = 4096
    final_eval_tsit5: bool = True
    # fused Pallas kernel for the screening pass (~4.5x over the XLA RK4
    # path on TPU); None = auto-enable on TPU for the plain conditional model
    use_pallas: bool | None = None
    # refinement runs as bounded-runtime dispatches (both the Adam state
    # and the L-BFGS curvature history thread through the chunks, so
    # chunking never changes the result): long single XLA programs through
    # the axon tunnel can get the worker killed
    dispatch_chunk: int = 500
    # stage wall-clock timers on stderr (experiment drivers turn this on;
    # library callers and tests stay quiet by default)
    log_timings: bool = False


class TrainResult(NamedTuple):
    """Per-restart trained parameters, best-first."""

    nn_params: jax.Array      # [R, P]
    betas: jax.Array          # [R, N, c]
    objectives: jax.Array     # [R]
    screen_losses: jax.Array  # [G] losses of all initial guesses
    loss_traces: jax.Array    # [R, adam_iters]
    # canonical ±1 β-gauge per restart (models.cpeptide.production_orientation:
    # the trained conditional axis has an arbitrary monotone orientation;
    # β analyses use orientations[r] * betas[r])
    orientations: jax.Array | None = None
    # wall-clock + code-path record: {"screen"/"adam"/"lbfgs"/"final_eval":
    # seconds, "screen_path"/"refine_path": str} — experiments persist it so
    # a timing regression is attributable to the path that actually ran
    timings: dict | None = None


def _chunked_map(fn, xs, chunk: int, extra=None, key=None):
    """``lax.map``-style evaluation in bounded-memory chunks (host loop).

    A partial tail chunk is padded up to the chunk size (repeating the last
    element) so it reuses the full chunk's compiled program instead of
    triggering a second compile — compiles dominate wall-clock through the
    TPU tunnel.

    ``extra`` is an optional unbatched pytree passed to ``fn(x, extra)`` as
    a traced operand — callers thread per-cohort DATA through it instead of
    closure-capturing it, so the compiled program (and its persistent-cache
    key) stays independent of the data bytes.

    ``key``: optional hashable identity of everything ``fn`` closes over —
    when given, the jitted wrapper joins the in-process ``_PROGRAMS`` cache
    so repeat calls skip the Python re-trace.
    """
    n = jax.tree.leaves(xs)[0].shape[0]
    if extra is None:
        def build():
            return jax.jit(jax.vmap(fn))  # one wrapper → one compile/shape
    else:
        def build():
            return jax.jit(jax.vmap(fn, in_axes=(0, None)))
    jfn = build() if key is None else _program(
        ("chunked_map", key, fn.__code__, extra is None), build)
    outs = []
    for i in range(0, n, chunk):
        part = jax.tree.map(lambda a: a[i : i + chunk], xs)
        m = jax.tree.leaves(part)[0].shape[0]
        if m < chunk and i > 0:
            part = jax.tree.map(lambda a: pad_to_multiple(a, chunk), part)
        outs.append(jfn(part)[:m] if extra is None
                    else jfn(part, extra)[:m])
    return jnp.concatenate(outs)


# -- in-process program cache -------------------------------------------------
# train_conditional (and evaluate_model) historically rebuilt their jitted
# stage programs as fresh closures on every call, so every same-config call
# repaid the Python trace+lower cost even though the persistent compile
# cache already reused the XLA executable — and tracing, not compute, is
# the refinement bottleneck (ops/pallas_grad.py module docstring).  The
# closures are data-polymorphic by design (cohort DATA rides through as
# traced operands; only the model/config/time-grid statics are captured),
# so a program is safely reusable whenever those statics match.  Keys
# include every captured static; shapes baked into a closure (L-BFGS's
# flat-vector layout) are part of its key.  Multi-seed sweeps (exp05,
# exp02_seeds, suppression λ-sweeps) hit this cache on every call after
# the first.
#
# KEY CONTRACT: a key must name (a) the program site, (b) every VALUE the
# closure captures, and (c) the ``__code__`` object of the traced
# function.  (c) makes source edits (including newly-captured variables)
# miss the cache automatically and keeps distinct sites from colliding;
# (b) still has to be maintained by hand — captured arrays/configs cannot
# be introspected generically.
_PROGRAMS: dict = {}


def _program(key, build):
    fn = _PROGRAMS.get(key)
    if fn is None:
        fn = _PROGRAMS[key] = build()
    return fn


def _times_key(times) -> tuple:
    """Hashable identity of a static time-grid pytree."""
    return tuple(
        (np.asarray(leaf).shape, np.asarray(leaf).tobytes())
        for leaf in jax.tree.leaves(times))


def _pallas_eligible(model: CPeptideModel, cfg: TrainConfig) -> bool:
    """The fused kernels cover the canonical cUDE ([ΔG, e^β] inputs) and the
    covariate model ([ΔG, e^β, age], ``c-peptide/07-covariate-inclusion.jl:32``):
    tanh hidden layers, softplus head, one conditional parameter, RK4."""
    net = model.net
    if net is None or cfg.n_conditional != 1 or cfg.solver != "rk4":
        return False
    kind_ok = ((model.kind == "conditional" and net.input_dims == 2)
               or (model.kind == "conditional_covariate"
                   and net.input_dims == 3))
    return (kind_ok
            and all(a == "tanh" for a in net.activations)
            and net.output_activation == "softplus")


def initial_designs(net, n: int, key: jax.Array, cfg: TrainConfig,
                    seed: int | None = None):
    """Joint initial designs: NN Glorot-uniform batch + β Latin hypercube.

    Every (individual, conditional-dim) pair is an independent LHS dimension
    — the reference samples each dimension of the design separately
    (``src/parameter-estimation.jl:36-38,352``).  Returns
    (nn_inits[G, P], betas_init[G, N, c]).
    """
    g = cfg.initial_guesses
    nn_inits = net.init_batch(key, g)
    # the raw key doubles as the LHS seed source: init_batch only consumes
    # SPLITS of it (fold_in/split derive distinct streams), so bits(key)
    # never collides with a Glorot draw.  Deliberately kept — rekeying
    # would silently invalidate every committed fixed-seed artifact.
    np_rng = np.random.default_rng(
        seed if seed is not None else int(np.asarray(jax.random.bits(key))))
    beta_flat = latin_hypercube(np_rng, g, n * cfg.n_conditional,
                                cfg.lhs_lower, cfg.lhs_upper)
    betas_init = jnp.asarray(beta_flat, jnp.float32).reshape(
        g, n, cfg.n_conditional)
    return nn_inits, betas_init


def train_conditional(
    model: CPeptideModel,
    cohort: Cohort,
    key: jax.Array,
    config: TrainConfig = TrainConfig(),
    seed: int | None = None,
    mesh=None,
) -> TrainResult:
    """Joint training of shared NN weights + per-individual β.

    Equivalent of ``train(models, timepoints, cpeptide, rng)`` at
    ``src/parameter-estimation.jl:340-386``.

    With ``mesh`` (a ``jax.sharding.Mesh``) the restart axis of the
    screening pass and the refinement stages is sharded over the mesh's
    ``"restarts"`` axis, and — if the mesh has an ``"individuals"`` axis —
    the cohort shards over it too; XLA partitions the vmapped losses with
    only the final reductions as collectives.
    """
    cfg = config
    n = cohort.n
    g = g_orig = cfg.initial_guesses
    _t0 = time.perf_counter()

    # -- initial designs (NN: Glorot-uniform batch; β: Latin hypercube) -----
    nn_inits, betas_init = initial_designs(model.net, n, key, cfg, seed)

    pallas_ok = _pallas_eligible(model, cfg)
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and pallas_ok
    elif use_pallas and not pallas_ok:
        raise ValueError(
            "use_pallas=True requires the canonical conditional or "
            "covariate model (kind='conditional' with a 2-input net, or "
            "'conditional_covariate' with a 3-input net; tanh hidden "
            "layers, softplus head, n_conditional=1, solver='rk4'); this "
            "model would be silently screened as a different network")
    # multi-chip fused path: screening AND refinement run the fused kernels
    # under shard_map over the restart axis (interpret mode off-TPU, which
    # the driver dry-run uses to validate the sharded program without
    # hardware)
    fused_mesh = (mesh is not None and use_pallas
                  and "restarts" in mesh.shape)
    interpret = jax.default_backend() != "tpu"

    cohort_full = cohort
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        r_size = mesh.shape.get("restarts", 1)
        nn_inits = shard_leading(pad_to_multiple(nn_inits, r_size), mesh,
                                 "restarts")
        betas_init = pad_to_multiple(betas_init, r_size)
        ind_ax = "individuals" if "individuals" in mesh.shape else None
        if ind_ax and n % mesh.shape[ind_ax] != 0:
            # padding the individuals axis would change the population
            # MEAN over individuals (duplicated subjects get extra weight),
            # so a non-divisible cohort degrades gracefully to a replicated
            # individuals axis — restart sharding still carries the
            # parallelism
            ind_ax = None
        if fused_mesh:
            # the fused kernels iterate the individual axis in-kernel over
            # replicated SMEM scalars — the cohort stays whole per chip and
            # the restart axis carries all the parallelism
            ind_ax = None
        betas_init = jax.device_put(
            betas_init, NamedSharding(mesh, P("restarts", ind_ax, None)))
        g = nn_inits.shape[0]
        if ind_ax:
            cohort = shard_cohort(cohort, mesh, ind_ax)

    loss_kw = dict(solver=cfg.solver, max_steps=cfg.max_steps,
                   substeps=cfg.substeps)

    # the cohort DATA crosses every jit boundary below as traced operands
    # (a closure-captured cohort is baked into the HLO as constants, so the
    # persistent-compile-cache key would depend on the data bytes and every
    # new cohort of the same shape would repay the full compile); the
    # static time grids re-attach inside each trace
    dyn0 = cohort_dynamic(cohort)
    times = cohort_times(cohort)

    if fused_mesh:
        # multi-chip screening: fused kernel under shard_map, restart
        # shards per chip, no cross-chip communication
        from conditional_ude_tpu.parallel.mesh import sharded_screen_pallas

        screen = sharded_screen_pallas(model.net, nn_inits,
                                       betas_init[:, :, 0], cohort_full,
                                       mesh, substeps=cfg.substeps)
    elif use_pallas:
        from conditional_ude_tpu.ops.pallas_rk4 import (
            population_sse_pallas,
        )

        parts = []
        for i in range(0, g, cfg.screen_chunk):
            nn_c = nn_inits[i:i + cfg.screen_chunk]
            b_c = betas_init[i:i + cfg.screen_chunk, :, 0]
            m = nn_c.shape[0]
            if m < cfg.screen_chunk and i > 0:
                # pad the tail chunk to the compiled shape (see _chunked_map)
                nn_c = pad_to_multiple(nn_c, cfg.screen_chunk)
                b_c = pad_to_multiple(b_c, cfg.screen_chunk)
            parts.append(population_sse_pallas(
                model.net, nn_c, b_c, cohort,
                substeps=cfg.substeps, interpret=interpret)[:m])
        screen = jnp.concatenate(parts)                            # [G]
    else:
        def screen_loss(p, dyn):
            nn, b = p
            return population_sse(model, nn, b,
                                  cohort_with_times(dyn, times), **loss_kw)

        screen = _chunked_map(screen_loss, (nn_inits, betas_init),
                              cfg.screen_chunk, extra=dyn0,
                              key=("screen", model, cfg,
                                   _times_key(times)))             # [G]

    jax.block_until_ready(screen)
    _t1 = time.perf_counter()

    # -- top-k selection ------------------------------------------------------
    # padded mesh lanes replicate the last real design — mask them out so
    # duplicates cannot occupy several of the k refinement slots
    if g != g_orig:
        screen = screen.at[g_orig:].set(jnp.inf)
    k = cfg.selected_initials
    top = jnp.argsort(jnp.where(jnp.isfinite(screen), screen, jnp.inf))[:k]
    nn0 = nn_inits[top]
    b0 = betas_init[top]
    k_run = k
    if fused_mesh:
        # shard_map needs the restart axis divisible: pad with replicas of
        # the last selected design (they refine like real lanes and are
        # sliced off before ranking)
        r_size = mesh.shape["restarts"]
        nn0 = pad_to_multiple(nn0, r_size)
        b0 = pad_to_multiple(b0, r_size)
        k_run = nn0.shape[0]
    elif mesh is not None and k % mesh.shape.get("restarts", 1) == 0:
        # keep the refinement stages sharded over the restart axis too
        # (ind_ax carries the divisibility-guarded choice from above)
        from jax.sharding import NamedSharding, PartitionSpec as P

        nn0 = jax.device_put(nn0, NamedSharding(mesh, P("restarts", None)))
        b0 = jax.device_put(
            b0, NamedSharding(mesh, P("restarts", ind_ax, None)))

    # -- Adam stage (vmapped over restarts, bounded-runtime dispatches) -------
    import optax

    def loss_tree(p, cohort_):
        return population_sse(model, p["neural"], p["conditional"],
                              cohort_, **loss_kw)

    # fused value+grad: the Pallas affine-adjoint kernel replaces XLA
    # reverse-mode AD through the RK4 scan on every refinement evaluation
    # (~2 orders of magnitude less VPU work; ops/pallas_grad.py)
    fused_vg = None
    if use_pallas:
        from conditional_ude_tpu.ops.pallas_grad import fused_population_vg

        fused_vg = fused_population_vg(model.net, cohort,
                                       substeps=cfg.substeps,
                                       interpret=interpret)

    def _shard_restarts(vmapped_fn):
        """Wrap a vmapped refinement step in ``shard_map`` over the restart
        axis: each chip refines its restart shard with the fused kernels on
        LOCAL lanes and zero cross-chip communication (the cohort operand
        replicates, spec ``P()``)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        return shard_map(vmapped_fn, mesh=mesh,
                         in_specs=(P("restarts"), P("restarts"),
                                   P("restarts"), P()),
                         out_specs=P("restarts"), check_vma=False)

    def tree_vg(pt, dyn):
        f, gnn, gb = fused_vg(pt["neural"], pt["conditional"][:, 0], dyn)
        return f, {"neural": gnn, "conditional": gb[:, None]}

    def run_adam_chunk(nn, b, state, dyn, iters):
        cohort_ = cohort_with_times(dyn, times)
        res = adam_minimize(lambda p: loss_tree(p, cohort_),
                            {"neural": nn, "conditional": b},
                            iters=iters, lr=cfg.adam_lr, opt_state=state,
                            fun_and_grad=(lambda p: tree_vg(p, dyn))
                            if fused_vg else None)
        return (res.x["neural"], res.x["conditional"], res.opt_state,
                res.loss_trace)

    # program-cache key: every static the refinement closures capture
    # (model + cfg are frozen dataclasses; times identifies the grids the
    # kernels bake in; mesh identity covers the shard_map wrapping)
    _refine_key = (model, cfg, _times_key(times), bool(fused_vg),
                   interpret, mesh)

    if fused_mesh:
        def adam_step(nn, b, state, dyn, iters):
            prog = _program(
                ("adam_mesh", _refine_key, run_adam_chunk.__code__, iters),
                lambda: jax.jit(_shard_restarts(
                    jax.vmap(partial(run_adam_chunk, iters=iters),
                             in_axes=(0, 0, 0, None)))))
            return prog(nn, b, state, dyn)
    else:
        adam_step = _program(
            ("adam", _refine_key, run_adam_chunk.__code__),
            lambda: jax.jit(jax.vmap(run_adam_chunk,
                                     in_axes=(0, 0, 0, None, None)),
                            static_argnums=4))
    state = jax.vmap(lambda nn, b: optax.adam(cfg.adam_lr).init(
        {"neural": nn, "conditional": b}))(nn0, b0)
    nn1, b1 = nn0, b0
    trace_parts = [jnp.zeros((k_run, 0), jnp.float32)]
    done_iters = 0
    # per-stage chunks: long single XLA programs through the axon tunnel
    # get the worker killed, so each stage runs as ≤dispatch_chunk-iteration
    # dispatches sized to its OWN budget (exactly adam_iters/lbfgs_iters
    # total; no overrun on non-divisible budgets)
    while done_iters < cfg.adam_iters:
        step = min(max(1, cfg.dispatch_chunk), cfg.adam_iters - done_iters)
        nn1, b1, state, tr = adam_step(nn1, b1, state, dyn0, step)
        jax.block_until_ready(b1)
        trace_parts.append(tr)
        done_iters += step
    traces = jnp.concatenate(trace_parts, axis=1)
    _t2 = time.perf_counter()

    # -- L-BFGS stage (flat joint vector per restart, chunked dispatches;
    # the curvature history threads through the chunks, so the dispatch
    # size never changes the optimization trajectory) -------------------------
    p_nn = nn1.shape[-1]

    def run_lbfgs_chunk(nn, b, state, dyn, iters):
        x0 = jnp.concatenate([nn, b.reshape(-1)])
        cohort_ = cohort_with_times(dyn, times)

        def flat_loss(x):
            return population_sse(model, x[:p_nn],
                                  x[p_nn:].reshape(n, cfg.n_conditional),
                                  cohort_, **loss_kw)

        def flat_vg(x):
            f, gnn, gb = fused_vg(x[:p_nn], x[p_nn:], dyn)
            return f, jnp.concatenate([gnn, gb])

        res = lbfgs_minimize(flat_loss, x0, max_iters=iters,
                             fun_and_grad=flat_vg if fused_vg else None,
                             init_state=state)
        return (res.x[:p_nn], res.x[p_nn:].reshape(n, cfg.n_conditional),
                res.fval, res.state)

    # the flat-vector layout bakes (p_nn, n) into the closure, so they join
    # the program key (the adam closures are shape-free and share across
    # cohort sizes; these re-cache per cohort shape)
    _lbfgs_key = (_refine_key, p_nn, n)
    if fused_mesh:
        def lbfgs_step(nn, b, state, dyn, iters):
            prog = _program(
                ("lbfgs_mesh", _lbfgs_key, run_lbfgs_chunk.__code__, iters),
                lambda: jax.jit(_shard_restarts(
                    jax.vmap(partial(run_lbfgs_chunk, iters=iters),
                             in_axes=(0, 0, 0, None)))))
            return prog(nn, b, state, dyn)
    else:
        lbfgs_step = _program(
            ("lbfgs", _lbfgs_key, run_lbfgs_chunk.__code__),
            lambda: jax.jit(jax.vmap(run_lbfgs_chunk,
                                     in_axes=(0, 0, 0, None, None)),
                            static_argnums=4))
    nn2, b2, objs, lb_state = nn1, b1, None, None
    done_iters = 0
    while done_iters < cfg.lbfgs_iters:
        step = min(max(1, cfg.dispatch_chunk), cfg.lbfgs_iters - done_iters)
        nn2, b2, objs, lb_state = lbfgs_step(nn2, b2, lb_state, dyn0, step)
        jax.block_until_ready(objs)
        done_iters += step

    if objs is None:
        # lbfgs_iters=0: objectives from one batched loss evaluation
        def _eval_final(nn, b, dyn):
            cohort_ = cohort_with_times(dyn, times)
            return jax.vmap(lambda nn_, b_: population_sse(
                model, nn_, b_, cohort_, **loss_kw))(nn, b)

        objs = jax.jit(_eval_final)(nn2, b2, dyn0)

    _t3 = time.perf_counter()
    if cfg.final_eval_tsit5 and cfg.solver != "tsit5":
        # parity ranking: re-evaluate final objectives with the adaptive
        # solver the reference uses (one cheap gradient-free batched pass;
        # the fused adaptive kernel where eligible)
        if fused_mesh:
            from conditional_ude_tpu.parallel.mesh import (
                sharded_screen_tsit5_pallas,
            )

            objs = sharded_screen_tsit5_pallas(
                model.net, nn2, b2[:, :, 0], cohort_full, mesh,
                max_steps=cfg.max_steps)
        elif use_pallas and mesh is None:
            from conditional_ude_tpu.ops.pallas_tsit5 import (
                screen_population_tsit5_pallas,
            )

            objs = screen_population_tsit5_pallas(
                model.net, nn2, b2[:, :, 0], cohort,
                max_steps=cfg.max_steps, interpret=interpret)
        else:
            def _eval_tsit5(nn, b, dyn):
                cohort_ = cohort_with_times(dyn, times)
                return jax.vmap(lambda nn_, b_: population_sse(
                    model, nn_, b_, cohort_, solver="tsit5",
                    max_steps=cfg.max_steps))(nn, b)

            objs = _program(
                ("final_tsit5", _refine_key, _eval_tsit5.__code__),
                lambda: jax.jit(_eval_tsit5))(nn2, b2, dyn0)

    jax.block_until_ready(objs)
    _t4 = time.perf_counter()
    # name the code path that actually ran (r03 verdict weak #1: the exp07
    # timing regression was undiagnosable because nothing logged whether
    # the fused kernels engaged)
    timings = {
        "screen": _t1 - _t0, "adam": _t2 - _t1, "lbfgs": _t3 - _t2,
        "final_eval": _t4 - _t3,
        "screen_path": ("fused_pallas+shard_map" if fused_mesh
                        else "fused_pallas" if use_pallas else "xla_vmap"),
        "refine_path": ("fused_adjoint+shard_map" if fused_mesh
                        else "fused_adjoint" if fused_vg is not None
                        else "xla_reverse_ad"),
    }
    if cfg.log_timings:
        print(f"[train_conditional] screen={timings['screen']:.1f}s "
              f"adam={timings['adam']:.1f}s lbfgs={timings['lbfgs']:.1f}s "
              f"final_eval={timings['final_eval']:.1f}s "
              f"screen_path={timings['screen_path']} "
              f"refine_path={timings['refine_path']} "
              f"kind={model.kind} input_dims={model.net.input_dims}",
              file=sys.stderr)

    if k_run != k:
        # drop the shard_map padding replicas before ranking
        nn2, b2, objs, traces = nn2[:k], b2[:k], objs[:k], traces[:k]

    # gauge-fix the conditional axis: emit each restart's canonical ±1 β
    # orientation (the trained gauge is arbitrary; see
    # models.cpeptide.production_orientation).  The cohort's mean age rides
    # as an operand so the program stays data-polymorphic.
    from conditional_ude_tpu.models.cpeptide import production_orientation

    expected_in = 2 + (model.kind == "conditional_covariate")
    orients = None
    if cfg.n_conditional == 1 and model.net.input_dims == expected_in:
        mean_age = jnp.mean(cohort_full.individuals.age)
        orients = _program(
            ("orientation", model),
            lambda: jax.jit(jax.vmap(
                lambda nn_, a_: production_orientation(model, nn_, age=a_),
                in_axes=(0, None))))(nn2, mean_age)

    order = jnp.argsort(jnp.where(jnp.isfinite(objs), objs, jnp.inf))
    return TrainResult(nn_params=nn2[order], betas=b2[order],
                       objectives=objs[order],
                       screen_losses=screen[:g_orig],
                       loss_traces=traces[order],
                       orientations=None if orients is None
                       else orients[order],
                       timings=timings)


def train_ude(
    model: CPeptideModel,
    ind: Individual,
    timepoints: jax.Array,
    data: jax.Array,
    key: jax.Array,
    initial_guesses: int = 10_000,
    selected_initials: int = 10,
    adam_iters: int = 1000,
    lbfgs_iters: int = 1000,
    adam_lr: float = 1e-2,
    solver: str = "rk4",
    substeps: int = 8,
    max_steps: int = 256,
    screen_chunk: int = 4096,
):
    """Non-conditional UDE fit on a single series (reference :211-247,
    used on the mean train curve by ``c-peptide/01-non-conditional.jl``)."""
    loss_kw = dict(solver=solver, max_steps=max_steps, substeps=substeps)

    # the series DATA rides through the jit boundaries as traced operands
    # (closure-captured arrays bake into the HLO as constants and defeat
    # the compile caches across series); the glucose time grid is a static
    # measurement-design constant and stays closure-side
    glucose_t = np.asarray(ind.glucose_t)
    ind_dyn = ind._replace(glucose_t=None)
    data = jnp.asarray(data, jnp.float32)

    def loss_nn(nn, ex):
        ind_, data_ = ex
        return sse(model, {"neural": nn}, ind_._replace(glucose_t=glucose_t),
                   timepoints, data_, **loss_kw)

    extra = (ind_dyn, data)
    nn_inits = model.net.init_batch(key, initial_guesses)
    screen = _chunked_map(loss_nn, nn_inits, screen_chunk, extra=extra)
    top = jnp.argsort(jnp.where(jnp.isfinite(screen), screen, jnp.inf))
    nn0 = nn_inits[top[:selected_initials]]

    # two separate dispatches (adam, then lbfgs) keep program runtimes
    # bounded for the axon tunnel
    nn1 = jax.jit(jax.vmap(
        lambda nn, ex: adam_minimize(lambda p: loss_nn(p, ex), nn,
                                     iters=adam_iters, lr=adam_lr).x,
        in_axes=(0, None)))(nn0, extra)
    jax.block_until_ready(nn1)

    def refine(nn, ex):
        res2 = lbfgs_minimize(lambda p: loss_nn(p, ex), nn,
                              max_iters=lbfgs_iters)
        return res2.x, res2.fval

    nn_fit, objs = jax.jit(jax.vmap(refine, in_axes=(0, None)))(nn1, extra)
    order = jnp.argsort(jnp.where(jnp.isfinite(objs), objs, jnp.inf))
    return nn_fit[order], objs[order], screen


@partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
def fit_betas(
    model: CPeptideModel,
    nn_params: jax.Array,
    cohort: Cohort,
    initial_beta: jax.Array | float = -2.0,
    bounds: tuple[float, float] = (-4.0, 1.0),
    lbfgs_iters: int = 1000,
    solver: str = "rk4",
    max_steps: int = 256,
    substeps: int = 8,
):
    """Per-individual bounded β re-estimation with frozen NN.

    Equivalent of ``train(models, …, neural_network_parameters)`` at
    ``src/parameter-estimation.jl:272-288`` — the reference's serial loop is
    one vmap over the cohort.  Returns (betas[N], objectives[N]).
    """
    lb, ub = bounds
    init = jnp.broadcast_to(jnp.asarray(initial_beta, jnp.float32),
                            (cohort.n,))

    def fit_one(b0, ind, data):
        def loss(b):
            params = {"neural": nn_params, "conditional": b}
            return sse(model, params, ind, cohort.timepoints, data,
                       solver=solver, max_steps=max_steps, substeps=substeps)

        res = lbfgs_minimize(loss, b0[None],
                             lower=jnp.array([lb], jnp.float32),
                             upper=jnp.array([ub], jnp.float32),
                             max_iters=lbfgs_iters)
        return res.x[0], res.fval

    return jax.vmap(fit_one)(init, cohort.individuals, cohort.cpeptide)


@partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
def fit_betas_sigma(
    model: CPeptideModel,
    nn_params: jax.Array,
    cohort: Cohort,
    initial_beta: jax.Array | float = -2.0,
    bounds: tuple[float, float] = (-4.0, 1.0),
    lbfgs_iters: int = 1000,
    solver: str = "rk4",
    max_steps: int = 256,
    substeps: int = 8,
):
    """β + σ re-estimation via the Gaussian NLL (reference
    ``train_with_sigma``, :290-307; σ effectively unbounded, initial 1.0).

    σ is floored at a tiny positive value rather than the reference's
    (-Inf, Inf): the NLL is even in σ, so an optimizer overshoot through 0
    would otherwise converge to an equal-objective NEGATIVE σ that breaks
    every downstream scale use (CIs, posterior bands) — the positive floor
    selects the equivalent positive minimum.

    Returns (betas[N], sigmas[N], objectives[N]).
    """
    lb, ub = bounds
    init = jnp.broadcast_to(jnp.asarray(initial_beta, jnp.float32),
                            (cohort.n,))
    big = 1e30

    def fit_one(b0, ind, data):
        def loss(x):
            params = {"neural": nn_params, "conditional": x[0]}
            return sse_sigma(model, params, x[1], ind, cohort.timepoints,
                             data, solver=solver, max_steps=max_steps,
                             substeps=substeps)

        res = lbfgs_minimize(
            loss, jnp.stack([b0, jnp.asarray(1.0, jnp.float32)]),
            lower=jnp.array([lb, 1e-6], jnp.float32),
            upper=jnp.array([ub, big], jnp.float32),
            max_iters=lbfgs_iters)
        return res.x[0], res.x[1], res.fval

    return jax.vmap(fit_one)(init, cohort.individuals, cohort.cpeptide)


def evaluate_model(
    model: CPeptideModel,
    candidates_nn: jax.Array,   # [R, P]
    betas_train: jax.Array,     # [R, N_train, c] or [R, N_train]
    cohort: Cohort,             # validation cohort
    lbfgs_iters: int = 1000,
    solver: str = "rk4",
    max_steps: int = 256,
    substeps: int = 8,
) -> jax.Array:
    """Validation objectives matrix [R, N_valid] for model selection.

    Equivalent of ``evaluate_model`` (``src/parameter-estimation.jl:406-433``):
    for each candidate NN, re-fit β on each validation individual by
    *unbounded* L-BFGS initialized at the mean of that candidate's training
    β's; pick the candidate with the smallest summed objective.
    """
    init_betas = jnp.mean(betas_train.reshape(betas_train.shape[0], -1),
                          axis=1)  # [R]
    big = 1e30

    # the validation cohort is a jit operand (not a closure capture) so a
    # new same-shape cohort reuses the compiled selection program; the
    # jitted wrapper itself is program-cached so repeat selections skip
    # the Python re-trace too
    def build():
        def per_candidate(nn, b0, cohort_):
            betas, objs = fit_betas(model, nn, cohort_, initial_beta=b0,
                                    bounds=(-big, big),
                                    lbfgs_iters=lbfgs_iters,
                                    solver=solver, max_steps=max_steps,
                                    substeps=substeps)
            return objs

        return jax.jit(jax.vmap(per_candidate, in_axes=(0, 0, None)))

    prog = _program(("evaluate_model", model, lbfgs_iters, solver,
                     max_steps, substeps, evaluate_model.__code__), build)
    return prog(candidates_nn, init_betas, cohort)


def select_best(objectives: jax.Array) -> int:
    """argmin over candidates of summed validation objectives
    (``c-peptide/02-conditional.jl:40``)."""
    return int(jnp.argmin(jnp.sum(objectives, axis=1)))
