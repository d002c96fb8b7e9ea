"""Fused value+gradient kernel vs XLA reverse-mode AD (interpret mode).

The kernel computes the exact discrete gradient of the RK4 population loss
via the affine-in-state adjoint (``ops/pallas_grad.py``); XLA's
``value_and_grad`` through ``population_sse(..., solver="rk4")`` is the
independent reference — same discretization, different derivation, so
agreement validates both the stage-matrix algebra and the hand MLP VJP.

All tests share ONE kernel configuration (3 save points, substeps=2,
8 restart lanes): the kernel body is a large unrolled program and
interpret-mode XLA compiles it from scratch per distinct shape, so shape
reuse keeps the file's runtime in seconds instead of minutes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_ude_tpu.fit.losses import population_sse
from conditional_ude_tpu.models.cpeptide import CPeptideModel, \
    build_cohort, cohort_dynamic
from conditional_ude_tpu.nn import chain
from conditional_ude_tpu.ops.pallas_grad import population_sse_and_grad_pallas

pytestmark = pytest.mark.slow

SUBSTEPS = 2
G = 8


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    n = 5
    tp = np.array([0.0, 60.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 3))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 3))
    cohort = build_cohort(glucose, tp, cpeptide, rng.uniform(30, 70, n),
                          rng.uniform(size=n) > 0.5)
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    return cohort, net, model


def _xla_value_and_grad(model, cohort, nn, betas):
    def loss(nn_, b_):
        return population_sse(model, nn_, b_[:, None], cohort,
                              solver="rk4", substeps=SUBSTEPS)

    vg = jax.vmap(jax.value_and_grad(loss, argnums=(0, 1)))
    f, (gnn, gb) = vg(nn, betas)
    return f, gnn, gb


def _kernel(net, cohort, nn, betas):
    return population_sse_and_grad_pallas(net, nn, betas, cohort,
                                          substeps=SUBSTEPS, interpret=True)


def _assert_grads_close(got, ref):
    got, ref = np.asarray(got), np.asarray(ref)
    scale = np.maximum(np.abs(ref).max(axis=1, keepdims=True), 1e-6)
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-4)


def test_value_and_grad_match_xla(setup):
    cohort, net, model = setup
    nn = net.init_batch(jax.random.key(5), G)
    betas = jnp.asarray(
        np.random.default_rng(3).uniform(-2, 0, (G, cohort.n)), jnp.float32)

    f_ref, gnn_ref, gb_ref = _xla_value_and_grad(model, cohort, nn, betas)
    f, gnn, gb = _kernel(net, cohort, nn, betas)

    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), rtol=1e-4)
    _assert_grads_close(gnn, gnn_ref)
    _assert_grads_close(gb, gb_ref)


def test_grad_after_refinement_iterates(setup):
    # gradients must stay exact away from the init distribution too: take a
    # few gradient steps first, then re-compare
    cohort, net, model = setup
    nn = net.init_batch(jax.random.key(9), G)
    betas = jnp.full((G, cohort.n), -1.0, jnp.float32)
    for _ in range(5):
        _, gnn, gb = _xla_value_and_grad(model, cohort, nn, betas)
        nn = nn - 0.05 * gnn
        betas = betas - 0.05 * gb

    f_ref, gnn_ref, gb_ref = _xla_value_and_grad(model, cohort, nn, betas)
    f, gnn_k, gb_k = _kernel(net, cohort, nn, betas)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), rtol=1e-4)
    _assert_grads_close(gnn_k, gnn_ref)
    _assert_grads_close(gb_k, gb_ref)


def test_finite_difference_spotcheck(setup):
    # independent of XLA AD: central differences, packed into the SAME
    # 8-lane batch shape as the other tests (one compile)
    cohort, net, _model = setup
    nn0 = net.init_batch(jax.random.key(2), 1)[0]
    b0 = jnp.full((cohort.n,), -0.7, jnp.float32)
    eps = 1e-3
    i1, i2 = 0, net.num_params - 1
    e1 = jnp.zeros_like(nn0).at[i1].set(eps)
    e2 = jnp.zeros_like(nn0).at[i2].set(eps)
    eb = jnp.zeros_like(b0).at[2].set(eps)

    nn_l = jnp.stack([nn0 + e1, nn0 - e1, nn0 + e2, nn0 - e2,
                      nn0, nn0, nn0, nn0])
    b_l = jnp.stack([b0, b0, b0, b0, b0 + eb, b0 - eb, b0, b0])
    f, gnn, gb = _kernel(net, cohort, nn_l, b_l)
    f = np.asarray(f)

    fd1 = (f[0] - f[1]) / (2 * eps)
    fd2 = (f[2] - f[3]) / (2 * eps)
    fdb = (f[4] - f[5]) / (2 * eps)
    assert abs(fd1 - float(gnn[6, i1])) <= 2e-2 * max(1.0, abs(fd1))
    assert abs(fd2 - float(gnn[6, i2])) <= 2e-2 * max(1.0, abs(fd2))
    assert abs(fdb - float(gb[6, 2])) <= 2e-2 * max(1.0, abs(fdb))


def test_fused_vg_through_vmapped_optimizers(setup):
    # the custom_vmap seam: per-lane optimizers vmapped over restarts must
    # batch their loss evaluations into one kernel launch, and reach the
    # same minima as the XLA-AD path
    from conditional_ude_tpu.fit.optim import adam_minimize
    from conditional_ude_tpu.ops.lbfgs import lbfgs_minimize
    from conditional_ude_tpu.ops.pallas_grad import fused_population_vg

    cohort, net, model = setup
    p_nn = net.num_params
    n = cohort.n
    nn = net.init_batch(jax.random.key(1), G)
    betas = jnp.asarray(
        np.random.default_rng(5).uniform(-2, 0, (G, n)), jnp.float32)
    vg = fused_population_vg(net, cohort, substeps=SUBSTEPS, interpret=True)
    dyn = cohort_dynamic(cohort)

    def flat_loss(x):
        return population_sse(model, x[:p_nn], x[p_nn:, None], cohort,
                              solver="rk4", substeps=SUBSTEPS)

    def flat_vg(x):
        f, gnn, gb = vg(x[:p_nn], x[p_nn:], dyn)
        return f, jnp.concatenate([gnn, gb])

    x0 = jnp.concatenate([nn, betas], axis=1)
    run_fused = jax.vmap(lambda x: lbfgs_minimize(
        flat_loss, x, max_iters=30, fun_and_grad=flat_vg))
    run_xla = jax.vmap(lambda x: lbfgs_minimize(flat_loss, x, max_iters=30))
    f_fused = np.asarray(run_fused(x0).fval)
    f_xla = np.asarray(run_xla(x0).fval)
    # same optimizer, gradients equal up to f32 reassociation — but the
    # L-BFGS path from RAW random inits is chaotic in that noise: lanes can
    # land in different basins, and the line search can legitimately freeze
    # a pathological lane (ops/lbfgs.py frozen-lane semantics) under one
    # reassociation order and not another (verified: the vectorized and
    # row-serial kernels have IDENTICAL max gradient error vs XLA AD,
    # ~1.2e-4; which lanes wander is not a kernel-quality signal).
    # Production semantics are multi-start: assert the SELECTED minimum
    # agrees tightly and most lanes land close.
    np.testing.assert_allclose(f_fused.min(), f_xla.min(), rtol=0.05)
    close = np.isclose(f_fused, f_xla, rtol=0.15)
    assert close.sum() >= G - 2, (f_fused, f_xla)

    def tree_vg(pt):
        f, gnn, gb = vg(pt["neural"], pt["conditional"], dyn)
        return f, {"neural": gnn, "conditional": gb}

    def tree_loss(pt):
        return population_sse(model, pt["neural"], pt["conditional"][:, None],
                              cohort, solver="rk4", substeps=SUBSTEPS)

    res = jax.vmap(lambda nn_, b_: adam_minimize(
        tree_loss, {"neural": nn_, "conditional": b_}, iters=20, lr=1e-2,
        fun_and_grad=tree_vg).loss_trace)(nn, betas)
    trace = np.asarray(res)
    assert np.isfinite(trace).all()
    assert (trace[:, -1] <= trace[:, 0]).all()


def test_fused_vg_program_is_data_polymorphic(setup):
    """The jitted refinement program must not bake the cohort's DATA into
    the HLO: two same-shape cohorts with different data must lower to
    IDENTICAL modules (otherwise the persistent compile cache misses on
    every new cohort and each seed/cohort repays the full compile)."""
    from conditional_ude_tpu.ops.pallas_grad import fused_population_vg

    cohort, net, model = setup
    rng = np.random.default_rng(99)
    glucose2 = np.asarray(cohort.individuals.glucose) + \
        rng.uniform(0.1, 0.5, cohort.individuals.glucose.shape)
    cpep2 = np.asarray(cohort.cpeptide) + \
        rng.uniform(0.01, 0.1, cohort.cpeptide.shape)
    ages = np.asarray(cohort.individuals.age)
    cohort2 = build_cohort(glucose2, cohort.timepoints, cpep2, ages,
                           np.zeros(cohort.n, bool))

    nn = net.init_batch(jax.random.key(1), G)[0]
    b = jnp.zeros((cohort.n,), jnp.float32)

    texts = []
    for c in (cohort, cohort2):
        vg = fused_population_vg(net, c, substeps=SUBSTEPS, interpret=True)
        lowered = jax.jit(vg).lower(nn, b, cohort_dynamic(c))
        texts.append(lowered.as_text())
    assert texts[0] == texts[1], \
        "cohort data leaked into the lowered refinement program"


def test_packed_lane_layout_matches_restart_lane_layout(setup):
    """The packed (restart × individual)-lane kernel (the refinement-scale
    fast path, full VPU occupancy) and the restart-lane kernel with the
    in-kernel individual loop (the large-grid fallback) are two layouts of
    the same adjoint math — same (f, ∇nn, ∇β) up to f32 reassociation of
    the individual-axis reduction."""
    import conditional_ude_tpu.ops.pallas_grad as pg

    cohort, net, model = setup
    nn = net.init_batch(jax.random.key(5), G)
    betas = jnp.asarray(
        np.random.default_rng(3).uniform(-2, 0, (G, cohort.n)), jnp.float32)

    f_p, gnn_p, gb_p = _kernel(net, cohort, nn, betas)   # packed (G·N small)

    from conditional_ude_tpu.ops.pallas_rk4 import cohort_kinetics
    kin = cohort_kinetics(cohort, with_age=False)
    tp = tuple(float(t) for t in np.asarray(cohort.timepoints))
    f_r, gnn_r, gb_r = pg._population_sse_and_grad_impl(
        net, nn, betas, cohort.individuals.glucose, cohort.cpeptide, kin,
        tp, SUBSTEPS, True)

    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_r), rtol=1e-4)
    _assert_grads_close(gnn_p, gnn_r)
    _assert_grads_close(gb_p, gb_r)
