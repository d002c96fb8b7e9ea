"""C-peptide model layer: van Cauter params, steady state, scipy parity."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from conditional_ude_tpu.nn import chain
from conditional_ude_tpu.models.cpeptide import (
    CPeptideModel,
    build_cohort,
    build_individual,
    simulate,
    simulate_cohort,
    van_cauter_parameters,
)
from conditional_ude_tpu.fit.losses import population_sse, sse


def _vc_numpy(age, t2dm):
    ln2 = np.log(2.0)
    shl = 4.52 if t2dm else 4.95
    frac = 0.78 if t2dm else 0.76
    lhl = 0.14 * age + 29.2
    k1 = frac * (ln2 / lhl) + (1 - frac) * (ln2 / shl)
    k0 = (ln2 / shl) * (ln2 / lhl) / k1
    k2 = (ln2 / shl) + (ln2 / lhl) - k0 - k1
    return k0, k1, k2


def test_van_cauter_values():
    for age, t2dm in [(30.0, False), (55.0, True), (70.0, False)]:
        k0, k1, k2 = van_cauter_parameters(jnp.asarray(age), t2dm)
        e0, e1, e2 = _vc_numpy(age, t2dm)
        np.testing.assert_allclose([k0, k1, k2], [e0, e1, e2], rtol=1e-5)
        assert k0 > 0 and k1 > 0 and k2 > 0


def test_steady_state_without_production():
    # with zero production the system must stay at u0 = [c0, (k2/k1)c0]
    model = CPeptideModel(kind="analytic", analytic_fn=lambda dg, p: 0.0)
    glucose = np.full(5, 5.0)  # flat glucose → ΔG = 0 anyway
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    ind = build_individual(glucose, tp, 40.0, 1.0, False)
    res = simulate(model, None, ind, tp)
    assert bool(res.success)
    np.testing.assert_allclose(res.ys[:, 0], 1.0, rtol=1e-4)
    np.testing.assert_allclose(res.ys[:, 1], float(ind.u0[1]), rtol=1e-4)


def _scipy_reference(ind, net, nn_params, beta, saveat):
    """Independent scipy integration of the conditional model."""
    k0, k1, k2, c0 = (float(ind.k0), float(ind.k1), float(ind.k2),
                      float(ind.c0))
    glu_t = np.array(ind.glucose_t, dtype=float)
    glu = np.array(ind.glucose, dtype=float)
    npb = np.exp(beta)

    def nn_eval(x):
        h = np.asarray(x, dtype=np.float64)
        layers = net.unflatten(jnp.asarray(nn_params))
        for i, (w, b) in enumerate(layers):
            h = np.array(w, dtype=np.float64) @ h + np.array(b, np.float64)
            h = np.tanh(h) if i < len(layers) - 1 else np.log1p(np.exp(h))
        return h[0]

    def rhs(t, y):
        gt = np.interp(t, glu_t, glu)
        dg = gt - glu[0]
        prod = nn_eval([dg, npb]) - nn_eval([0.0, npb])
        return [-(k0 + k2) * y[0] + k1 * y[1] + k0 * c0 + prod,
                -k1 * y[1] + k2 * y[0]]

    sol = solve_ivp(rhs, (glu_t[0], saveat[-1]), np.array(ind.u0, float),
                    t_eval=saveat, rtol=1e-9, atol=1e-11)
    return sol.y.T


def test_conditional_model_vs_scipy():
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    nn_params = net.init(jax.random.PRNGKey(7)) * 3.0  # non-trivial weights
    beta = -0.5

    glucose = np.array([5.0, 8.5, 10.0, 7.5, 6.0])
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    ind = build_individual(glucose, tp, 48.0, 0.8, False)

    params = {"neural": nn_params, "conditional": jnp.asarray(beta)}
    res = simulate(model, params, ind, tp, rtol=1e-6, atol=1e-9,
                   max_steps=2048)
    expected = _scipy_reference(ind, net, nn_params, beta, tp)
    assert bool(res.success)
    np.testing.assert_allclose(res.ys, expected, rtol=2e-3, atol=1e-4)


def test_cohort_batched_simulation():
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    nn_params = net.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    n = 6
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 5))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 5))
    ages = rng.uniform(30, 70, n)
    t2dm = rng.uniform(size=n) > 0.5
    cohort = build_cohort(glucose, tp, cpeptide, ages, t2dm)

    betas = jnp.linspace(-2.0, 0.0, n)
    res = simulate_cohort(model, nn_params, betas, cohort)
    assert res.ys.shape == (n, 5, 2)
    assert bool(res.success.all())

    # batched result equals per-individual result.  At the default rtol=1e-3
    # the adaptive step sequence may diverge at an accept/reject boundary
    # under different XLA fusion, so compare at tight tolerances where both
    # trajectories are pinned well below the assertion threshold.
    tight = dict(rtol=1e-6, atol=1e-9, max_steps=4096)
    res_t = simulate_cohort(model, nn_params, betas, cohort, **tight)
    ind0 = cohort.individual(0)
    single = simulate(model, {"neural": nn_params, "conditional": betas[0]},
                      ind0, tp, **tight)
    assert bool(res_t.success.all()) and bool(single.success)
    np.testing.assert_allclose(res_t.ys[0], single.ys, rtol=1e-5, atol=1e-7)


def test_population_sse_matches_manual():
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    nn_params = net.init(jax.random.PRNGKey(2))

    rng = np.random.default_rng(1)
    n = 4
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 5))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 5))
    cohort = build_cohort(glucose, tp, cpeptide, rng.uniform(30, 70, n),
                          np.zeros(n, bool))
    betas = jnp.full((n,), -1.0)

    total = population_sse(model, nn_params, betas, cohort)
    manual = np.mean([
        float(sse(model, {"neural": nn_params, "conditional": betas[i]},
                  cohort.individual(i), cohort.timepoints,
                  cohort.cpeptide[i]))
        for i in range(n)
    ])
    np.testing.assert_allclose(total, manual, rtol=1e-5)


def test_production_gradient_wrt_beta():
    # gradient of the loss w.r.t. β must be finite and nonzero
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    nn_params = net.init(jax.random.PRNGKey(3)) * 2.0
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    ind = build_individual(np.array([5.0, 9.0, 11.0, 8.0, 6.0]), tp, 50.0,
                           0.9, False)
    data = jnp.asarray(np.array([0.9, 1.5, 2.2, 2.0, 1.4]), jnp.float32)

    def loss(beta):
        return sse(model, {"neural": nn_params, "conditional": beta}, ind,
                   jnp.asarray(tp, jnp.float32), data)

    g = jax.grad(loss)(jnp.asarray(-1.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
