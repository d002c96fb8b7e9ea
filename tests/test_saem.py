"""SAEM engine: analytic recovery on a linear-Gaussian model + cUDE smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from conditional_ude_tpu.fit.saem import (
    SAEMConfig,
    individual_maps,
    individual_mles,
    posterior_chains,
    run_saem,
    saem_cude,
)


def _linear_gaussian_setup(rng, n=24, t=6, theta_true=1.5, omega_true=0.6,
                           sigma_true=0.3):
    """y_ij ~ N(theta + r_i, sigma), r_i ~ N(0, omega): closed-form MLEs."""
    r_true = omega_true * rng.standard_normal(n)
    data = (theta_true + r_true[:, None]
            + sigma_true * rng.standard_normal((n, t))).astype(np.float32)
    individuals = jnp.zeros((n,), jnp.float32)  # unused placeholder pytree

    def loglik(theta, sigma, r_i, ind, d):
        resid = d - (theta + r_i)
        return (-(d.shape[0] / 2.0) * jnp.log(sigma**2)
                - jnp.sum(resid**2) / (2.0 * sigma**2))

    return loglik, individuals, jnp.asarray(data), r_true


def test_saem_linear_gaussian_recovery(rng):
    loglik, inds, data, r_true = _linear_gaussian_setup(rng)
    cfg = SAEMConfig(iterations=120, burnin=40, n_mcmc_steps=5,
                     pop_update_iters=5, pop_adam_lr=5e-2)
    res = run_saem(loglik, jnp.asarray(0.0), inds, data,
                   jax.random.key(0), cfg)

    # fixed effect + per-individual random effects recovered
    assert abs(float(res.theta) + float(res.eta) - 1.5) < 0.25
    fitted = np.asarray(res.random_effects) + float(res.eta)
    rho = np.corrcoef(fitted, r_true)[0, 1]
    assert rho > 0.8, rho
    # sigma estimated near truth
    assert 0.15 < float(abs(res.sigma)) < 0.6
    # diagnostics populated
    assert res.nll_trace.shape == (120,)
    assert np.isfinite(res.nll_trace[-1])
    assert 0.0 <= float(res.acceptance_trace[-1]) <= 1.0


def test_saem_post_hoc_estimators(rng):
    loglik, inds, data, r_true = _linear_gaussian_setup(rng)
    theta = jnp.asarray(1.5)
    sigma = jnp.asarray(0.3)
    init = jnp.zeros(data.shape[0])

    maps = individual_maps(loglik, theta, sigma, inds, data, init,
                           eta=jnp.asarray(0.0), omega=jnp.asarray(0.6))
    mles = individual_mles(loglik, theta, sigma, inds, data, init)
    assert np.corrcoef(np.asarray(maps), r_true)[0, 1] > 0.9
    assert np.corrcoef(np.asarray(mles), r_true)[0, 1] > 0.9
    # MAP shrinks toward the prior mean relative to MLE
    assert np.mean(np.abs(np.asarray(maps))) <= np.mean(
        np.abs(np.asarray(mles))) + 1e-6

    chains, acc = posterior_chains(loglik, theta, sigma, inds, data,
                                   jax.random.key(1), init,
                                   eta=jnp.asarray(0.0),
                                   omega=jnp.asarray(0.6), n_steps=400)
    assert chains.shape == (data.shape[0], 400)
    post_mean = np.asarray(chains[:, 200:]).mean(axis=1)
    assert np.corrcoef(post_mean, r_true)[0, 1] > 0.8
    assert np.all(np.asarray(acc) > 0.01)


def test_posterior_chains_mix_against_wide_prior(rng):
    """Round-1 regression: a fixed proposal std of 0.1 against a wide prior
    (Ω ≈ 9) left the 3000-step chains essentially unmixed
    (posterior-mean-vs-MAP correlation 0.04).  The adaptive proposal must
    reach a sane acceptance band and a posterior mean that tracks the MAP."""
    loglik, inds, data, r_true = _linear_gaussian_setup(rng, n=16)
    theta = jnp.asarray(1.5)
    sigma = jnp.asarray(0.3)
    omega = jnp.asarray(9.0)     # deliberately much wider than the posterior
    init = jnp.zeros(data.shape[0])

    maps = individual_maps(loglik, theta, sigma, inds, data, init,
                           eta=jnp.asarray(0.0), omega=omega)
    n_mh = 1500
    chains, acc = posterior_chains(loglik, theta, sigma, inds, data,
                                   jax.random.key(9), init,
                                   eta=jnp.asarray(0.0), omega=omega,
                                   n_steps=n_mh)
    acc = np.asarray(acc)
    assert np.all(acc > 0.10) and np.all(acc < 0.65), acc
    post_mean = np.asarray(chains[:, n_mh // 2:]).mean(axis=1)
    rho = np.corrcoef(post_mean, np.asarray(maps))[0, 1]
    assert rho > 0.8, rho
    # split-R̂ over the kept segment of each chain stays near 1
    kept = np.asarray(chains[:, n_mh // 2:])
    a, b = np.split(kept, 2, axis=1)
    w = 0.5 * (a.var(axis=1, ddof=1) + b.var(axis=1, ddof=1))
    m = kept.shape[1] // 2
    bvar = m * (a.mean(axis=1) - b.mean(axis=1)) ** 2 / 2.0
    rhat = np.sqrt((w * (m - 1) / m + bvar / m + 1e-12) / (w + 1e-12))
    assert np.all(rhat < 1.2), rhat


def test_posterior_chains_match_closed_form_under_both_omega_modes(rng):
    """r03 verdict weak #4: exp06's posterior-vs-MAP correlation is 0.9999
    in quirk-Ω mode but 0.46 in the dimensionally-consistent mode — pin
    WHICH side mis-scales, if any.  On a linear-Gaussian model the posterior
    of r_i is N(m_i, v) in closed form; the chains must reproduce it at
    BOTH the quirk-converged prior scale (Ω≈0.055, exp06_metrics.json) and
    the consistent-converged scale (Ω≈0.69).  Neither mode mis-scales: the
    exp06 cliff is the *statistics* of prior width — a 12× tighter prior
    pins posterior mean to the MAP (trivially high correlation), while the
    consistent prior frees weakly-identified subjects so mean and mode
    separate — not a chain or MAP bug."""
    loglik, inds, data, r_true = _linear_gaussian_setup(rng, n=16)
    theta = jnp.asarray(1.5)
    sigma = jnp.asarray(0.3)
    eta = jnp.asarray(0.0)
    t = data.shape[1]
    ybar = np.asarray(data).mean(axis=1) - 1.5

    for omega_val in (0.055, 0.69):     # quirk-mode vs consistent-mode scale
        omega = jnp.asarray(omega_val)
        prec = t / 0.3**2 + 1.0 / omega_val**2
        post_mean_cf = (t * ybar / 0.3**2) / prec          # eta = 0
        post_std_cf = 1.0 / np.sqrt(prec)

        n_mh = 4000
        chains, _ = posterior_chains(loglik, theta, sigma, inds, data,
                                     jax.random.key(11),
                                     jnp.zeros(data.shape[0]),
                                     eta=eta, omega=omega, n_steps=n_mh)
        kept = np.asarray(chains[:, n_mh // 2:])
        # MC error of the mean ~ post_std/sqrt(ESS); bound loosely
        np.testing.assert_allclose(kept.mean(axis=1), post_mean_cf,
                                   atol=4.0 * post_std_cf / np.sqrt(50))
        np.testing.assert_allclose(kept.std(axis=1), post_std_cf,
                                   rtol=0.35)

        # the Gaussian MAP coincides with the closed-form posterior mean
        maps = individual_maps(loglik, theta, sigma, inds, data,
                               jnp.zeros(data.shape[0]), eta=eta,
                               omega=omega)
        np.testing.assert_allclose(np.asarray(maps), post_mean_cf,
                                   atol=5e-3)


def test_saem_cude_smoke(rng):
    from conditional_ude_tpu.models.cpeptide import CPeptideModel, build_cohort
    from conditional_ude_tpu.nn import chain

    n = 4
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 5))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 5))
    cohort = build_cohort(glucose, tp, cpeptide, rng.uniform(30, 70, n),
                          np.zeros(n, bool))
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    nn0 = net.init(jax.random.key(2))

    cfg = SAEMConfig(iterations=4, burnin=2, n_mcmc_steps=2,
                     pop_update_iters=2)
    res = saem_cude(model, cohort, nn0, jax.random.key(3), cfg)
    assert res.random_effects.shape == (n,)
    assert np.isfinite(np.asarray(res.nll_trace)).all()
    assert np.isfinite(np.asarray(res.theta)).all()


def test_saem_symbolic_smoke(rng):
    from conditional_ude_tpu.fit.saem import saem_symbolic
    from conditional_ude_tpu.models.cpeptide import build_cohort

    n = 4
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 5))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 5))
    cohort = build_cohort(glucose, tp, cpeptide, rng.uniform(30, 70, n),
                          np.zeros(n, bool))

    cfg = SAEMConfig(iterations=4, burnin=2, n_mcmc_steps=2,
                     pop_update_iters=2, pop_update_lbfgs=True,
                     update_prior_mean=False)
    res = saem_symbolic(cohort, 75.0, jax.random.key(4), cfg)
    assert res.random_effects.shape == (n,)
    assert np.isfinite(float(res.theta))
    assert float(res.theta) > 0


def test_saem_discovered_smoke(rng):
    from conditional_ude_tpu.fit.saem import saem_discovered
    from conditional_ude_tpu.models.cpeptide import build_cohort

    n = 4
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 5))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 5))
    cohort = build_cohort(glucose, tp, cpeptide, rng.uniform(30, 70, n),
                          np.zeros(n, bool))

    cfg = SAEMConfig(iterations=4, burnin=2, n_mcmc_steps=2,
                     pop_update_iters=2, pop_update_lbfgs=True,
                     update_prior_mean=False)
    res = saem_discovered(cohort, 0.43, jax.random.key(5), cfg)
    assert res.random_effects.shape == (n,)
    assert np.isfinite(float(res.theta))
    assert float(res.theta) > 0


def test_consistent_omega_settles_at_population_std(rng):
    # reference-parity mode blends var(rand) into an Ω used as a *std*
    # (src/saem.jl:70,91 vs :204), which is bistable (collapse or blow-up);
    # omega_as_variance=True updates Ω² ← (1-lr)·Ω² + lr·var(rand) so Ω
    # converges to the true random-effect std on the linear-Gaussian model
    loglik, inds, data, r_true = _linear_gaussian_setup(rng, omega_true=0.6)
    cfg = SAEMConfig(iterations=120, burnin=40, n_mcmc_steps=5,
                     pop_update_iters=5, pop_adam_lr=5e-2,
                     omega_as_variance=True)
    res = run_saem(loglik, jnp.asarray(0.0), inds, data,
                   jax.random.key(0), cfg)
    assert 0.3 < float(res.omega) < 1.0, float(res.omega)
    fitted = np.asarray(res.random_effects) + float(res.eta)
    assert np.corrcoef(fitted, r_true)[0, 1] > 0.8


def test_quirk_omega_collapse_pins_proposal_std_at_floor(rng):
    """r04 verdict weak #5: exp06's quirk-mode final acceptance (0.167)
    never reaches its 0.25 target — pin that this is the Ω collapse, not a
    sampler bug.  In reference-parity mode the Ω update blends var(rand)
    into a quantity used as a *standard deviation* (src/saem.jl:204 vs
    :70,91), which collapses Ω toward 0; the vanishing prior then rejects
    essentially every move, acceptance stalls below target, and the
    adaptation (fit/saem.py proposal-std update) drives the proposal std
    monotonically down until it pins at its configured floor
    (``proposal_bounds[0]``).  The consistent-Ω mode on identical data
    behaves: Ω settles near the true std, acceptance reaches the target
    band, and the proposal std floats free of the floor."""
    loglik, inds, data, _ = _linear_gaussian_setup(rng, omega_true=0.6)
    floor = 0.05
    kw = dict(iterations=400, burnin=80, n_mcmc_steps=3,
              pop_update_iters=5, pop_adam_lr=5e-2, alpha=0.5,
              proposal_bounds=(floor, 1.0))

    quirk = run_saem(loglik, jnp.asarray(0.0), inds, data,
                     jax.random.key(0),
                     SAEMConfig(**kw, omega_as_variance=False))
    consistent = run_saem(loglik, jnp.asarray(0.0), inds, data,
                          jax.random.key(0),
                          SAEMConfig(**kw, omega_as_variance=True))

    # quirk mode: Ω collapses, acceptance stalls below target, proposal std
    # sits exactly at its configured floor
    assert float(quirk.omega) < 0.01, float(quirk.omega)
    assert float(quirk.acceptance_trace[-1]) < 0.25
    assert abs(float(quirk.proposal_std_trace[-1]) - floor) < 1e-6
    # consistent mode on the same data: none of the three pathologies
    assert 0.3 < float(consistent.omega) < 1.0
    assert float(consistent.acceptance_trace[-1]) > 0.2
    assert float(consistent.proposal_std_trace[-1]) > 2 * floor
