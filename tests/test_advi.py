"""Mean-field ADVI: conjugate-Gaussian exactness + cUDE posterior recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from conditional_ude_tpu.fit.advi import advi, advi_betas, advi_joint
from conditional_ude_tpu.models.cpeptide import (
    CPeptideModel,
    build_cohort,
    simulate_cohort,
)
from conditional_ude_tpu.nn import chain


def test_advi_matches_analytic_gaussian_posterior():
    """For a Gaussian log-joint the optimal mean-field q IS the posterior:
    the ELBO gap is zero at μ=m, σ_q=s."""
    m = jnp.array([1.5, -0.7, 3.0])
    s = jnp.array([0.5, 1.2, 0.3])

    def log_joint(z):
        return -0.5 * jnp.sum(((z - m) / s) ** 2)

    res = advi(log_joint, jnp.zeros(3), jax.random.key(0),
               steps=2000, n_samples=16, lr=5e-2)
    np.testing.assert_allclose(np.asarray(res.mean), np.asarray(m),
                               atol=0.1)
    np.testing.assert_allclose(np.exp(np.asarray(res.log_std)),
                               np.asarray(s), rtol=0.25)
    # ELBO at the optimum of a Gaussian joint = entropy-constant + 0:
    # just require the trace improved and is finite
    elbos = np.asarray(res.elbo_trace)
    assert np.isfinite(elbos[-1])
    assert elbos[-100:].mean() > elbos[:100].mean()


def _synthetic_cohort(rng, n=6):
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    nn_true = net.init(jax.random.key(42)) * 1.5
    betas_true = np.linspace(-1.8, -0.2, n).astype(np.float32)
    glucose = 5.0 + np.abs(rng.uniform(0, 5, (n, 5)))
    ages = rng.uniform(30, 70, n)
    placeholder = np.full((n, 5), 0.8, np.float32)
    c0 = build_cohort(glucose, tp, placeholder, ages, np.zeros(n, bool))
    res = simulate_cohort(model, nn_true, jnp.asarray(betas_true)[:, None],
                          c0)
    data = np.asarray(res.ys[:, :, 0])
    noisy = data + 0.02 * rng.standard_normal(data.shape)
    cohort = build_cohort(glucose, tp, noisy, ages, np.zeros(n, bool))
    return model, net, cohort, nn_true, betas_true


def test_advi_betas_recovers_conditionals(rng):
    model, net, cohort, nn_true, betas_true = _synthetic_cohort(rng)
    post = advi_betas(model, nn_true, cohort, jax.random.key(1),
                      initial_beta=-1.0, steps=1500, n_samples=8, lr=5e-2,
                      solver="rk4", substeps=4)
    b = np.asarray(post.beta_mean)
    np.testing.assert_allclose(b, betas_true, atol=0.15)
    assert np.all(np.asarray(post.beta_std) > 0)
    assert np.all(np.isfinite(np.asarray(post.elbo_trace)[:, -1]))
    # posterior uncertainty should be small once the data pin β
    assert np.median(np.asarray(post.beta_std)) < 0.5


def test_advi_joint_runs_and_improves(rng):
    model, net, cohort, nn_true, betas_true = _synthetic_cohort(rng, n=4)
    post = advi_joint(model, cohort, nn_true, jax.random.key(2),
                      init_betas=jnp.full((4,), -1.0),
                      steps=300, n_samples=4, lr=1e-2,
                      solver="rk4", substeps=4)
    elbos = np.asarray(post.elbo_trace)
    assert np.isfinite(elbos[-1])
    assert elbos[-50:].mean() > elbos[:50].mean()
    assert post.nn_mean.shape == nn_true.shape
    assert post.beta_mean.shape == (4,)
