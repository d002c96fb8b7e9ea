"""End-to-end synthetic-recovery CI test (the reference's main validation
construct, SURVEY.md §4): generate data from the known suppression ODE,
jointly fit NN + per-individual θ, check θ̂ ranks the ground-truth p4."""

import jax
import jax.numpy as jnp
import numpy as np

from conditional_ude_tpu.models.suppression import (
    SuppressionFitConfig,
    fit_suppression,
    generate_data,
    suppression_net,
    validate_suppression,
)
from conditional_ude_tpu.utils.stats import spearman

import pytest

pytestmark = pytest.mark.slow


def test_theta_recovery_end_to_end():
    rng = np.random.default_rng(27052023)
    tp = np.linspace(0.0, 30.0, 8)
    group_means = [0.5, 2.5, 5.0, 7.5, 10.0, 12.5]
    data, gt = generate_data(group_means, [2] * 6, tp,
                             noise_multiplicative=0.05, rng=rng)

    net = suppression_net(depth=5, width=3)
    cfg = SuppressionFitConfig(initial_space=64, select_best_n=3,
                               adam_iters=60, lbfgs_iters=60,
                               screen_chunk=64)
    fit = fit_suppression(net, data, tp, jax.random.key(0), lam=0.01,
                          config=cfg)

    # θ̂ vs ground-truth p4 rank correlation; the NN may learn an inverted
    # monotone encoding, so magnitude is the recovery measure
    rhos = [abs(spearman(gt, fit.thetas[r])) for r in range(3)]
    assert max(rhos) > 0.6, rhos

    # frozen-NN re-fit on a fresh validation population recovers too
    data_v, gt_v = generate_data(group_means, [2] * 6, tp,
                                 noise_multiplicative=0.05, rng=rng)
    best = int(np.argmax(rhos))
    theta_inits = jnp.asarray(rng.uniform(size=(32, data_v.shape[0])),
                              jnp.float32)
    theta_v, obj = validate_suppression(net, fit.nn_params[best], data_v,
                                        tp, theta_inits, 60)
    assert np.isfinite(float(obj))
    assert abs(spearman(gt_v, theta_v)) > 0.5


def test_joint_sweep_matches_per_lambda_fits():
    """fit_suppression_sweep (one batched program over the λ×restart grid)
    must reproduce what per-λ fit_suppression runs compute with the same
    shared key — the λ axis is a batch axis, not a loop."""
    from conditional_ude_tpu.models.suppression import fit_suppression_sweep

    rng = np.random.default_rng(3)
    tp = np.linspace(0.0, 30.0, 8)
    data, _ = generate_data([0.5, 5.0, 12.5], [2] * 3, tp,
                            noise_multiplicative=0.05, rng=rng)

    net = suppression_net(depth=5, width=3)
    cfg = SuppressionFitConfig(initial_space=48, select_best_n=2,
                               adam_iters=40, lbfgs_iters=40,
                               screen_chunk=48)
    lambdas = [0.0, 0.01, 0.1]
    key = jax.random.key(11)

    sweep = fit_suppression_sweep(net, data, tp, key, lambdas, cfg)
    assert sweep.nn_params.shape[:2] == (3, 2)

    for li, lam in enumerate(lambdas):
        single = fit_suppression(net, data, tp, key, lam=lam, config=cfg)
        np.testing.assert_allclose(np.asarray(sweep.objectives[li]),
                                   np.asarray(single.objectives),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(sweep.thetas[li]),
                                   np.asarray(single.thetas),
                                   rtol=5e-2, atol=5e-2)


def test_validate_suppression_exact_budget_on_nondivisible_chunk():
    """A dispatch chunk that does not divide ``lbfgs_iters`` must still run
    EXACTLY the requested number of iterations: the last dispatch is sized
    to the remaining budget (a fixed-size tail would overrun and change
    the optimum), so chunked and single-dispatch runs agree bit-for-bit."""
    rng = np.random.default_rng(7)
    tp = np.linspace(0.0, 30.0, 6)
    data, _ = generate_data([0.5, 5.0], [2, 2], tp,
                            noise_multiplicative=0.05, rng=rng)
    net = suppression_net(depth=3, width=3)
    nn = net.init(jax.random.key(0))
    theta_inits = jnp.asarray(rng.uniform(size=(8, data.shape[0])),
                              jnp.float32)

    theta_a, obj_a = validate_suppression(net, nn, data, tp, theta_inits,
                                          lbfgs_iters=5, chunk=2)
    theta_b, obj_b = validate_suppression(net, nn, data, tp, theta_inits,
                                          lbfgs_iters=5, chunk=500)
    np.testing.assert_array_equal(np.asarray(theta_a), np.asarray(theta_b))
    np.testing.assert_array_equal(np.asarray(obj_a), np.asarray(obj_b))
