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
