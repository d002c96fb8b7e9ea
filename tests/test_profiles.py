"""Likelihood profiles: quadratic ground truth, CI thresholds, census."""

import jax.numpy as jnp
import numpy as np

from conditional_ude_tpu.analysis import (
    THRESHOLDS,
    classify_identifiability,
    find_confidence_intervals,
    likelihood_profile,
)


def test_quadratic_profile_ci():
    # NLL(β) = (β - 0.5)²/(2σ²) with σ=0.1 → CI bounds at analytic offsets
    sigma = 0.1

    def loss(b):
        return (b - 0.5) ** 2

    prof = likelihood_profile(loss, -2.0, 3.0, steps=5001, sigma=sigma)
    assert float(prof.minimum) < 1e-4

    for method, delta in THRESHOLDS.items():
        ci = find_confidence_intervals(prof, method)
        half = np.sqrt(2.0 * delta) * sigma
        np.testing.assert_allclose(ci.lower, 0.5 - half, atol=2e-3)
        np.testing.assert_allclose(ci.upper, 0.5 + half, atol=2e-3)


def test_open_interval_hits_edge():
    # minimum at the right edge: upper bound is never crossed → +inf
    def loss(b):
        return (b - 10.0) ** 2

    prof = likelihood_profile(loss, -1.0, 1.0, steps=201, sigma=1.0)
    ci = find_confidence_intervals(prof, "raue95")
    assert np.isinf(ci.upper)
    assert np.isfinite(ci.lower)


def test_classify_identifiability():
    from conditional_ude_tpu.analysis import ConfidenceInterval

    ci = ConfidenceInterval(
        lower=np.array([-1.0, -np.inf, -np.inf]),
        upper=np.array([1.0, 1.0, np.inf]))
    census = classify_identifiability(ci)
    assert list(census) == ["identifiable", "practically unidentifiable",
                            "unidentifiable"]


def test_batched_profile_shape():
    # batched values [N, S] pass through CI extraction per row
    grid = jnp.linspace(-1.0, 1.0, 101)
    vals = jnp.stack([(grid - 0.2) ** 2 * 50, (grid + 0.4) ** 2 * 50])
    from conditional_ude_tpu.analysis import Profile

    prof = Profile(grid=grid, values=vals, minimum=jnp.min(vals, axis=1))
    ci = find_confidence_intervals(prof, "raue95")
    assert ci.lower.shape == (2,)
    assert ci.lower[0] < 0.2 < ci.upper[0]
    assert ci.lower[1] < -0.4 < ci.upper[1]
