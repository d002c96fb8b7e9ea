"""Symbolic (Michaelis-Menten) model: production shape + k recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from conditional_ude_tpu.models.cpeptide import build_cohort, simulate
from conditional_ude_tpu.models.symbolic import (
    beta_to_k,
    fit_k_sigma,
    symbolic_model,
    symbolic_production,
)


def test_production_shape():
    dg = jnp.array([-5.0, 0.0, 10.0, 100.0])
    p = symbolic_production(dg, 20.0)
    assert float(p[0]) == 0.0 and float(p[1]) == 0.0
    np.testing.assert_allclose(p[2], 1.78 * 10 / 30, rtol=1e-6)
    # saturates toward 1.78
    assert 1.4 < float(p[3]) < 1.78
    # gradient finite everywhere, including the gated region
    g = jax.grad(lambda k: jnp.sum(symbolic_production(dg, k)))(20.0)
    assert np.isfinite(float(g))


def test_beta_to_k():
    np.testing.assert_allclose(beta_to_k(jnp.array(0.0)), 21.8, rtol=1e-6)
    np.testing.assert_allclose(beta_to_k(jnp.array(1.0)), 188.8, rtol=1e-6)


def test_discovered_equation_beats_reference_on_committed_surface():
    """Regression lock on the in-repo symreg re-discovery: the committed
    discovered equation must keep beating the reference's published c=16
    rational on the committed production-surface export."""
    import csv
    from pathlib import Path

    from conditional_ude_tpu.models.symbolic import discovered_production

    src = Path(__file__).parent.parent / "artifacts" / "ohashi_production.csv"
    if not src.exists():
        import pytest

        pytest.skip("production surface export not present")
    rows = list(csv.DictReader(src.open()))
    b = np.array([float(r["Beta"]) for r in rows], np.float32)
    dg = np.array([float(r["Glucose"]) for r in rows], np.float32)
    y = np.array([float(r["Production"]) for r in rows], np.float32)

    ours = np.asarray(discovered_production(jnp.asarray(dg), jnp.asarray(b)))
    ref = 1.7802945 * dg / (21.828821 + 166.73781 * b**3 + dg)
    mse_ours = float(np.mean((ours - y) ** 2))
    mse_ref = float(np.mean((ref - y) ** 2))
    assert mse_ours < mse_ref, (mse_ours, mse_ref)
    assert mse_ours < 1e-3, mse_ours     # committed full-set class: 5.4e-4


def test_fit_k_recovers_ground_truth(rng):
    # simulate a small cohort from the symbolic model with known per-subject
    # k, then re-fit (k, sigma) and check recovery
    n = 6
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = np.stack([
        5.0 + np.array([0.0, 4.0, 6.0, 3.0, 1.0]) * (1 + 0.2 * rng.uniform())
        for _ in range(n)
    ])
    ages = rng.uniform(30, 70, n)
    k_true = np.linspace(25.0, 120.0, n).astype(np.float32)

    model = symbolic_model()
    placeholder = np.full((n, 5), 0.9, np.float32)  # c0 = 0.9 everywhere
    cohort0 = build_cohort(glucose, tp, placeholder, ages, np.zeros(n, bool))

    def sim_one(k, ind):
        return simulate(model, {"k": k}, ind, jnp.asarray(tp, jnp.float32)).ys[:, 0]

    ys = jax.vmap(sim_one)(jnp.asarray(k_true), cohort0.individuals)
    cohort = build_cohort(glucose, tp, np.asarray(ys), ages, np.zeros(n, bool))

    ks, sigmas, objs = fit_k_sigma(cohort, lbfgs_iters=300)
    assert np.isfinite(np.asarray(objs)).all()
    # k is weakly identified at mild glucose excursions (production ≈
    # 1.78·ΔG/k is nearly scale-degenerate for large k), so allow 12%
    np.testing.assert_allclose(np.asarray(ks), k_true, rtol=0.12)
    assert np.corrcoef(np.asarray(ks), k_true)[0, 1] > 0.99


def test_fit_b_recovers_ground_truth(rng):
    # same recovery check for the in-repo discovered rational model
    from conditional_ude_tpu.models.symbolic import (
        discovered_model,
        fit_b_sigma,
    )

    n = 6
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = np.stack([
        5.0 + np.array([0.0, 4.0, 6.0, 3.0, 1.0]) * (1 + 0.2 * rng.uniform())
        for _ in range(n)
    ])
    ages = rng.uniform(30, 70, n)
    b_true = np.linspace(0.2, 1.3, n).astype(np.float32)

    model = discovered_model()
    placeholder = np.full((n, 5), 0.9, np.float32)
    cohort0 = build_cohort(glucose, tp, placeholder, ages, np.zeros(n, bool))

    def sim_one(b, ind):
        return simulate(model, {"b": b}, ind,
                        jnp.asarray(tp, jnp.float32)).ys[:, 0]

    ys = jax.vmap(sim_one)(jnp.asarray(b_true), cohort0.individuals)
    cohort = build_cohort(glucose, tp, np.asarray(ys), ages,
                          np.zeros(n, bool))

    bs, sigmas, objs = fit_b_sigma(cohort, lbfgs_iters=300)
    assert np.isfinite(np.asarray(objs)).all()
    np.testing.assert_allclose(np.asarray(bs), b_true, rtol=0.1)
    assert np.corrcoef(np.asarray(bs), b_true)[0, 1] > 0.99
