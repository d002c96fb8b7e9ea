"""Adaptive Tsit5 Pallas kernel vs the pure-JAX adaptive path (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_ude_tpu.fit.losses import sse
from conditional_ude_tpu.models.cpeptide import CPeptideModel, build_cohort
from conditional_ude_tpu.nn import chain
from conditional_ude_tpu.ops.pallas_tsit5 import cohort_sse_tsit5_pallas

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    n = 6
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 5))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 5))
    cohort = build_cohort(glucose, tp, cpeptide, rng.uniform(30, 70, n),
                          rng.uniform(size=n) > 0.5)
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    return cohort, net, model


def test_adaptive_kernel_matches_xla_tsit5(setup):
    cohort, net, model = setup
    n = cohort.n
    nn = net.init(jax.random.key(1))
    betas = jnp.asarray(np.random.default_rng(2).uniform(-2, 0, n),
                        jnp.float32)
    inds = cohort.individuals
    kin = jnp.stack([inds.k0, inds.k1, inds.k2, inds.c0], axis=-1)
    tp = tuple(float(t) for t in np.asarray(cohort.timepoints))

    s_pal, ok = cohort_sse_tsit5_pallas(
        net, jnp.broadcast_to(nn[None], (n, nn.shape[0])), betas,
        inds.glucose, cohort.cpeptide, kin, tp, interpret=True)
    assert np.asarray(ok).all()

    ref = np.array([
        float(sse(model, {"neural": nn, "conditional": betas[i]},
                  cohort.individual(i), cohort.timepoints,
                  cohort.cpeptide[i]))
        for i in range(n)
    ])
    # same tableau/controller at rtol=1e-3: agreement at tolerance level
    # (step sequences may diverge at accept/reject boundaries)
    np.testing.assert_allclose(np.asarray(s_pal), ref, rtol=2e-2, atol=1e-3)


def test_adaptive_kernel_flags_divergence(setup):
    cohort, net, model = setup
    n = cohort.n
    # exploding weights force divergence / step-budget exhaustion on at
    # least some lanes; those must come back inf + not-success, finite
    # lanes must stay consistent
    nn = net.init(jax.random.key(3)) * 80.0
    betas = jnp.full((n,), 1.0, jnp.float32)
    inds = cohort.individuals
    kin = jnp.stack([inds.k0, inds.k1, inds.k2, inds.c0], axis=-1)
    tp = tuple(float(t) for t in np.asarray(cohort.timepoints))

    s_pal, ok = cohort_sse_tsit5_pallas(
        net, jnp.broadcast_to(nn[None], (n, nn.shape[0])), betas,
        inds.glucose, cohort.cpeptide, kin, tp, max_steps=64,
        interpret=True)
    s_pal = np.asarray(s_pal)
    ok = np.asarray(ok)
    assert np.all(np.isinf(s_pal[~ok]))
    assert np.all(np.isfinite(s_pal[ok]))
