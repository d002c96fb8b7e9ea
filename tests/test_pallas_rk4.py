"""Fused Pallas RK4 cohort kernel vs the pure-JAX RK4 path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_ude_tpu.fit.losses import population_sse
from conditional_ude_tpu.models.cpeptide import CPeptideModel, build_cohort
from conditional_ude_tpu.nn import chain
from conditional_ude_tpu.ops.pallas_rk4 import (
    population_sse_pallas,
    screen_population_pallas,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    n = 6
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 5))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 5))
    cohort = build_cohort(glucose, tp, cpeptide, rng.uniform(30, 70, n),
                          rng.uniform(size=n) > 0.5)
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    return cohort, net, model


def test_kernel_matches_xla_rk4(setup):
    cohort, net, model = setup
    g = 5
    nn = net.init_batch(jax.random.key(1), g)
    betas = jnp.asarray(
        np.random.default_rng(2).uniform(-2, 0, (g, cohort.n)), jnp.float32)

    ref = jax.vmap(lambda n_, b_: population_sse(
        model, n_, b_[:, None], cohort, solver="rk4", substeps=8))(nn, betas)
    out = screen_population_pallas(net, nn, betas, cohort, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_population_kernel_matches_xla_rk4(setup):
    # the expansion-free variant (lanes = restarts, individuals looped
    # in-kernel over SMEM scalars) must agree with the XLA path too
    cohort, net, model = setup
    g = 5
    nn = net.init_batch(jax.random.key(1), g)
    betas = jnp.asarray(
        np.random.default_rng(2).uniform(-2, 0, (g, cohort.n)), jnp.float32)

    ref = jax.vmap(lambda n_, b_: population_sse(
        model, n_, b_[:, None], cohort, solver="rk4", substeps=8))(nn, betas)
    out = population_sse_pallas(net, nn, betas, cohort, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_population_kernel_padding_lanes(setup):
    cohort, net, model = setup
    g = 3
    nn = net.init_batch(jax.random.key(3), g)
    betas = jnp.full((g, cohort.n), -1.0, jnp.float32)
    out = population_sse_pallas(net, nn, betas, cohort, interpret=True)
    ref = jax.vmap(lambda n_, b_: population_sse(
        model, n_, b_[:, None], cohort, solver="rk4", substeps=8))(nn, betas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
    assert np.isfinite(np.asarray(out)).all()


def test_kernel_padding_lanes(setup):
    # lane count not a multiple of the block: padded lanes must not leak
    cohort, net, model = setup
    g = 3
    nn = net.init_batch(jax.random.key(3), g)
    betas = jnp.full((g, cohort.n), -1.0, jnp.float32)
    out = screen_population_pallas(net, nn, betas, cohort, interpret=True)
    ref = jax.vmap(lambda n_, b_: population_sse(
        model, n_, b_[:, None], cohort, solver="rk4", substeps=8))(nn, betas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
    assert np.isfinite(np.asarray(out)).all()
