"""Covariate-model (input_dims=3) fused kernels vs the XLA path.

The reference's covariate model feeds age as a third NN input
(``c-peptide/07-covariate-inclusion.jl:32``); round 2 left it on the slow
XLA path (5x off flagship pace).  These tests pin the generalized kernels —
screening RK4, adaptive Tsit5, and the fused value+gradient adjoint — to the
XLA ``population_sse`` reference in interpret mode, so the covariate
pipeline can run the same fused path as the canonical cUDE.

Shares ONE kernel configuration (3 save points, substeps=2, 8 lanes) for
compile reuse, mirroring tests/test_pallas_grad.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_ude_tpu.fit.losses import population_sse
from conditional_ude_tpu.models.cpeptide import CPeptideModel, build_cohort
from conditional_ude_tpu.nn import chain
from conditional_ude_tpu.ops.pallas_grad import population_sse_and_grad_pallas
from conditional_ude_tpu.ops.pallas_rk4 import population_sse_pallas
from conditional_ude_tpu.ops.pallas_tsit5 import (
    screen_population_tsit5_pallas,
)

pytestmark = pytest.mark.slow

SUBSTEPS = 2
G = 8


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    n = 5
    tp = np.array([0.0, 60.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 3))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 3))
    cohort = build_cohort(glucose, tp, cpeptide, rng.uniform(30, 70, n),
                          rng.uniform(size=n) > 0.5)
    # raw ages (30-70) saturate a Glorot-initialized tanh layer for most
    # inits (the reference feeds raw age too and relies on multi-start
    # screening to find non-degenerate inits, c-peptide-models.jl:96-104);
    # scale the covariate INPUT after the kinetics are baked so the test
    # exercises a live, non-saturated age pathway
    inds = cohort.individuals._replace(age=cohort.individuals.age / 100.0)
    cohort = cohort._replace(individuals=inds)
    net = chain(4, 2, "tanh", input_dims=3)
    model = CPeptideModel(kind="conditional_covariate", net=net)
    nn = net.init_batch(jax.random.key(5), G)
    betas = jnp.asarray(rng.uniform(-2, 0, (G, n)), jnp.float32)
    return cohort, net, model, nn, betas


def test_screen_rk4_matches_xla(setup):
    cohort, net, model, nn, betas = setup
    ref = jax.vmap(lambda nn_, b_: population_sse(
        model, nn_, b_[:, None], cohort, solver="rk4",
        substeps=SUBSTEPS))(nn, betas)
    got = population_sse_pallas(net, nn, betas, cohort, substeps=SUBSTEPS,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3)


def test_screen_tsit5_matches_xla(setup):
    cohort, net, model, nn, betas = setup
    ref = jax.vmap(lambda nn_, b_: population_sse(
        model, nn_, b_[:, None], cohort, solver="tsit5",
        max_steps=128))(nn, betas)
    got = screen_population_tsit5_pallas(net, nn, betas, cohort,
                                         max_steps=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3)


def test_value_and_grad_matches_xla(setup):
    cohort, net, model, nn, betas = setup

    def loss(nn_, b_):
        return population_sse(model, nn_, b_[:, None], cohort,
                              solver="rk4", substeps=SUBSTEPS)

    f_ref, (gnn_ref, gb_ref) = jax.vmap(
        jax.value_and_grad(loss, argnums=(0, 1)))(nn, betas)
    f, gnn, gb = population_sse_and_grad_pallas(
        net, nn, betas, cohort, substeps=SUBSTEPS, interpret=True)

    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), rtol=1e-3)
    for got, ref in ((gnn, gnn_ref), (gb, gb_ref)):
        got, ref = np.asarray(got), np.asarray(ref)
        scale = np.maximum(np.abs(ref).max(axis=1, keepdims=True), 1e-6)
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-4)


def test_age_actually_enters_the_kernel(setup):
    """Two cohorts differing ONLY in age must produce different covariate
    losses (guards against the age row being wired to a dead input)."""
    cohort, net, _model, nn, betas = setup
    glucose = np.asarray(cohort.individuals.glucose)
    cpep = np.asarray(cohort.cpeptide)
    tp = np.asarray(cohort.timepoints)
    t2dm = np.zeros(cohort.n, bool)
    # identical kinetics (k's are baked from the SAME age at build time);
    # only the covariate INPUT differs — so any loss difference can come
    # solely from the age wire into the MLP
    base = build_cohort(glucose, tp, cpep, np.full(cohort.n, 50.0), t2dm)
    c1 = base._replace(individuals=base.individuals._replace(
        age=jnp.full((cohort.n,), 0.3, jnp.float32)))
    c2 = base._replace(individuals=base.individuals._replace(
        age=jnp.full((cohort.n,), 0.7, jnp.float32)))
    l1 = population_sse_pallas(net, nn, betas, c1, substeps=SUBSTEPS,
                               interpret=True)
    l2 = population_sse_pallas(net, nn, betas, c2, substeps=SUBSTEPS,
                               interpret=True)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    # and each still matches its own XLA reference
    model = CPeptideModel(kind="conditional_covariate", net=net)
    for c, l in ((c1, l1), (c2, l2)):
        ref = jax.vmap(lambda nn_, b_: population_sse(
            model, nn_, b_[:, None], c, solver="rk4",
            substeps=SUBSTEPS))(nn, betas)
        np.testing.assert_allclose(np.asarray(l), np.asarray(ref), rtol=1e-3)


def test_kinetics_column_mismatch_rejected(setup):
    """A 2-input net with 5-column kinetics (or vice versa) must raise."""
    from conditional_ude_tpu.ops.pallas_rk4 import cohort_sse_pallas

    cohort, net3, *_ = setup
    net2 = chain(4, 2, "tanh", input_dims=2)
    kin5 = jnp.zeros((4, 5), jnp.float32)
    g = jnp.zeros((4, 3), jnp.float32)
    with pytest.raises(ValueError, match="kinetics"):
        cohort_sse_pallas(net2, jnp.zeros((4, net2.num_params)),
                          jnp.zeros((4,)), g, g, kin5,
                          (0.0, 60.0, 120.0), SUBSTEPS, True)
