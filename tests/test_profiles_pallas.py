"""Pallas-kernel profile path vs the standard path (interpret mode),
including uneven grid chunking."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from conditional_ude_tpu.analysis import cohort_beta_profiles
from conditional_ude_tpu.models.cpeptide import CPeptideModel, build_cohort
from conditional_ude_tpu.nn import chain
from conditional_ude_tpu.ops import pallas_rk4

import pytest

pytestmark = pytest.mark.slow


def test_pallas_profiles_match_standard(rng, monkeypatch):
    n = 5
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    glucose = 5.0 + rng.uniform(0, 5, (n, 5))
    cpeptide = 0.5 + rng.uniform(0, 1.5, (n, 5))
    cohort = build_cohort(glucose, tp, cpeptide, rng.uniform(30, 70, n),
                          np.zeros(n, bool))
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    nn = net.init(jax.random.key(0))

    monkeypatch.setattr(
        pallas_rk4, "cohort_sse_pallas",
        functools.partial(pallas_rk4.cohort_sse_pallas, interpret=True))

    # chunk=120 over 300 steps exercises uneven chunk sizes (120/120/60)
    p_pal = cohort_beta_profiles(model, nn, cohort, steps=300, chunk=120,
                                 use_pallas=True)
    p_std = cohort_beta_profiles(model, nn, cohort, steps=300, chunk=120,
                                 use_pallas=False)
    v1, v2 = np.asarray(p_pal.values), np.asarray(p_std.values)
    m = np.isfinite(v2)
    assert m.any()
    np.testing.assert_allclose(v1[m], v2[m], rtol=1e-4, atol=1e-5)
