"""MLP factory: shapes, init distribution, forward math, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_ude_tpu.nn import chain, MLP


def test_param_count_canonical_cude_net():
    # reference cUDE net: chain(4, 2, tanh), inputs [ΔG, β], softplus head
    # (c-peptide/02-conditional.jl:22) → 2·4+4 + 4·4+4 + 4·1+1 = 37 params
    net = chain(4, 2, "tanh", input_dims=2)
    assert net.num_params == 37


def test_forward_matches_manual():
    net = chain([3], "tanh", input_dims=2)
    key = jax.random.PRNGKey(0)
    p = net.init(key)
    (w1, b1), (w2, b2) = net.unflatten(p)
    x = jnp.array([0.5, -1.0])
    manual = np.log1p(np.exp(np.array(w2) @ np.tanh(np.array(w1) @ np.array(x)
                                                    + np.array(b1))
                             + np.array(b2)))
    np.testing.assert_allclose(net.apply(p, x), manual, rtol=3e-4)


def test_softplus_head_positive():
    net = chain(4, 2, "tanh", input_dims=2)
    ps = net.init_batch(jax.random.PRNGKey(1), 16)
    xs = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
    out = jax.vmap(net.apply)(ps, xs)
    assert (np.array(out) > 0).all()


def test_init_distribution_glorot():
    net = chain([64], "tanh", input_dims=64)
    p = net.init(jax.random.PRNGKey(3))
    (w1, b1), _ = net.unflatten(p)
    bound = np.sqrt(6.0 / (64 + 64))
    w = np.array(w1).ravel()
    assert np.abs(w).max() <= bound
    assert np.abs(b1).max() == 0.0
    # uniform(-b, b) variance = b^2/3
    np.testing.assert_allclose(w.var(), bound ** 2 / 3, rtol=0.15)


def test_batched_params_and_inputs():
    net = chain(4, 2, "tanh", input_dims=2)
    ps = net.init_batch(jax.random.PRNGKey(4), 5)
    x = jnp.ones((5, 2))
    out = net.apply(ps, x)
    assert out.shape == (5, 1)


def test_validation_errors():
    with pytest.raises(ValueError):
        MLP(input_dims=2, widths=(), activations=())
    with pytest.raises(ValueError):
        MLP(input_dims=2, widths=(4, 4), activations=("tanh",))
