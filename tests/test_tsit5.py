"""Integrator correctness: analytic solutions, scipy parity, batching, grads.

Mirrors the reference's implicit contract with OrdinaryDiffEq's default
``solve`` (Tsit5-class accuracy at rtol=1e-3/atol=1e-6, dense saveat output,
failure ⇒ flagged not crashed) — SURVEY.md §4 test strategy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from conditional_ude_tpu.ops import solve_tsit5, solve_rk4
from conditional_ude_tpu.ops.tsit5 import _interp_coeffs, _B


def test_tableau_interpolant_consistency():
    # b_i(0) = 0 and b_i(1) = B_i (5th-order weights)
    at0 = _interp_coeffs(jnp.asarray(0.0))
    at1 = _interp_coeffs(jnp.asarray(1.0))
    # f32 evaluation of the polynomial coefficients: tolerance ~ f32 eps
    np.testing.assert_allclose(np.array(at0), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.array(at1), np.array(_B), atol=2e-6)


def test_linear_decay_exact():
    # y' = -k y with analytic solution
    k = 0.3
    f = lambda t, y, args: -args * y
    saveat = jnp.linspace(0.0, 10.0, 11)
    res = solve_tsit5(f, jnp.array([2.0]), 0.0, 10.0, k, saveat,
                      rtol=1e-6, atol=1e-9)
    assert bool(res.success)
    expected = 2.0 * np.exp(-k * np.array(saveat))
    np.testing.assert_allclose(res.ys[:, 0], expected, rtol=5e-5)


def test_vs_scipy_nonlinear():
    # Van der Pol-ish smooth nonlinear system vs scipy RK45 at tight tol
    def f(t, y, args):
        return jnp.array([y[1], (1 - y[0] ** 2) * y[1] - y[0]])

    y0 = np.array([2.0, 0.0])
    saveat = np.linspace(0.0, 5.0, 21)
    res = solve_tsit5(f, jnp.asarray(y0, jnp.float32), 0.0, 5.0, None,
                      jnp.asarray(saveat, jnp.float32),
                      rtol=1e-5, atol=1e-7, max_steps=2048)
    ref = solve_ivp(lambda t, y: [y[1], (1 - y[0] ** 2) * y[1] - y[0]],
                    (0, 5), y0, t_eval=saveat, rtol=1e-10, atol=1e-12)
    assert bool(res.success)
    np.testing.assert_allclose(res.ys, ref.y.T, rtol=2e-3, atol=2e-4)


def test_default_tolerance_matches_reference_regime():
    # at the reference's default tolerances the relative error stays ~1e-3
    def f(t, y, args):
        return jnp.array([jnp.sin(t) * y[0] - 0.1 * y[0]])

    saveat = np.linspace(0.0, 12.0, 7)
    res = solve_tsit5(f, jnp.array([1.0]), 0.0, 12.0, None,
                      jnp.asarray(saveat, jnp.float32))
    ref = solve_ivp(lambda t, y: [np.sin(t) * y[0] - 0.1 * y[0]], (0, 12),
                    [1.0], t_eval=saveat, rtol=1e-10, atol=1e-12)
    assert bool(res.success)
    np.testing.assert_allclose(res.ys[:, 0], ref.y[0], rtol=5e-3)


def test_vmap_batch():
    f = lambda t, y, k: -k * y
    ks = jnp.linspace(0.1, 1.0, 8)
    saveat = jnp.linspace(0.0, 3.0, 4)
    batched = jax.vmap(lambda k: solve_tsit5(f, jnp.array([1.0]), 0.0, 3.0,
                                             k, saveat))
    res = batched(ks)
    assert res.ys.shape == (8, 4, 1)
    expected = np.exp(-np.array(ks)[:, None] * np.array(saveat)[None, :])
    np.testing.assert_allclose(res.ys[..., 0], expected, rtol=5e-3)
    assert bool(res.success.all())


def test_failure_masking():
    # exploding ODE y' = y^2 with finite-time blowup inside the span
    f = lambda t, y, args: y * y
    saveat = jnp.linspace(0.0, 3.0, 4)
    res = solve_tsit5(f, jnp.array([1.0]), 0.0, 3.0, None, saveat,
                      max_steps=512)
    assert not bool(res.success)
    assert np.isfinite(np.array(res.num_steps))

    # batch: one failing lane must not poison the healthy lane
    batched = jax.vmap(
        lambda y0: solve_tsit5(lambda t, y, a: y * y, y0, 0.0, 3.0, None,
                               saveat, max_steps=512))
    res = batched(jnp.array([[1.0], [-1.0]]))
    assert not bool(res.success[0])
    assert bool(res.success[1])


def test_gradient_through_solve():
    # d/dk of y(T) for y' = -k y is -T y(T)
    f = lambda t, y, k: -k * y
    saveat = jnp.array([2.0])

    def terminal(k):
        return solve_tsit5(f, jnp.array([1.0]), 0.0, 2.0, k, saveat,
                           rtol=1e-6, atol=1e-9).ys[0, 0]

    k = 0.4
    g = jax.grad(terminal)(k)
    expected = -2.0 * np.exp(-k * 2.0)
    np.testing.assert_allclose(g, expected, rtol=1e-3)

    # forward mode too (reference uses ForwardDiff)
    _, tang = jax.jvp(terminal, (k,), (1.0,))
    np.testing.assert_allclose(tang, expected, rtol=1e-3)


def test_saveat_includes_t0():
    f = lambda t, y, args: -y
    saveat = jnp.array([0.0, 1.0])
    res = solve_tsit5(f, jnp.array([3.0]), 0.0, 1.0, None, saveat)
    np.testing.assert_allclose(res.ys[0, 0], 3.0, rtol=1e-6)


def test_rk4_matches_tsit5():
    def f(t, y, args):
        return jnp.array([y[1], -jnp.sin(y[0])])

    saveat = jnp.linspace(0.0, 6.0, 13)
    y0 = jnp.array([1.0, 0.0])
    r1 = solve_rk4(f, y0, None, saveat, substeps=32)
    r2 = solve_tsit5(f, y0, 0.0, 6.0, None, saveat, rtol=1e-7, atol=1e-9,
                     max_steps=4096)
    assert bool(r1.success)
    np.testing.assert_allclose(r1.ys, r2.ys, rtol=1e-4, atol=1e-5)
