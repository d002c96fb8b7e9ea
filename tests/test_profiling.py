"""Profiling/debugging helpers: scopes run, checkify wrapper finds NaNs."""

import jax.numpy as jnp
import numpy as np
import pytest

from conditional_ude_tpu.utils.profiling import checked, scope


def test_scope_prints(capsys):
    import sys

    # pass the (capsys-patched) stream explicitly: the default arg bound
    # the real stderr at definition time
    with scope("unit", out=sys.stderr):
        pass
    assert "[unit]" in capsys.readouterr().err


def test_checked_flags_nan_and_passes_clean():
    def f(x):
        return jnp.log(x).sum()

    err, out = checked(f)(jnp.array([1.0, 2.0]))
    err.throw()  # clean input: no error
    assert np.isfinite(float(out))

    err, out = checked(f)(jnp.array([-1.0, 2.0]))  # log(-1) = nan
    with pytest.raises(Exception):
        err.throw()


def test_checked_on_population_loss():
    """The wrapper composes with the real loss path (debug use case)."""
    import jax

    from conditional_ude_tpu.fit.losses import population_sse
    from conditional_ude_tpu.models.cpeptide import (
        CPeptideModel,
        build_cohort,
    )
    from conditional_ude_tpu.nn import chain

    rng = np.random.default_rng(3)
    n = 4
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    cohort = build_cohort(5 + rng.uniform(0, 5, (n, 5)), tp,
                          0.5 + rng.uniform(0, 1.5, (n, 5)),
                          rng.uniform(30, 70, n), np.zeros(n, bool))
    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    nn = net.init(jax.random.key(0))
    betas = jnp.full((n, 1), -1.0, jnp.float32)

    err, loss = checked(
        lambda p: population_sse(model, p, betas, cohort, solver="rk4",
                                 substeps=4))(nn)
    err.throw()
    assert np.isfinite(float(loss))
