"""GP symbolic regression: evaluation semantics, repair, simple recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from conditional_ude_tpu.analysis.symreg import (
    ADD,
    CONST,
    INV,
    MUL,
    PASS,
    VAR0,
    VAR1,
    SymRegConfig,
    complexity_of,
    evaluate,
    fit_symbolic,
    n_nodes,
    pareto_front,
    repair,
    to_string,
)


def _program(depth, assignments):
    m = n_nodes(depth)
    ops = np.full((m,), PASS, np.int32)
    consts = np.zeros((m,), np.float32)
    for idx, (op, c) in assignments.items():
        ops[idx] = op
        consts[idx] = c
    return jnp.asarray(ops)[None], jnp.asarray(consts)[None]


def test_evaluate_known_tree():
    # (x0 + 2.0) * inv(x1):  root MUL, left ADD(x0, 2), right INV(x1)
    ops, consts = _program(2, {
        0: (MUL, 0), 1: (ADD, 0), 2: (INV, 0),
        3: (VAR0, 0), 4: (CONST, 2.0), 5: (VAR1, 0),
    })
    x = jnp.array([[1.0, 4.0], [3.0, 2.0]])
    out = evaluate(ops, consts, x, 2)
    np.testing.assert_allclose(out[0], [(1 + 2) / 4, (3 + 2) / 2], rtol=1e-6)
    assert int(complexity_of(ops)[0]) == 6
    s = to_string(np.asarray(ops[0]), np.asarray(consts[0]))
    assert s == "((x0 + 2) * inv(x1))"


def test_repair_produces_valid_programs():
    rng = np.random.default_rng(0)
    m = n_nodes(3)
    ops = jnp.asarray(rng.integers(0, 7, (64, m)), jnp.int32)
    fixed = repair(ops, 3)
    from conditional_ude_tpu.analysis.symreg import _structure_ok

    ok = _structure_ok(fixed, 3)
    # every repaired program with an active root must be structurally valid
    active = np.asarray(fixed[:, 0]) != PASS
    assert np.asarray(ok)[active].all()


def test_recovers_product():
    # y = x0 * x1 — trivially representable; GP must find it near-exactly
    rng = np.random.default_rng(1)
    x = rng.uniform(0.5, 3.0, (64, 2)).astype(np.float32)
    y = x[:, 0] * x[:, 1]
    cfg = SymRegConfig(depth=2, population=256, generations=25,
                       const_opt_steps=10, elite=16)
    res = fit_symbolic(jnp.asarray(x), jnp.asarray(y), jax.random.key(0), cfg)
    assert float(jnp.min(res.losses)) < 1e-3

    front = pareto_front(res)
    assert front, "empty pareto front"
    assert front[-1]["loss"] < 1e-3


def test_div_semantics_complexity_and_rendering():
    # DIV(x1, ADD(x0, 2)) == x1 / (x0 + 2); complexity counts DIV as 2
    # (PySR's mul∘inv encoding) and to_string renders in PySR grammar
    from conditional_ude_tpu.analysis.symreg import DIV

    ops, consts = _program(2, {
        0: (DIV, 0), 1: (VAR1, 0), 2: (ADD, 0),
        5: (VAR0, 0), 6: (CONST, 2.0),
    })
    x = jnp.array([[1.0, 6.0], [2.0, 8.0]])
    out = evaluate(ops, consts, x, 2)
    np.testing.assert_allclose(out[0], [6 / 3, 8 / 4], rtol=1e-6)
    # 5 active nodes + 1 for DIV == PySR's mul,x1,inv,add,x0,const = 6
    assert int(complexity_of(ops)[0]) == 6
    s = to_string(np.asarray(ops[0]), np.asarray(consts[0]))
    assert s == "(x1 * inv((x0 + 2)))"


def test_max_size_kills_oversized_programs():
    # a cap below the needed complexity forces the front to stay under it
    rng = np.random.default_rng(5)
    x = rng.uniform(0.5, 3.0, (64, 2)).astype(np.float32)
    y = x[:, 0] * x[:, 1]
    cfg = SymRegConfig(depth=3, population=256, generations=20,
                       const_opt_steps=5, elite=16, max_size=5)
    res = fit_symbolic(jnp.asarray(x), jnp.asarray(y), jax.random.key(2),
                       cfg)
    front = pareto_front(res)
    assert front and all(r["complexity"] <= 5 for r in front)


def test_template_seeding_biases_rational_roots():
    from conditional_ude_tpu.analysis.symreg import (
        DIV,
        _random_programs,
    )

    ops, _ = _random_programs(jax.random.key(0), 512, 4, (-5.0, 5.0),
                              template_frac=0.5)
    frac_div_root = float(np.mean(np.asarray(ops[:, 0]) == DIV))
    assert frac_div_root > 0.3, frac_div_root
    ops0, _ = _random_programs(jax.random.key(0), 512, 4, (-5.0, 5.0),
                               template_frac=0.0)
    frac0 = float(np.mean(np.asarray(ops0[:, 0]) == DIV))
    assert frac_div_root > frac0 + 0.2


def test_fit_symbolic_is_deterministic():
    # same data + same key ⇒ bit-identical result (the committed front is
    # regenerable): the engine is pure-JAX evolution + deterministic host
    # hall-of-fame bookkeeping
    rng = np.random.default_rng(7)
    x = rng.uniform(0.2, 2.0, (48, 2)).astype(np.float32)
    y = (x[:, 1] / (x[:, 0] + x[:, 1] + 1.0)).astype(np.float32)
    cfg = SymRegConfig(depth=3, population=256, generations=25,
                       const_opt_steps=10, elite=16, max_size=18)
    r1 = fit_symbolic(jnp.asarray(x), jnp.asarray(y), jax.random.key(3), cfg)
    r2 = fit_symbolic(jnp.asarray(x), jnp.asarray(y), jax.random.key(3), cfg)
    np.testing.assert_array_equal(np.asarray(r1.ops), np.asarray(r2.ops))
    np.testing.assert_array_equal(np.asarray(r1.losses),
                                  np.asarray(r2.losses))
    assert pareto_front(r1) == pareto_front(r2)


def test_recovers_michaelis_menten_shape():
    # y = 1.78*x1/(x1 + 25): expressible as x1 * inv(x1 + c) * a — check the
    # GP gets close (loss well under the variance of y)
    rng = np.random.default_rng(2)
    x = np.stack([rng.uniform(0, 1, 128), rng.uniform(0, 50, 128)],
                 axis=1).astype(np.float32)
    y = 1.78 * x[:, 1] / (x[:, 1] + 25.0)
    cfg = SymRegConfig(depth=3, population=512, generations=60,
                       const_opt_steps=25, elite=24)
    res = fit_symbolic(jnp.asarray(x), jnp.asarray(y), jax.random.key(3), cfg)
    best = float(jnp.min(res.losses))
    assert best < 0.3 * float(np.var(y)), best
