"""TPU-native symbolic regression by genetic programming.

Capability parity with the reference's PySR subproject
(``symbolic-regression/symbolic-regression.ipy:13-29``): discover compact
closed-form equations for the learned NN production surface over samples of
(β, ΔG) → production, with the same operator set — binary ``+``/``*`` and
unary ``inv(x) = 1/x`` — and a Pareto front over (complexity, loss).

TPU-first redesign (NOT a PySR port): programs are **fixed-shape complete
binary trees** (depth ``D``, 2^(D+1)−1 nodes) stored as integer op arrays +
per-node constant arrays.  One generation evaluates the whole population on
all data points as a single bottom-up vectorized pass (no recursion, no
ragged shapes), so selection/mutation/crossover and even constant
optimization (the tree evaluation is differentiable in the constants) all
run batched on-chip.  The reference instead runs 8 CPU island processes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# node opcodes
PASS, CONST, VAR0, VAR1, ADD, MUL, INV = range(7)
_N_OPS = 7
_LEAF_OPS = (CONST, VAR0, VAR1)
_UNARY_OPS = (INV,)
_BINARY_OPS = (ADD, MUL)


def n_nodes(depth: int) -> int:
    return 2 ** (depth + 1) - 1


@dataclasses.dataclass(frozen=True)
class SymRegConfig:
    depth: int = 3                  # complete-tree depth (15 nodes)
    population: int = 2048
    generations: int = 60
    tournament: int = 7
    p_mutate: float = 0.6
    p_crossover: float = 0.4
    const_range: tuple[float, float] = (-5.0, 5.0)
    const_opt_steps: int = 30       # Adam steps on constants of survivors
    const_opt_lr: float = 0.1
    elite: int = 32
    parsimony: float = 1e-5         # complexity penalty added to fitness
    # evolution runs in blocks of this many generations; between blocks the
    # hall of fame (best-ever program per complexity) is updated, its
    # members get their constants optimized, and they are re-injected into
    # the population.  Rational/inv structures need tuned constants to
    # SURVIVE selection (a Michaelis-Menten form with a wrong denominator
    # constant loses to a line), so end-of-run-only constant optimization
    # — the round-2 design — never kept them alive long enough to win.
    block_gens: int = 20
    const_opt_top: int = 64         # population members const-opted per block
    fresh_frac: float = 0.15        # fraction of the population replaced by
                                    # fresh random programs each block
                                    # (tournament takeover otherwise
                                    # collapses diversity within ~30 gens)


class SymRegResult(NamedTuple):
    ops: jax.Array       # [P, M] final population opcodes
    consts: jax.Array    # [P, M] constants
    losses: jax.Array    # [P] MSE
    complexity: jax.Array  # [P]


def _level_slices(depth: int) -> list[tuple[int, int]]:
    """(start, end) node-index ranges per level, root = index 0."""
    return [(2**lv - 1, 2**(lv + 1) - 1) for lv in range(depth + 1)]


def evaluate(ops: jax.Array, consts: jax.Array, x: jax.Array,
             depth: int) -> jax.Array:
    """Evaluate programs on data.

    ``ops/consts [..., M]``, ``x[N, 2]`` → values ``[..., N]``.  Bottom-up:
    leaves first, each internal node selects its result from its children.
    Invalid structures (binary op over PASS children) propagate NaN and get
    infinite loss — the evolutionary loop prunes them.
    """
    m = n_nodes(depth)
    n_pts = x.shape[0]
    batch = ops.shape[:-1]
    vals = jnp.zeros(batch + (m, n_pts), x.dtype)

    x0 = x[:, 0]
    x1 = x[:, 1]
    nan = jnp.full((n_pts,), jnp.nan, x.dtype)

    for start, end in reversed(_level_slices(depth)):
        for i in range(start, end):
            op = ops[..., i]
            c = consts[..., i, None]
            if 2 * i + 2 < m:
                left = vals[..., 2 * i + 1, :]
                right = vals[..., 2 * i + 2, :]
            else:
                left = right = jnp.broadcast_to(nan, batch + (n_pts,))
            leaf_const = jnp.broadcast_to(c, batch + (n_pts,))
            val = jnp.select(
                [op[..., None] == CONST, op[..., None] == VAR0,
                 op[..., None] == VAR1, op[..., None] == ADD,
                 op[..., None] == MUL, op[..., None] == INV],
                [leaf_const, jnp.broadcast_to(x0, batch + (n_pts,)),
                 jnp.broadcast_to(x1, batch + (n_pts,)), left + right,
                 left * right, 1.0 / left],
                jnp.zeros(batch + (n_pts,), x.dtype))   # PASS → 0 (unused)
            vals = vals.at[..., i, :].set(val)
    return vals[..., 0, :]


def complexity_of(ops: jax.Array) -> jax.Array:
    """Number of active (non-PASS) nodes — PySR's size measure."""
    return jnp.sum(ops != PASS, axis=-1)


def _subtree_mask(depth: int) -> np.ndarray:
    """[M, M] bool: mask[i, j] = node j is in the subtree rooted at i."""
    m = n_nodes(depth)
    mask = np.zeros((m, m), bool)
    for i in range(m - 1, -1, -1):
        mask[i, i] = True
        for ch in (2 * i + 1, 2 * i + 2):
            if ch < m:
                mask[i] |= mask[ch]
    return mask


def _structure_ok(ops: jax.Array, depth: int) -> jax.Array:
    """Validity: binary nodes need both children active, INV needs left,
    leaves need none, PASS children must be PASS-consistent."""
    m = n_nodes(depth)
    ok = ops[..., 0] != PASS            # root must be active
    for i in range(m):
        op = ops[..., i]
        l_i, r_i = 2 * i + 1, 2 * i + 2
        if l_i < m:
            l_on = ops[..., l_i] != PASS
            r_on = ops[..., r_i] != PASS
        else:
            l_on = jnp.zeros_like(op, bool)
            r_on = jnp.zeros_like(op, bool)
        is_bin = (op == ADD) | (op == MUL)
        is_un = op == INV
        is_leaf = (op == CONST) | (op == VAR0) | (op == VAR1)
        ok = ok & jnp.where(is_bin, l_on & r_on,
                            jnp.where(is_un, l_on & ~r_on,
                                      jnp.where(is_leaf, ~l_on & ~r_on,
                                                ~l_on & ~r_on)))
    return ok


def _random_programs(key: jax.Array, n: int, depth: int,
                     const_range: tuple[float, float]):
    """Grow-style random program batch: each node is a leaf with increasing
    probability by depth; structure repaired to validity."""
    m = n_nodes(depth)
    k_op, k_leaf, k_const, k_kill = jax.random.split(key, 4)
    interior = jax.random.choice(
        k_op, jnp.array([ADD, MUL, INV, CONST, VAR0, VAR1]), (n, m),
        p=jnp.array([0.25, 0.25, 0.1, 0.1, 0.15, 0.15]))
    leaves = jax.random.choice(
        k_leaf, jnp.array([CONST, VAR0, VAR1]), (n, m),
        p=jnp.array([0.34, 0.33, 0.33]))
    # force leaf level to leaf ops
    level = np.zeros(m, np.int32)
    for lv, (s, e) in enumerate(_level_slices(depth)):
        level[s:e] = lv
    is_bottom = jnp.asarray(level == depth)
    ops = jnp.where(is_bottom[None, :], leaves, interior)
    # ramped sizes: per-program leaf-termination probability in [0.15, 0.8]
    # so deep populations mix shallow and deep structures (a uniform kill
    # rate makes deep trees almost all degenerate and the GP collapses to
    # constants)
    k_kill, k_q = jax.random.split(k_kill)
    q = jax.random.uniform(k_q, (n, 1), minval=0.15, maxval=0.8)
    kill = jax.random.uniform(k_kill, (n, m)) < q
    ops = jnp.where(kill & ~is_bottom[None, :], leaves, ops)
    ops = repair(ops, depth)
    lo, hi = const_range
    consts = jax.random.uniform(k_const, (n, m), jnp.float32, lo, hi)
    return ops, consts


def repair(ops: jax.Array, depth: int) -> jax.Array:
    """Make structures valid: deactivate children of leaves/PASS, right
    child of INV; give binary/unary ops missing children (leaf VAR0)."""
    m = n_nodes(depth)
    for i in range(m):
        l_i, r_i = 2 * i + 1, 2 * i + 2
        if l_i >= m:
            # bottom level: demote operators to variables
            op = ops[..., i]
            is_op = (op == ADD) | (op == MUL) | (op == INV)
            ops = ops.at[..., i].set(jnp.where(is_op, VAR1, op))
            continue
        op = ops[..., i]
        is_bin = (op == ADD) | (op == MUL)
        is_un = op == INV
        needs_l = is_bin | is_un
        l = ops[..., l_i]
        r = ops[..., r_i]
        # missing needed children → become VAR1 leaf; unneeded → PASS
        ops = ops.at[..., l_i].set(
            jnp.where(needs_l & (l == PASS), VAR1,
                      jnp.where(~needs_l, PASS, l)))
        ops = ops.at[..., r_i].set(
            jnp.where(is_bin & (r == PASS), VAR0,
                      jnp.where(~is_bin, PASS, r)))
    return ops


def fit_symbolic(
    x: jax.Array,            # [N, 2] inputs (x0=β, x1=ΔG)
    y: jax.Array,            # [N]
    key: jax.Array,
    config: SymRegConfig = SymRegConfig(),
) -> SymRegResult:
    """Evolve a population of equation trees to fit ``y ≈ f(x)``."""
    cfg = config
    depth, pop, m = cfg.depth, cfg.population, n_nodes(cfg.depth)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)

    def loss_of(ops, consts):
        pred = evaluate(ops, consts, x, depth)
        mse = jnp.mean((pred - y[None, :]) ** 2, axis=-1)
        return jnp.where(jnp.isfinite(mse), mse, jnp.inf)

    def opt_consts(ops, consts, steps):
        """A few gradient steps on the constants of each program."""
        import optax

        opt = optax.adam(cfg.const_opt_lr)

        def one(op_row, c_row):
            state = opt.init(c_row)

            def step(carry, _):
                c, s = carry
                g = jax.grad(lambda cc: jnp.mean(
                    (evaluate(op_row, cc, x, depth) - y) ** 2))(c)
                g = jnp.where(jnp.isfinite(g), g, 0.0)
                upd, s = opt.update(g, s, c)
                return (optax.apply_updates(c, upd), s), None

            (c_fin, _), _ = lax.scan(step, (c_row, state), None, length=steps)
            better = (jnp.mean((evaluate(op_row, c_fin, x, depth) - y) ** 2)
                      < jnp.mean((evaluate(op_row, c_row, x, depth) - y) ** 2))
            return jnp.where(better, c_fin, c_row)

        return jax.vmap(one)(ops, consts)

    sub_mask = jnp.asarray(_subtree_mask(depth))

    @jax.jit
    def generation(carry, k):
        ops, consts = carry
        losses = loss_of(ops, consts)
        fitness = losses + cfg.parsimony * complexity_of(ops)

        k_t1, k_t2, k_mut_sel, k_mut_node, k_mut_op, k_mut_c, k_x, k_xnode \
            = jax.random.split(k, 8)

        # tournament selection of two parent sets
        def tournament(kk):
            idx = jax.random.randint(kk, (pop, cfg.tournament), 0, pop)
            f = fitness[idx]
            return idx[jnp.arange(pop), jnp.argmin(f, axis=1)]

        p1 = tournament(k_t1)
        p2 = tournament(k_t2)
        child_ops = ops[p1]
        child_consts = consts[p1]

        # crossover: copy the subtree rooted at a random node from parent 2
        do_x = jax.random.uniform(k_x, (pop,)) < cfg.p_crossover
        x_node = jax.random.randint(k_xnode, (pop,), 0, m)
        x_mask = sub_mask[x_node] & do_x[:, None]
        child_ops = jnp.where(x_mask, ops[p2], child_ops)
        child_consts = jnp.where(x_mask, consts[p2], child_consts)

        # point mutation: random nodes get random ops / jittered constants
        do_m = jax.random.uniform(k_mut_sel, (pop,)) < cfg.p_mutate
        mut_here = (jax.random.uniform(k_mut_node, (pop, m)) < 2.0 / m) \
            & do_m[:, None]
        new_ops = jax.random.choice(
            k_mut_op, jnp.array([ADD, MUL, INV, CONST, VAR0, VAR1]),
            (pop, m), p=jnp.array([0.22, 0.22, 0.12, 0.14, 0.15, 0.15]))
        child_ops = jnp.where(mut_here, new_ops, child_ops)
        child_consts = child_consts + jnp.where(
            mut_here, 0.3 * jax.random.normal(k_mut_c, (pop, m)), 0.0)

        child_ops = repair(child_ops, depth)
        child_losses = loss_of(child_ops, child_consts)

        # elitism: keep the best `elite` of the previous generation
        order = jnp.argsort(fitness)
        elite_idx = order[: cfg.elite]
        child_ops = child_ops.at[: cfg.elite].set(ops[elite_idx])
        child_consts = child_consts.at[: cfg.elite].set(consts[elite_idx])
        child_losses = child_losses.at[: cfg.elite].set(losses[elite_idx])

        return (child_ops, child_consts), jnp.min(child_losses)

    k_init, k_gens, k_final = jax.random.split(key, 3)
    ops, consts = _random_programs(k_init, pop, depth, cfg.const_range)
    jit_loss = jax.jit(loss_of)

    # hall of fame: best-ever (ops, consts, loss) per complexity level —
    # the final population alone loses good intermediate-complexity
    # programs to drift (the round-2 front had 5 rows and topped out early)
    hof: dict[int, tuple[float, np.ndarray, np.ndarray]] = {}

    def hof_update(ops_a, consts_a, losses_a):
        comp = np.asarray(complexity_of(ops_a))
        losses_np = np.asarray(losses_a)
        for c in np.unique(comp):
            sel = np.flatnonzero(comp == c)
            i = sel[np.argmin(losses_np[sel])]
            if np.isfinite(losses_np[i]) and (
                    int(c) not in hof or losses_np[i] < hof[int(c)][0]):
                hof[int(c)] = (float(losses_np[i]),
                               np.asarray(ops_a[i]),
                               np.asarray(consts_a[i]))

    n_blocks = -(-cfg.generations // cfg.block_gens)
    gens_left = cfg.generations
    for blk in range(n_blocks):
        gens = min(cfg.block_gens, gens_left)
        gens_left -= gens
        gen_keys = jax.random.split(jax.random.fold_in(k_gens, blk), gens)
        (ops, consts), _ = lax.scan(generation, (ops, consts), gen_keys)

        # constant optimization on the block's best + the hall of fame
        losses = jit_loss(ops, consts)
        top = jnp.argsort(losses)[: max(cfg.elite, cfg.const_opt_top)]
        consts = consts.at[top].set(
            opt_consts(ops[top], consts[top], cfg.const_opt_steps))
        losses = jit_loss(ops, consts)
        hof_update(ops, consts, losses)

        if hof and blk < n_blocks - 1:
            h_ops = jnp.asarray(np.stack([v[1] for v in hof.values()]))
            h_consts = jnp.asarray(np.stack([v[2] for v in hof.values()]))
            h_consts = opt_consts(h_ops, h_consts, cfg.const_opt_steps)
            h_losses = jit_loss(h_ops, h_consts)
            hof_update(h_ops, h_consts, h_losses)
            # re-inject the hall into the worst population slots: crossover
            # material for the next block without displacing live elites
            worst = jnp.argsort(losses)[-h_ops.shape[0]:]
            ops = ops.at[worst].set(h_ops)
            consts = consts.at[worst].set(h_consts)

        if blk < n_blocks - 1 and cfg.fresh_frac > 0:
            # fresh blood against tournament takeover: random programs into
            # the worst slots just above the HOF re-injections
            n_fresh = int(cfg.fresh_frac * pop)
            if n_fresh:
                f_ops, f_consts = _random_programs(
                    jax.random.fold_in(k_final, blk), n_fresh, depth,
                    cfg.const_range)
                slots = jnp.argsort(jit_loss(ops, consts))[
                    -(n_fresh + len(hof)):-len(hof) or None]
                slots = slots[:n_fresh]
                ops = ops.at[slots].set(f_ops)
                consts = consts.at[slots].set(f_consts)

    # return the population with the hall of fame appended, so the Pareto
    # front reflects best-ever programs, not just end-of-run survivors
    if hof:
        h_ops = jnp.asarray(np.stack([v[1] for v in hof.values()]))
        h_consts = jnp.asarray(np.stack([v[2] for v in hof.values()]))
        ops = jnp.concatenate([ops, h_ops])
        consts = jnp.concatenate([consts, h_consts])
    losses = jit_loss(ops, consts)

    return SymRegResult(ops=ops, consts=consts, losses=losses,
                        complexity=complexity_of(ops))


def to_string(ops: np.ndarray, consts: np.ndarray, node: int = 0) -> str:
    """Render one program as an infix expression string."""
    op = int(ops[node])
    if op == CONST:
        return f"{float(consts[node]):.4g}"
    if op == VAR0:
        return "x0"
    if op == VAR1:
        return "x1"
    if op == ADD:
        return (f"({to_string(ops, consts, 2 * node + 1)} + "
                f"{to_string(ops, consts, 2 * node + 2)})")
    if op == MUL:
        return (f"({to_string(ops, consts, 2 * node + 1)} * "
                f"{to_string(ops, consts, 2 * node + 2)})")
    if op == INV:
        return f"inv({to_string(ops, consts, 2 * node + 1)})"
    return "?"


def pareto_front(result: SymRegResult) -> list[dict]:
    """PySR-style Pareto table: best loss at each complexity level."""
    losses = np.asarray(result.losses)
    comp = np.asarray(result.complexity)
    ops = np.asarray(result.ops)
    consts = np.asarray(result.consts)
    rows = []
    best = np.inf
    for c in sorted(np.unique(comp)):
        sel = np.flatnonzero(comp == c)
        i = sel[np.argmin(losses[sel])]
        if np.isfinite(losses[i]) and losses[i] < best:
            best = losses[i]
            rows.append({"complexity": int(c), "loss": float(losses[i]),
                         "equation": to_string(ops[i], consts[i])})
    return rows
