"""Generate ground-truth golden fixtures for the reference-parity obligation.

BASELINE.md requires reproducing the published cUDE train/test MSE within 1%
and rtol/atol trajectory parity with the Julia/SciML reference.  Round 2's
parity evidence was self-referential (this framework's RK4 vs its own Tsit5);
this script pins an INDEPENDENT ground truth:

  * the reference's exact cached NN weights
    (``/root/reference/source_data/cude_neural_parameters.jld2``, written by
    ``c-peptide/02-conditional.jl:44-51``),
  * (β, σ) re-estimated once on the full Ohashi train/test cohorts — the
    reference's procedure at ``c-peptide/02-conditional.jl:91-106`` — then
    FROZEN into the fixture,
  * trajectories of the reference RHS (van Cauter kinetics + conditional
    MLP production, ``src/c-peptide-models.jl:7-14,86-94``) integrated by
    **SciPy DOP853 at rtol 1e-10 / atol 1e-13** with a pure-NumPy RHS
    written independently of the JAX code path (a shared RHS bug cannot
    hide in a shared implementation),
  * the per-individual SSEs / per-type MSEs implied by those trajectories.

``tests/test_reference_parity.py`` asserts the framework's default-tolerance
solves reproduce these trajectories and land within 1% on the losses.

Run from the repo root (CPU, ~1 min):
    python scripts/make_golden_parity.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WEIGHTS = Path("/root/reference/source_data/cude_neural_parameters.jld2")
UDE_WEIGHTS = Path(
    "/root/reference/source_data/ude_neural_parameters.jld2")
CSV_DIR = Path("/root/reference/data/ohashi_csv")
OUT = REPO / "tests" / "golden" / "reference_parity_golden.npz"
OUT_UDE = REPO / "tests" / "golden" / "reference_parity_ude_golden.npz"

LN2 = np.log(2.0)


def np_van_cauter(age: float, t2dm: bool):
    """Van Cauter kinetic constants, independent NumPy implementation
    (reference ``src/c-peptide-models.jl:30-42``)."""
    short_hl = 4.52 if t2dm else 4.95
    fraction = 0.78 if t2dm else 0.76
    long_hl = 0.14 * age + 29.2
    k1 = fraction * (LN2 / long_hl) + (1.0 - fraction) * (LN2 / short_hl)
    k0 = (LN2 / short_hl) * (LN2 / long_hl) / k1
    k2 = (LN2 / short_hl) + (LN2 / long_hl) - k0 - k1
    return k0, k1, k2


def np_unflatten(flat: np.ndarray, layer_dims):
    layers, i = [], 0
    for fi, fo in layer_dims:
        w = flat[i:i + fi * fo].reshape(fo, fi)
        i += fi * fo
        b = flat[i:i + fo]
        i += fo
        layers.append((w.astype(np.float64), b.astype(np.float64)))
    return layers


def np_mlp(layers, x):
    h = np.asarray(x, np.float64)
    for li, (w, b) in enumerate(layers):
        h = w @ h + b
        if li < len(layers) - 1:
            h = np.tanh(h)
        else:
            h = np.logaddexp(0.0, h)          # softplus, overflow-safe
    return h[0]


def golden_trajectory(layers, beta, glucose_t, glucose, age, t2dm, c0, tp):
    """One individual's c-peptide trajectory at DOP853 rtol 1e-10."""
    from scipy.integrate import solve_ivp

    k0, k1, k2 = np_van_cauter(float(age), bool(t2dm))
    eb = float(np.exp(beta))
    g0 = float(np.interp(0.0, glucose_t, glucose))
    base = np_mlp(layers, [0.0, eb])

    def rhs(t, u):
        dg = float(np.interp(t, glucose_t, glucose)) - g0
        prod = np_mlp(layers, [dg, eb]) - base
        return [-(k0 + k2) * u[0] + k1 * u[1] + k0 * c0 + prod,
                -k1 * u[1] + k2 * u[0]]

    u0 = [float(c0), (k2 / k1) * float(c0)]
    sol = solve_ivp(rhs, (float(glucose_t[0]), float(tp[-1])), u0,
                    method="DOP853", t_eval=np.asarray(tp, np.float64),
                    rtol=1e-10, atol=1e-13)
    assert sol.success, sol.message
    return sol.y[0]


def golden_trajectory_ude(layers, glucose_t, glucose, age, t2dm, c0, tp):
    """Non-conditional UDE trajectory (production = NN([ΔG]) − NN([0]),
    ``src/c-peptide-models.jl:77-84``) at DOP853 rtol 1e-10."""
    from scipy.integrate import solve_ivp

    k0, k1, k2 = np_van_cauter(float(age), bool(t2dm))
    g0 = float(np.interp(0.0, glucose_t, glucose))
    base = np_mlp(layers, [0.0])

    def rhs(t, u):
        dg = float(np.interp(t, glucose_t, glucose)) - g0
        prod = np_mlp(layers, [dg]) - base
        return [-(k0 + k2) * u[0] + k1 * u[1] + k0 * c0 + prod,
                -k1 * u[1] + k2 * u[0]]

    u0 = [float(c0), (k2 / k1) * float(c0)]
    sol = solve_ivp(rhs, (float(glucose_t[0]), float(tp[-1])), u0,
                    method="DOP853", t_eval=np.asarray(tp, np.float64),
                    rtol=1e-10, atol=1e-13)
    assert sol.success, sol.message
    return sol.y[0]


def make_ude_golden():
    """Golden fixture for the exp01 non-conditional baseline (r03 verdict
    weak #6): the reference's cached UDE weights
    (``ude_neural_parameters.jld2``, read by ``01-non-conditional.jl``;
    a single trained parameter vector, width 6 / depth 2 / 1 input)
    simulated on every Ohashi subject at DOP853 ground truth."""
    import h5py

    from conditional_ude_tpu.data.jld2 import _simplechains_to_flat
    from conditional_ude_tpu.data.ohashi import load_ohashi
    from conditional_ude_tpu.nn import chain

    with h5py.File(UDE_WEIGHTS, "r") as f:
        width = int(f["width"][()])
        depth = int(f["depth"][()])
        raw = np.array(f["parameters"])

    net = chain(width, depth, "tanh", input_dims=1)
    nn = _simplechains_to_flat(raw, net.layer_dims)
    layers = np_unflatten(nn.astype(np.float64), net.layer_dims)
    train, test = load_ohashi(CSV_DIR)

    rows = {}
    for name, split in (("train", train), ("test", test)):
        tp = np.asarray(split.timepoints, np.float64)
        traj = np.stack([
            golden_trajectory_ude(layers, tp, split.glucose[i],
                                  split.ages[i], split.t2dm[i],
                                  split.cpeptide[i, 0], tp)
            for i in range(split.glucose.shape[0])
        ])
        sse = np.sum((traj - split.cpeptide) ** 2, axis=1)
        rows[f"traj_{name}"] = traj.astype(np.float64)
        rows[f"sse_{name}"] = sse
        rows[f"types_{name}"] = np.asarray(split.types, dtype="U8")
        print(f"ude {name}: n={traj.shape[0]} mean per-point MSE "
              f"{(sse / tp.shape[0]).mean():.5f}", file=sys.stderr)

    OUT_UDE.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT_UDE, nn=nn, width=width, depth=depth,
                        timepoints=np.asarray(train.timepoints), **rows)
    meta = {
        "source_weights": str(UDE_WEIGHTS),
        "width": width, "depth": depth,
        "integrator": "scipy.integrate.solve_ivp DOP853 rtol=1e-10 "
                      "atol=1e-13 (float64, independent NumPy RHS)",
        "n_timepoints": int(rows["traj_train"].shape[1]),
        "mse_train": float((rows["sse_train"]
                            / rows["traj_train"].shape[1]).mean()),
        "mse_test": float((rows["sse_test"]
                           / rows["traj_test"].shape[1]).mean()),
    }
    OUT_UDE.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    print(json.dumps(meta))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from conditional_ude_tpu.data.jld2 import load_reference_cude
    from conditional_ude_tpu.data.ohashi import load_ohashi
    from conditional_ude_tpu.fit.train import fit_betas_sigma
    from conditional_ude_tpu.models.cpeptide import CPeptideModel, \
        build_cohort
    from conditional_ude_tpu.nn import chain

    ref = load_reference_cude(WEIGHTS)
    best = ref["best_model_index"]
    nn = np.asarray(ref["parameters"][best])
    betas_fit = ref["betas"][best]
    train, test = load_ohashi(CSV_DIR)

    net = chain(ref["width"], ref["depth"], "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)
    layers = np_unflatten(nn.astype(np.float64), net.layer_dims)

    # (β, σ) re-estimation exactly as c-peptide/02-conditional.jl:91-106,
    # then frozen — the test never re-runs the optimizer
    lb = betas_fit.min() - 0.1 * abs(betas_fit.min())
    ub = betas_fit.max() + 0.1 * abs(betas_fit.max())

    rows = {}
    for name, split in (("train", train), ("test", test)):
        cohort = build_cohort(split.glucose, split.timepoints,
                              split.cpeptide, split.ages, split.t2dm)
        b, s, _ = fit_betas_sigma(model, jnp.asarray(nn), cohort,
                                  initial_beta=-1.0,
                                  bounds=(float(lb), float(ub)),
                                  lbfgs_iters=1000)
        b = np.asarray(b)
        tp = np.asarray(split.timepoints, np.float64)
        traj = np.stack([
            golden_trajectory(layers, b[i], tp, split.glucose[i],
                              split.ages[i], split.t2dm[i],
                              split.cpeptide[i, 0], tp)
            for i in range(len(b))
        ])
        sse = np.sum((traj - split.cpeptide) ** 2, axis=1)
        rows[f"betas_{name}"] = b
        rows[f"sigmas_{name}"] = np.asarray(s)
        rows[f"traj_{name}"] = traj.astype(np.float64)
        rows[f"sse_{name}"] = sse
        rows[f"types_{name}"] = np.asarray(split.types, dtype="U8")
        print(f"{name}: n={len(b)} mean per-point MSE "
              f"{(sse / tp.shape[0]).mean():.5f}", file=sys.stderr)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, nn=nn,
                        timepoints=np.asarray(train.timepoints), **rows)
    meta = {
        "source_weights": str(WEIGHTS),
        "best_model_index": int(best),
        "integrator": "scipy.integrate.solve_ivp DOP853 rtol=1e-10 "
                      "atol=1e-13 (float64, independent NumPy RHS)",
        "beta_bounds": [float(lb), float(ub)],
        "n_timepoints": int(rows["traj_train"].shape[1]),
        "mse_train": float((rows["sse_train"]
                            / rows["traj_train"].shape[1]).mean()),
        "mse_test": float((rows["sse_test"]
                           / rows["traj_test"].shape[1]).mean()),
    }
    OUT.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    print(json.dumps(meta))

    make_ude_golden()


if __name__ == "__main__":
    main()
