"""Figure helpers render and save without error (smoke)."""

import numpy as np

from conditional_ude_tpu.utils import figures


def test_figures_render(tmp_path, rng):
    types = np.array(["NGT"] * 5 + ["IGT"] * 3 + ["T2DM"] * 4)
    errors = rng.uniform(0.01, 0.5, len(types))
    fig = figures.error_violins(errors, types)
    figures.save(fig, tmp_path / "violins.png")

    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    obs = rng.uniform(0.5, 2.0, (len(types), 5))
    sim = obs + 0.05 * rng.standard_normal(obs.shape)
    fig = figures.model_fit_panels(tp, obs, sim, types, indices=[0, 5, 8])
    figures.save(fig, tmp_path / "fits.png")

    fig = figures.correlation_scatter(rng.uniform(-2, 0, len(types)),
                                      rng.uniform(0, 100, len(types)),
                                      types, rho=-0.64)
    figures.save(fig, tmp_path / "corr.png")

    fig = figures.loss_trace(rng.uniform(0.1, 1, (3, 50)).cumsum(axis=1))
    figures.save(fig, tmp_path / "trace.png")

    for f in ("violins", "fits", "corr", "trace"):
        assert (tmp_path / f"{f}.png").stat().st_size > 1000


def test_gallery_builders_render(tmp_path, rng):
    types = np.array(["NGT"] * 5 + ["IGT"] * 3 + ["T2DM"] * 4)
    tp = np.array([0.0, 30.0, 60.0, 90.0, 120.0])
    obs = rng.uniform(0.5, 2.0, (len(types), 5))
    dense_t = np.linspace(0, 120, 25)
    sims = rng.uniform(0.5, 2.0, (len(types), 25))

    fig = figures.data_overview(tp, obs * 5, obs, types)
    figures.save(fig, tmp_path / "data_overview.png")

    fig = figures.fit_grid(tp, obs, dense_t, sims, types, ncols=4)
    figures.save(fig, tmp_path / "fit_grid.png")

    fig = figures.quantile_fit_band(dense_t, sims, tp, obs)
    figures.save(fig, tmp_path / "band.png")

    dg = np.linspace(0, 8, 40)
    curves = np.outer(np.linspace(0.5, 2, 6), np.tanh(dg / 4))
    fig = figures.dose_response(dg, curves, np.linspace(-2, 0, 6))
    figures.save(fig, tmp_path / "dose.png")

    fig = figures.dose_response_compare(dg, curves[:3], curves[:3] * 1.1,
                                        np.linspace(-2, 0, 3))
    figures.save(fig, tmp_path / "dose_cmp.png")

    fig = figures.beta_distribution(rng.uniform(-2, 0, len(types)), types)
    figures.save(fig, tmp_path / "betadist.png")

    grid = np.linspace(-4, 1, 50)
    profiles = (grid[None, :] + rng.uniform(-1, 1, (5, 1))) ** 2
    fig = figures.likelihood_curves(grid, profiles, 7.16,
                                    types=types[:5])
    figures.save(fig, tmp_path / "profiles.png")

    bc = rng.uniform(-2, 0, (6, len(types)))
    fig = figures.candidate_beta_grid(bc, rng.uniform(0, 100, len(types)),
                                      ncols=3)
    figures.save(fig, tmp_path / "cand.png")

    fig = figures.ablation_curve(np.linspace(0.1, 1, 10),
                                 rng.uniform(0.2, 0.8, 10))
    figures.save(fig, tmp_path / "ablation.png")

    fig = figures.pareto_front([1, 3, 7, 11, 16], [0.06, 0.02, 0.005,
                                                   0.004, 0.0035], chosen=16)
    figures.save(fig, tmp_path / "pareto.png")

    fig = figures.scatter_compare(rng.uniform(-2, 0, 12),
                                  rng.uniform(-2, 0, 12), "MLE", "MAP",
                                  types=types)
    figures.save(fig, tmp_path / "mapmle.png")

    for f in ("data_overview", "fit_grid", "band", "dose", "dose_cmp",
              "betadist", "profiles", "cand", "ablation", "pareto",
              "mapmle"):
        assert (tmp_path / f"{f}.png").stat().st_size > 1000
