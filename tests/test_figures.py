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
