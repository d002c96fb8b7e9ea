"""Data ETL invariants against the mounted reference CSVs."""

from pathlib import Path

import numpy as np
import pytest

CSV_DIR = Path("/root/reference/data")

pytestmark = pytest.mark.skipif(not CSV_DIR.exists(),
                                reason="reference data not mounted")


def test_ohashi_etl_invariants():
    from conditional_ude_tpu.data.ohashi import load_ohashi

    train, test = load_ohashi(CSV_DIR / "ohashi_csv")
    # 120 raw → 117 complete subjects, stratified 70/30
    # (00-prepare-data.jl:14-31, 88-101)
    assert len(train.ages) + len(test.ages) == 117
    assert len(train.ages) == 82 and len(test.ages) == 35
    assert train.glucose.shape == (82, 5)
    assert list(train.timepoints) == [0.0, 30.0, 60.0, 90.0, 120.0]
    # units: mmol/L glucose in [2, 30], nmol/L c-peptide in [0.05, 10]
    assert 2 < train.glucose.min() and train.glucose.max() < 30
    assert 0.05 < train.cpeptide.min() and train.cpeptide.max() < 10
    # class proportions preserved by the stratified split (±1 subject)
    for t in ("NGT", "IGT", "T2DM"):
        frac_train = (train.types == t).mean()
        frac_test = (test.types == t).mean()
        assert abs(frac_train - frac_test) < 0.06, t
    # no subject leakage
    assert not set(train.subject_numbers) & set(test.subject_numbers)


def test_fujita_etl_invariants():
    from conditional_ude_tpu.data.fujita import load_fujita

    f = load_fujita(CSV_DIR / "fujita_csv")
    # 20 subjects × 14 timepoints, −10…240 min, all age 29, non-T2DM
    # (00-prepare-data.jl:170-187; 04-symreg-external.jl:44-46)
    assert f.glucose.shape == (20, 14)
    assert f.timepoints[0] == -10.0 and f.timepoints[-1] == 240.0
    assert np.all(f.ages == 29.0)
    assert not f.t2dm.any()
    assert 2 < f.glucose.min() and f.glucose.max() < 20


def test_clamp_insulin_loader():
    from conditional_ude_tpu.data.ohashi import load_clamp_insulin

    tp, insulin, types = load_clamp_insulin(CSV_DIR / "ohashi_csv")
    # 117 retained subjects × 7 clamp timepoints (00-prepare-data.jl:138-143)
    assert insulin.shape == (117, 7)
    assert list(tp) == [0.0, 5.0, 10.0, 15.0, 60.0, 75.0, 90.0]
    assert set(np.unique(types)) == {"NGT", "IGT", "T2DM"}
    assert np.isfinite(insulin).all() and insulin.min() >= 0
    # first-phase insulin burst: NGT mean at 5 min well above baseline
    ngt = insulin[types == "NGT"]
    assert ngt[:, 1].mean() > 2 * ngt[:, 0].mean()


def test_van_cauter_constants():
    import jax.numpy as jnp

    from conditional_ude_tpu.models.cpeptide import van_cauter_parameters

    # closed-form check at age 50 (src/c-peptide-models.jl:30-42)
    k0, k1, k2 = van_cauter_parameters(jnp.asarray(50.0), False)
    ln2 = np.log(2)
    short, frac, long = 4.95, 0.76, 0.14 * 50 + 29.2
    k1_ref = frac * ln2 / long + (1 - frac) * ln2 / short
    np.testing.assert_allclose(float(k1), k1_ref, rtol=1e-6)
    k0_ref = (ln2 / short) * (ln2 / long) / k1_ref
    np.testing.assert_allclose(float(k0), k0_ref, rtol=1e-6)
    np.testing.assert_allclose(float(k2),
                               ln2 / short + ln2 / long - k0_ref - k1_ref,
                               rtol=1e-5)
