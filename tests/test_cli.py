"""CLI front door: experiment resolution, listing, dispatch."""

import io
import json
from contextlib import redirect_stdout
from pathlib import Path

import pytest

from conditional_ude_tpu import cli

REPO = Path(__file__).resolve().parent.parent


def test_find_experiments_dir_from_checkout():
    exp_dir = cli._find_experiments_dir()
    assert exp_dir is not None
    assert (exp_dir / "exp00_prepare_data.py").exists()


def test_resolve_by_number_stem_and_prefix():
    exp_dir = REPO / "experiments"
    assert cli._resolve_experiment(exp_dir, "01").stem == "exp01_non_conditional"
    # '02' is ambiguous (exp02_conditional vs exp02_xl): git-style error
    # naming both candidates; any disambiguating prefix resolves it
    with pytest.raises(SystemExit, match="exp02_conditional.*exp02_xl"):
        cli._resolve_experiment(exp_dir, "02")
    assert cli._resolve_experiment(exp_dir, "02_c").stem == "exp02_conditional"
    assert (cli._resolve_experiment(exp_dir, "exp06a_saem_symreg").stem
            == "exp06a_saem_symreg")
    assert (cli._resolve_experiment(exp_dir, "exp_supp").stem
            == "exp_suppression")
    with pytest.raises(SystemExit):
        cli._resolve_experiment(exp_dir, "no_such_thing")
    # 'exp06' prefix-matches only exp06_saem: exp06a needs 'exp06a'
    assert cli._resolve_experiment(exp_dir, "06").stem == "exp06_saem"


def test_list_prints_every_driver(capsys):
    assert cli.main(["list"]) == 0
    out = capsys.readouterr().out
    for stem in ("exp00_prepare_data", "exp02_conditional", "exp_figures",
                 "exp_suppression"):
        assert stem in out


def test_exp_dispatch_help_exits_clean():
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["exp", "00", "--help"])
    assert rc == 0
    assert "usage" in buf.getvalue().lower()


def test_exp_dispatch_runs_etl(tmp_path):
    rc = cli.main(["exp", "00", "--smoke",
                   "--results", str(tmp_path),
                   "--artifacts", str(tmp_path / "artifacts")])
    assert rc == 0
    # --smoke redirects outputs into a smoke/ subdir (experiments/common.py)
    metrics = json.loads((tmp_path / "smoke" / "exp00_metrics.json").read_text())
    assert metrics["n_subjects"] == 117
    assert (tmp_path / "artifacts" / "smoke" / "ohashi.npz").exists()
