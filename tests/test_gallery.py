"""The figure-gallery driver runs end-to-end in smoke mode and maintains
its manifest across partial --sections invocations."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(args, tmp_path):
    return subprocess.run(
        [sys.executable, str(REPO / "experiments" / "exp_figures.py"),
         "--smoke", "--results", str(tmp_path / "results"),
         "--artifacts", str(tmp_path / "artifacts"), *args],
        capture_output=True, text=True, timeout=900)


def test_gallery_smoke_and_manifest_merge(tmp_path):
    # data+external sections need no cached artifacts — they must render
    r = _run(["--sections", "data", "external"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    # smoke mode nests outputs under results/smoke (common.configure_backend)
    res = tmp_path / "results" / "smoke"
    manifest = json.loads((res / "exp_figures_manifest.json").read_text())
    assert "data_overview.png" in manifest["rendered"]
    assert "model_fit_external.png" in manifest["rendered"]
    first_count = manifest["count"]
    for f in manifest["rendered"]:
        assert (res / "figures" / f).stat().st_size > 1000

    # a second partial run must MERGE into the manifest, not replace it
    r = _run(["--sections", "ablation"], tmp_path)  # artifact missing → skip
    assert r.returncode == 0, r.stderr[-2000:]
    manifest2 = json.loads((res / "exp_figures_manifest.json").read_text())
    assert set(manifest["rendered"]) <= set(manifest2["rendered"])
    assert manifest2["count"] >= first_count
