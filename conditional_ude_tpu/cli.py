"""Unified command-line entry point (`cude-tpu` / `python -m conditional_ude_tpu`).

The reference has no CLI — each Julia script is run by path from the repo
root (SURVEY.md §1).  This module gives the framework a single front door:

    cude-tpu info                 # backend / device / version report
    cude-tpu list                 # enumerate available experiment drivers
    cude-tpu exp 01 --smoke       # run experiments/exp01_*.py by number/name
    cude-tpu exp 02_c --smoke     # any unique prefix works ('02' alone is
                                  # ambiguous: exp02_conditional vs exp02_xl)
    cude-tpu bench                # run the headline benchmark (bench.py)

Experiment drivers live in ``experiments/`` next to the package in a repo
checkout; ``_find_experiments_dir`` also honours ``CUDE_TPU_EXPERIMENTS`` so
an installed package can point at a scripts directory elsewhere.
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys
from pathlib import Path


def _candidate_roots():
    env = os.environ.get("CUDE_TPU_EXPERIMENTS")
    if env:
        yield Path(env)
    yield Path.cwd() / "experiments"
    # repo checkout: package dir sits next to experiments/
    yield Path(__file__).resolve().parent.parent / "experiments"


def _find_experiments_dir() -> Path | None:
    for root in _candidate_roots():
        if root.is_dir() and any(root.glob("exp*.py")):
            return root
    return None


def _list_experiments(exp_dir: Path) -> list[Path]:
    return sorted(p for p in exp_dir.glob("exp*.py") if p.name != "common.py")


def _resolve_experiment(exp_dir: Path, name: str) -> Path:
    """Match by exact stem, unique prefix, or bare number ('02' → exp02_*)."""
    scripts = _list_experiments(exp_dir)
    stems = {p.stem: p for p in scripts}
    if name in stems:
        return stems[name]
    for prefix in (f"exp{name}_", f"exp{name}", name):
        hits = [p for p in scripts if p.stem.startswith(prefix)]
        if len(hits) == 1:
            return hits[0]
        if len(hits) > 1:
            raise SystemExit(
                f"ambiguous experiment {name!r}: "
                + ", ".join(p.stem for p in hits))
    raise SystemExit(
        f"unknown experiment {name!r}; available: "
        + ", ".join(p.stem for p in scripts))


def _cmd_info() -> int:
    from importlib.metadata import PackageNotFoundError, version

    try:
        pkg_version = version("conditional-ude-tpu")
    except PackageNotFoundError:
        pkg_version = "0.2.0 (uninstalled checkout)"
    print(f"conditional_ude_tpu {pkg_version}")
    import jax

    print(f"jax {jax.__version__}, backend={jax.default_backend()}, "
          f"devices={len(jax.devices())}")
    for d in jax.devices():
        print(f"  {d}")
    exp_dir = _find_experiments_dir()
    print(f"experiments dir: {exp_dir or '(not found)'}")
    return 0


def _cmd_list() -> int:
    exp_dir = _find_experiments_dir()
    if exp_dir is None:
        print("no experiments directory found "
              "(set CUDE_TPU_EXPERIMENTS or run from a repo checkout)")
        return 1
    for p in _list_experiments(exp_dir):
        doc = ""
        try:
            first = p.read_text().lstrip()
            if first.startswith(('"""', "'''")):
                doc = first[3:].splitlines()[0].strip()
        except OSError:
            pass
        print(f"{p.stem:28s} {doc}")
    return 0


def _run_script(path: Path, argv: list[str]) -> int:
    """Run a driver script in-process with its repo root importable."""
    repo_root = str(path.resolve().parent.parent)
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    old_argv = sys.argv
    sys.argv = [str(path), *argv]
    try:
        runpy.run_path(str(path), run_name="__main__")
    except SystemExit as e:  # argparse --help, sys.exit("message"), …
        if e.code is None:
            return 0
        if isinstance(e.code, int):
            return e.code
        print(e.code, file=sys.stderr)
        return 1
    finally:
        sys.argv = old_argv
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="cude-tpu", description=__doc__.splitlines()[0])
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("info", help="backend / device / version report")
    sub.add_parser("list", help="enumerate experiment drivers")
    p_exp = sub.add_parser("exp", help="run an experiment driver")
    p_exp.add_argument("name", help="number ('02'), stem, or unique prefix")
    p_exp.add_argument("rest", nargs=argparse.REMAINDER,
                       help="arguments forwarded to the driver")
    sub.add_parser("bench", help="run the headline benchmark (bench.py)")

    args = parser.parse_args(argv)
    if args.cmd == "info":
        return _cmd_info()
    if args.cmd == "list":
        return _cmd_list()
    if args.cmd == "exp":
        exp_dir = _find_experiments_dir()
        if exp_dir is None:
            raise SystemExit("no experiments directory found")
        return _run_script(_resolve_experiment(exp_dir, args.name), args.rest)
    if args.cmd == "bench":
        exp_dir = _find_experiments_dir()
        bench = (exp_dir.parent / "bench.py") if exp_dir else None
        if bench is None or not bench.exists():
            raise SystemExit("bench.py not found next to the experiments dir")
        return _run_script(bench, [])
    raise SystemExit(f"unknown command {args.cmd!r}")


if __name__ == "__main__":
    raise SystemExit(main())
