"""`python -m conditional_ude_tpu` — forwards to the CLI (cli.py)."""

from conditional_ude_tpu.cli import main

raise SystemExit(main())
