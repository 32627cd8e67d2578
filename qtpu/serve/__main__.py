"""``python -m qtpu.serve`` — launch the sharded serving stack (see cli.py)."""
from qtpu.serve.cli import main

raise SystemExit(main())
