"""CLI: ``python -m vic_tpu -g <global parameter file>`` (cmd_proc.c analog)."""
import sys

from .driver import main

sys.exit(main())
