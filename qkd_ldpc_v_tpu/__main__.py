"""``python -m qkd_ldpc_v_tpu`` — the simulator CLI (see cli.py)."""

import sys

from qkd_ldpc_v_tpu.cli import main

sys.exit(main())
