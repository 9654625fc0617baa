"""Test-side alias of the packaged reference oracle (moved to
qkd_ldpc_v_tpu.oracle so the tracing subsystem and users' verification mode
can share it)."""

from qkd_ldpc_v_tpu.oracle import (  # noqa: F401
    DBL_MAX,
    calculate_syndrome,
    decode_oracle,
)
