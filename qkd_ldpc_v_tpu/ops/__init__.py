"""Device compute ops: channel model, syndrome, batched decoders."""

from qkd_ldpc_v_tpu.ops.channel import (  # noqa: F401
    calculate_syndrome,
    exact_error_count,
    generate_keys,
    inject_errors,
    llr_from_bits,
)
from qkd_ldpc_v_tpu.ops.decoders import DecodeResult, make_decoder  # noqa: F401
