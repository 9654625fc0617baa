"""Headline benchmark: decoded 10k-bit frames per second at QBER 0.03.

Operating point (BASELINE.md north star): N=10240 alist code, NMSA decoder
(alpha = 0.8), iteration cap 100, QBER 0.03, batch decode on one chip.
Measures the real driver path (run_combination), including the exact
two-phase straggler re-decode. vs_baseline is measured against the
north-star target of 1e5 frames/s/chip (the reference publishes no numbers
of its own — see BASELINE.md).

Prints exactly one JSON line on stdout; diagnostics go to stderr.

Env knobs: BENCH_BATCH (default 2048), BENCH_STEPS (default 3),
BENCH_MATRIX (path to an alist matrix overriding the default asset),
BENCH_DTYPE (default float32).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REFERENCE_MATRIX = Path(
    "/root/reference/sparse_matrices/matrices_alist_10k_all/"
    "(N=10240,M=2841,R=0.72,CW=4,SEED=666).mtrx"
)
TARGET_FRAMES_PER_S = 1e5  # BASELINE.md north star, v5e chip
QBER = 0.03
ALPHA = 0.8
MAX_ITERATIONS = 100


def load_matrix():
    from qkd_ldpc_v_tpu.models.generator import generate_regular_ldpc
    from qkd_ldpc_v_tpu.models.hmatrix import read_sparse_matrix_alist

    override = os.environ.get("BENCH_MATRIX")
    path = Path(override) if override else REFERENCE_MATRIX
    if path.exists():
        return read_sparse_matrix_alist(path)
    print(f"bench: {path} missing; generating equivalent code", file=sys.stderr)
    return generate_regular_ldpc(
        num_bits=10240, num_checks=2841, column_weight=4, seed=666
    )


def main() -> int:
    import jax

    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from qkd_ldpc_v_tpu.config import Config, DecodingAlgorithm, RQBERRange
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams
    from qkd_ldpc_v_tpu.simulation import (
        ScalingFactors,
        SimCombination,
        run_combination,
    )

    batch = int(os.environ.get("BENCH_BATCH", "2048"))
    steps = int(os.environ.get("BENCH_STEPS", "3"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    matrix = load_matrix()
    n = matrix.num_bit_nodes

    def cfg_for(trials: int) -> Config:
        return Config(
            trials_number=trials,
            simulation_seed=123,
            decoding_algorithm=DecodingAlgorithm.NMSA,
            decoding_alg_max_iterations=MAX_ITERATIONS,
            r_qber_ranges=(RQBERRange(0.99, QBER, QBER, 0.01),),
            batch_size=batch,
            dtype=dtype,
        )

    comb = SimCombination(QBER, HMatrixParams(), ScalingFactors(primary=ALPHA))

    dev = jax.devices()[0]
    print(
        f"bench: device={dev.platform}:{dev.device_kind} N={n} "
        f"E={matrix.num_edges} batch={batch} dtype={dtype}",
        file=sys.stderr,
    )

    # Warmup: compiles phase-1, phase-2, and runs one full batch.
    t0 = time.perf_counter()
    warm = run_combination(matrix, comb, cfg_for(batch), sim_number=0)
    print(
        f"bench: warmup {time.perf_counter() - t0:.1f}s "
        f"FER={1 - warm.ratio_trials_success_ldpc:.4f} "
        f"mean_iters={warm.iter_success_mean:.1f}",
        file=sys.stderr,
    )
    if 1 - warm.ratio_trials_success_ldpc > 0.1:
        print("bench: WARNING high FER — operating point off", file=sys.stderr)

    t0 = time.perf_counter()
    res = run_combination(matrix, comb, cfg_for(steps * batch), sim_number=1)
    elapsed = time.perf_counter() - t0
    frames_per_s = steps * batch / elapsed
    print(
        f"bench: {steps * batch} trials in {elapsed:.2f}s "
        f"(FER={1 - res.ratio_trials_success_ldpc:.4f})",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "decoded_10k_frames_per_s_qber0.03",
        "value": round(frames_per_s, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / TARGET_FRAMES_PER_S, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
