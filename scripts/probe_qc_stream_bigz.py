"""Hardware validation of the streamed QC engine's round-4 capacity tier.

The fused QC kernel now serves every committed frame size (100 MiB VMEM
budget, scripts/probe_vmem.py); the streamed engine's reason to exist is
codes whose per-edge message planes overflow that budget. This probe
builds such a code — N=409600 (Z=4096, 100x30 base, CW=4), 4x the
reference's largest production frame — asserts the engine ladder routes
it to the streamed engine, and runs a real Monte-Carlo batch on the TPU
to prove the raised resident-plane budget (~46 MiB at TB=8) compiles and
executes.

Usage: python scripts/probe_qc_stream_bigz.py [--trials 64] [--qber 0.02]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--qber", type=float, default=0.02)
    ap.add_argument("--alpha", type=float, default=0.8)
    ap.add_argument("--schedules", default="layered,flooding")
    args = ap.parse_args()

    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from qkd_ldpc_v_tpu.config import Config, DecodingAlgorithm, RQBERRange
    from qkd_ldpc_v_tpu.models.qc import generate_qc_peg
    from qkd_ldpc_v_tpu.ops.pallas_qc import feasible_batch_tile
    from qkd_ldpc_v_tpu.ops.pallas_qc_stream import qc_stream_feasible
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams
    from qkd_ldpc_v_tpu.simulation import (
        ScalingFactors, SimCombination, pallas_engine, run_combination,
    )

    dev = jax.devices()[0]
    print(f"device={dev.platform}:{dev.device_kind}", flush=True)
    qc = generate_qc_peg(100, 30, 4096, 4, seed=44)
    matrix = qc.to_hmatrix()
    n = matrix.num_bit_nodes
    assert n == 409600, n
    assert feasible_batch_tile(qc) == 0
    assert qc_stream_feasible(qc)
    for schedule in args.schedules.split(","):
        cfg = Config(
            trials_number=args.trials,
            simulation_seed=77,
            decoding_algorithm=DecodingAlgorithm.NMSA,
            decoding_alg_max_iterations=100,
            r_qber_ranges=(RQBERRange(0.99, args.qber, args.qber, 0.01),),
            batch_size=args.batch,
            use_pallas=True,
            schedule=schedule,
        )
        assert pallas_engine(matrix, cfg) == "qc_stream"
        comb = SimCombination(
            args.qber, HMatrixParams(), ScalingFactors(primary=args.alpha)
        )
        t0 = time.perf_counter()
        res = run_combination(matrix, comb, cfg, sim_number=0)
        dt = time.perf_counter() - t0
        print(
            f"[{schedule}] N={n} qc_stream OK: {args.trials} trials in "
            f"{dt:.1f}s ({args.trials / dt:.1f} f/s incl. compile), "
            f"conv={res.ratio_trials_success_decoding:.3f} "
            f"mean_iters={res.iter_success_mean:.1f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
