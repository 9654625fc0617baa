"""Streamed-QC 100k operating-point probe (real TPU).

Measures the streamed QC engine (ops/pallas_qc_stream.py) on the
committed N=102400 flagship codes through the real driver
(run_combination), sweeping schedule and batch, and derives the achieved
extrinsic-stream bandwidth against the v5e HBM roof (the engine's
per-sweep HBM traffic is exactly 2 * 4 * cw * N bytes per frame — one
read + one write of the extrinsic state; the per-iteration convergence
check and totals work are VMEM/VPU-only).

Usage: python scripts/bench_qc100k.py [--schedules layered,flooding]
       [--batches 64,256] [--trials 2048] [--matrix PATH] [--alpha 0.8]
       [--qber 0.03]

Prints one human-readable line per point plus a final summary. Compile
through the tunnel is slow the first time (enable_compilation_cache is
on; expect a throwaway warmup).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HBM_ROOF_GBPS = 800  # v5e ~819 GB/s peak; 800 as the working roof


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", default=str(
        Path(__file__).resolve().parent.parent
        / "sparse_matrices/matrices_qc"
        / "(N=102400,M=30720,R=0.70,CW=3,Z=2048,SEED=56).mtrx"
    ))
    ap.add_argument("--schedules", default="layered,flooding")
    ap.add_argument("--batches", default="256")
    ap.add_argument("--trials", type=int, default=2048)
    ap.add_argument("--alpha", type=float, default=0.8)
    ap.add_argument("--qber", type=float, default=0.03)
    ap.add_argument("--max-iterations", type=int, default=100)
    ap.add_argument("--engine", default="any",
                    help="assert the driver picks this engine "
                         "(qc | qc_stream | any)")
    ap.add_argument("--force-engine", default="",
                    help="pin the engine via tpu.force_engine "
                         "(qc | qc_stream | generic | stream | xla)")
    args = ap.parse_args()

    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from qkd_ldpc_v_tpu.config import (
        Config, DecodingAlgorithm, MatrixFormat, RQBERRange,
    )
    from qkd_ldpc_v_tpu.models.hmatrix import read_matrix
    from qkd_ldpc_v_tpu.rate_adapt import HMatrixParams
    from qkd_ldpc_v_tpu.simulation import (
        ScalingFactors, SimCombination, pallas_engine, run_combination,
    )

    dev = jax.devices()[0]
    print(f"device={dev.platform}:{dev.device_kind}", flush=True)
    matrix = read_matrix(Path(args.matrix), MatrixFormat.QC)
    n = matrix.num_bit_nodes
    cw = int((matrix.qc.shifts >= 0).sum(axis=0).max())
    bytes_per_frame_sweep = 2 * 4 * cw * n

    results = []
    for schedule in args.schedules.split(","):
        for batch in (int(b) for b in args.batches.split(",")):
            cfg = Config(
                trials_number=args.trials,
                simulation_seed=123,
                decoding_algorithm=DecodingAlgorithm.NMSA,
                decoding_alg_max_iterations=args.max_iterations,
                r_qber_ranges=(RQBERRange(0.99, args.qber, args.qber, 0.01),),
                batch_size=batch,
                use_pallas=True,
                schedule=schedule,
                force_engine=args.force_engine,
            )
            engine = pallas_engine(matrix, cfg)
            if args.engine != "any":
                assert engine == args.engine, engine
            print(f"[{schedule} b={batch}] engine={engine}", flush=True)
            comb = SimCombination(
                args.qber, HMatrixParams(),
                ScalingFactors(primary=args.alpha),
            )
            import dataclasses

            cfg_w = dataclasses.replace(cfg, trials_number=batch)
            t0 = time.perf_counter()
            warm = run_combination(matrix, comb, cfg_w, sim_number=0)
            print(f"[{schedule} b={batch}] warmup "
                  f"{time.perf_counter() - t0:.0f}s "
                  f"FER={1 - warm.ratio_trials_success_ldpc:.4f}",
                  flush=True)
            t0 = time.perf_counter()
            res = run_combination(matrix, comb, cfg, sim_number=1)
            dt = time.perf_counter() - t0
            fps = args.trials / dt
            fer = 1 - res.ratio_trials_success_ldpc
            sweeps = res.iter_success_mean
            gbps = fps * sweeps * bytes_per_frame_sweep / 1e9
            line = (f"[{schedule} b={batch}] {fps:8.1f} frames/s  "
                    f"FER={fer:.4f}  mean_sweeps={sweeps:.1f}  "
                    f"ext-stream ~{gbps:.0f} GB/s "
                    f"({100 * gbps / HBM_ROOF_GBPS:.0f}% of roof)")
            print(line, flush=True)
            results.append(line)
    print("== summary ==")
    for line in results:
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
