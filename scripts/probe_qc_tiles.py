"""Batch-tile sweep for the fused QC kernel on the headline code (real TPU).

Round-4 probed the v5e's real scoped-VMEM ceiling at ~120 MiB
(scripts/probe_vmem.py); feasible_batch_tile's search still tops out at
24. This sweep times the in-kernel Monte-Carlo path at tiles 8..192 on
the headline Z=512 code (bench.py's operating point) to decide whether a
larger tile (fewer grid steps, better VPU occupancy) moves the headline.

Usage: python scripts/probe_qc_tiles.py [--tiles 8,16,24,48,96]
         [--batch 196608] [--schedules layered,flooding] [--reps 3]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="8,16,24,32,48,64,96,192,384")
    ap.add_argument("--batch", type=int, default=196608)
    ap.add_argument("--schedules", default="layered,flooding")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--qber", type=float, default=0.03)
    ap.add_argument("--alpha", type=float, default=0.65)
    ap.add_argument("--matrix", default="",
                    help="QC .mtrx path (default: the headline Z=512 code)")
    ap.add_argument("--max-iterations", type=int, default=100)
    args = ap.parse_args()

    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from qkd_ldpc_v_tpu.config import DecodingAlgorithm
    from qkd_ldpc_v_tpu.models.qc import generate_qc_peg
    from qkd_ldpc_v_tpu.ops.pallas_qc import make_pallas_qc_montecarlo

    dev = jax.devices()[0]
    print(f"device={dev.platform}:{dev.device_kind}", flush=True)

    if args.matrix:
        from qkd_ldpc_v_tpu.models.qc import read_qc_matrix

        qc = read_qc_matrix(args.matrix)
    else:
        qc = generate_qc_peg(
            base_bits=20, base_checks=6, lifting=512, column_weight=4, seed=9
        )
    n = qc.base_bits * qc.lifting
    num_errors = int(n * args.qber)
    lines = []
    for schedule in args.schedules.split(","):
        for tile in (int(t) for t in args.tiles.split(",")):
            batch = args.batch - (args.batch % tile)
            try:
                mc = make_pallas_qc_montecarlo(
                    qc, DecodingAlgorithm.NMSA, args.max_iterations, False,
                    batch, batch_tile=tile, schedule=schedule,
                )
                t0 = time.perf_counter()
                out = mc(1, num_errors, args.qber, args.alpha, 1.0, 0.0)
                jax.block_until_ready(out)
                warm = time.perf_counter() - t0
                fer = 1.0 - float(jnp.mean(out[1]))
                samples = []
                for rep in range(args.reps):
                    t0 = time.perf_counter()
                    out = mc(2 + rep, num_errors, args.qber, args.alpha,
                             1.0, 0.0)
                    jax.block_until_ready(out)
                    samples.append(batch / (time.perf_counter() - t0))
                med = statistics.median(samples)
                line = (f"[{schedule} tile={tile:3d}] {med:9.0f} f/s "
                        f"[{min(samples):.0f}, {max(samples):.0f}] "
                        f"FER={fer:.4f} warmup={warm:.0f}s")
            except Exception as e:  # noqa: BLE001
                line = f"[{schedule} tile={tile:3d}] FAILED: {e!r:.200}"
            print(line, flush=True)
            lines.append(line)
    print("== summary ==")
    for line in lines:
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
