"""Probe the fused QC kernel at N=102400 (Z=1024) on the real TPU.

The committed 100k QC codes (sparse_matrices/matrices_qc, Z=1024) currently
gate out of the fused kernel: feasible_batch_tile only tries tiles
(24, 16, 8) and the ~930 VMEM planes of the R=0.70 code need tile <= 4.
This probes (a) whether Mosaic compiles Z=1024 lane rolls at all (small
code first) and (b) mc-mode throughput at tile 2/4 on the full 100k code.

Usage: python scripts/probe_qc_100k.py [--stage small|full|both]
                                       [--tiles 4,2] [--batch 1024]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="both")
    p.add_argument("--tiles", default="4,2")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--alpha", type=float, default=0.8)
    p.add_argument("--qber", type=float, default=0.03)
    args = p.parse_args()

    import jax
    import numpy as np

    from qkd_ldpc_v_tpu.config import DecodingAlgorithm
    from qkd_ldpc_v_tpu.models.qc import generate_qc_peg, read_qc_matrix
    from qkd_ldpc_v_tpu.ops.pallas_qc import make_pallas_qc_montecarlo
    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    if args.stage in ("small", "both"):
        # Z=1024 lane-roll sanity on a small code: N=8192, 16 block edges.
        qc = generate_qc_peg(
            base_bits=8, base_checks=4, lifting=1024, column_weight=2, seed=3
        )
        t0 = time.perf_counter()
        mc = make_pallas_qc_montecarlo(
            qc, DecodingAlgorithm.NMSA, 50, False, batch=256, batch_tile=8,
        )
        conv, keys, iters = jax.block_until_ready(
            mc(7, int(qc.num_bit_nodes * 0.02), 0.02, 0.8, 1.0, 0.0)
        )
        print(
            f"small Z=1024: ok ({time.perf_counter()-t0:.1f}s) "
            f"conv={np.asarray(conv).mean():.2f}",
            flush=True,
        )

    if args.stage in ("full", "both"):
        path = (
            Path(__file__).resolve().parent.parent / "sparse_matrices"
            / "matrices_qc" / "(N=102400,M=30720,R=0.70,CW=4,Z=1024,SEED=53).mtrx"
        )
        qc = read_qc_matrix(path)
        ne = int(qc.num_bit_nodes * args.qber)
        for tile in (int(t) for t in args.tiles.split(",")):
            t0 = time.perf_counter()
            try:
                mc = make_pallas_qc_montecarlo(
                    qc, DecodingAlgorithm.NMSA, 100, False,
                    batch=args.batch, batch_tile=tile,
                )
                conv, keys, iters = jax.block_until_ready(
                    mc(11, ne, args.qber, args.alpha, 1.0, 0.0)
                )
            except Exception as e:
                print(
                    f"100k tile {tile}: FAILED {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:200]}",
                    flush=True,
                )
                continue
            compile_s = time.perf_counter() - t0
            times = []
            for rep in range(3):
                t0 = time.perf_counter()
                conv, keys, iters = jax.block_until_ready(
                    mc(11 + rep, ne, args.qber, args.alpha, 1.0, 0.0)
                )
                times.append(time.perf_counter() - t0)
            best = min(times)
            ok = np.asarray(conv) & np.asarray(keys)
            print(
                f"100k tile {tile}: {args.batch / best:.0f} frames/s "
                f"(best of 3; {best:.2f} s/batch, compile+first "
                f"{compile_s:.0f}s) FER={1 - ok.mean():.4f} "
                f"mean_iters={np.asarray(iters)[np.asarray(conv)].mean():.1f}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
