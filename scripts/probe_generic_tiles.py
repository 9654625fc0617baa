"""Probe generic-kernel batch-tile sizes on the real TPU.

bf16x2 transport halves the edge-buffer VMEM per frame, so tiles beyond
the f32-era tb=8 limit may now fit — this measures raw mc-mode throughput
for a list of tile sizes on the reference's alist 10k matrix. Each tile
size is one fresh compile (expect minutes through the tunnel on the first
run; the persistent cache makes reruns fast).

Usage: python scripts/probe_generic_tiles.py [--tiles 8,16,24]
                                             [--batch 12288] [--alpha 0.7]
                                             [--reps 3] [--alg NMSA]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MATRIX = Path(
    "/root/reference/sparse_matrices/matrices_alist_10k_all/"
    "(N=10240,M=2841,R=0.72,CW=4,SEED=666).mtrx"
)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", default="8,16,24")
    p.add_argument("--batch", type=int, default=12288)
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--qber", type=float, default=0.03)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--alg", default="NMSA")
    p.add_argument("--transport", default="bf16x2")
    p.add_argument("--i8step", type=float, default=None)
    p.add_argument("--matrix", default=str(MATRIX))
    args = p.parse_args()

    import jax
    import numpy as np

    from qkd_ldpc_v_tpu.config import DecodingAlgorithm
    from qkd_ldpc_v_tpu.models.hmatrix import read_sparse_matrix_alist
    import qkd_ldpc_v_tpu.ops.pallas_generic as pg
    from qkd_ldpc_v_tpu.ops.pallas_generic import (
        make_pallas_generic_montecarlo,
    )

    if args.i8step is not None:
        pg._I8_STEP = args.i8step
    from qkd_ldpc_v_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    matrix = read_sparse_matrix_alist(args.matrix)
    alg = DecodingAlgorithm[args.alg if args.alg != "SPA-LIN" else "SPA_APPROX"]
    num_errors = int(matrix.num_bit_nodes * args.qber)
    print(f"device: {jax.devices()[0]} batch={args.batch}", file=sys.stderr)

    for tile in (int(t) for t in args.tiles.split(",")):
        if args.batch % tile:
            print(f"tile {tile}: skipped (batch not divisible)",
                  file=sys.stderr)
            continue
        try:
            mc = make_pallas_generic_montecarlo(
                matrix, alg, 100, False, batch=args.batch, batch_tile=tile,
                transport=args.transport,
            )
        except ValueError as e:
            print(f"tile {tile}: infeasible ({e})", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        try:
            conv, keys, iters = jax.block_until_ready(
                mc(1234, num_errors, args.qber, args.alpha, 1.0, 0.0)
            )
        except Exception as e:  # VMEM OOM surfaces at compile/run time
            print(f"tile {tile}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", file=sys.stderr)
            continue
        compile_s = time.perf_counter() - t0
        times = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            conv, keys, iters = jax.block_until_ready(
                mc(1234 + rep, num_errors, args.qber, args.alpha, 1.0, 0.0)
            )
            times.append(time.perf_counter() - t0)
        best = min(times)
        ok = np.asarray(conv) & np.asarray(keys)
        fer = 1 - ok.mean()
        print(
            f"tile {tile} {args.transport}: {args.batch / best:.0f} frames/s "
            f"(best of {args.reps}; {best * 1e3:.1f} ms/batch, "
            f"compile+first {compile_s:.1f}s) FER={fer:.4f} "
            f"mean_iters={np.asarray(iters)[np.asarray(conv)].mean():.1f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
